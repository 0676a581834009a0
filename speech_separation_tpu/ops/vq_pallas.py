"""Fused nearest-codebook search as a Pallas TPU kernel.

The XLA path for VQ materialises the full ``[N, K]`` distance matrix in HBM
before the argmin. This kernel tiles over N, computes the distance block
``‖x‖² − 2·x·E`` on the MXU directly in VMEM, and reduces to the argmin
without ever writing distances back — turning an HBM-bandwidth-bound op into
an MXU-bound one for large codebooks.

(The ``‖e_k‖²`` term is folded in; the ``‖x_n‖²`` term is constant per row
and dropped from the argmin.)

Falls back to interpreter mode automatically off-TPU so the same code path is
unit-testable on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nearest_code_pallas"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nearest_kernel(x_ref, cb_ref, cb_sq_ref, out_ref):
    """One N-tile: distances = −2·x@E + ‖e‖², argmin over K."""
    x = x_ref[:]  # [TILE_N, D]
    scores = -2.0 * jnp.dot(
        x,
        cb_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    scores = scores + cb_sq_ref[:]  # [TILE_N, K]
    out_ref[:, 0] = jnp.argmin(scores, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _nearest_code_impl(flat: jnp.ndarray, codebook: jnp.ndarray, interpret: bool):
    n, d = flat.shape
    _, k = codebook.shape
    tile_n = 256
    n_pad = _round_up(max(n, 8), tile_n)
    d_pad = _round_up(d, 128)
    k_pad = _round_up(k, 128)

    x = jnp.zeros((n_pad, d_pad), flat.dtype).at[:n, :d].set(flat)
    cb = jnp.zeros((d_pad, k_pad), codebook.dtype).at[:d, :k].set(codebook)
    cb_sq = jnp.sum(jnp.square(cb), axis=0, keepdims=True)  # [1, K]
    # exclude padded codes from the argmin
    cb_sq = cb_sq.at[0, k:].set(jnp.finfo(jnp.float32).max)

    grid = (n_pad // tile_n,)
    out = pl.pallas_call(
        _nearest_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_n, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, cb, cb_sq)
    return out[:n, 0]


def nearest_code_pallas(flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """``argmin_k ‖flat_n − codebook[:, k]‖²`` — fused Pallas implementation.

    ``flat``: [N, D]; ``codebook``: [D, K] → int32 ``[N]``.
    """
    interpret = jax.default_backend() != "tpu"
    return _nearest_code_impl(flat, codebook, interpret)
