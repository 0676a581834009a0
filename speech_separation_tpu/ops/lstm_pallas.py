"""Fused LSTM recurrence as a Pallas TPU kernel (serving path).

The flagship separator is scan-bound: at batch 128 the XLA ``lax.scan``
spends ~26 µs per timestep of which only ~9 µs is the recurrent matmul —
the rest is per-step loop overhead (dynamic-slice bookkeeping, gate
slicing, carry shuffling). This kernel runs the whole recurrence inside one
Pallas program:

- the recurrent weights sit in VMEM for the entire sequence;
- the carry (h, c) lives in VMEM scratch and **persists across grid steps**
  (TPU grids execute sequentially on a core), so the grid tiles time without
  round-tripping the carry through HBM;
- each grid step processes ``tile_t`` unrolled timesteps: one MXU matmul
  ``[tile_b, H] @ [H, 4·GP]`` plus VPU gate math per step, with Mosaic
  auto-pipelining the xw-tile DMAs;
- gate blocks are padded to ``GP = round_up(H, 128)`` lanes *outside* the
  kernel so every gate slice starts on a lane-tile boundary (H = 496 would
  otherwise force lane rotations at offsets 496/992/1488).

Semantics match ``models/blstm.LSTM`` (Keras gate order i, f, g, o; the
input projection ``x @ W + b`` is computed outside by one big XLA matmul,
exactly like the scan path). Compute dtype is configurable; the carry is
kept in fp32 regardless. Forward-only — training keeps the differentiable
``lax.scan`` path.

Status / measured result (TPU v5e, full separation pipeline, batch 128 ×
8 s): **the XLA scan wins** — 26,257× real time vs this kernel's 16,093×
at its best compiling config (``tile_b=32, tile_t=32``; numerically correct,
0.4% bf16 relative error). The batch must be tiled to fit xw blocks in
VMEM, which serialises 4× more (4× smaller) recurrent matmuls than the
scan's single full-batch step; configs with ``tile_b ≥ 64`` fail Mosaic
compilation on this runtime. Like the double-buffered Pallas STFT
(``stft_pallas.py``), this is kept as validated groundwork with an honest
negative result — large-batch serving stays on ``lax.scan``, whose
"overhead" turns out to be smaller than the MXU-utilisation cost of batch
tiling.

Round-3 epilogue: the diagnosis above (scan overhead is real, batch tiling
is the killer) led to ``ops/lstm_train_pallas.py`` — at training batches
(≤64 utterances) the whole doubled-direction row block fits ONE matmul per
step, no tiling needed, and the fused fwd+bwd recurrences win +84% on the
train step (and +21% serving latency at batch 1). This module remains the
record of why the serving-throughput regime is different.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_pallas"]


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _make_kernel(tile_t: int, h_dim: int, gp: int):
    def kernel(xw_ref, u_ref, out_ref, h_scr, c_scr):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        h = h_scr[:]
        c = c_scr[:]
        for tt in range(tile_t):
            z = xw_ref[:, tt, :].astype(jnp.float32) + jnp.dot(
                h.astype(u_ref.dtype), u_ref[:], preferred_element_type=jnp.float32
            )
            i = jax.nn.sigmoid(z[:, 0 * gp : 0 * gp + h_dim])
            f = jax.nn.sigmoid(z[:, 1 * gp : 1 * gp + h_dim])
            g = jnp.tanh(z[:, 2 * gp : 2 * gp + h_dim])
            o = jax.nn.sigmoid(z[:, 3 * gp : 3 * gp + h_dim])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            out_ref[:, tt, :] = h.astype(out_ref.dtype)
        h_scr[:] = h
        c_scr[:] = c

    return kernel


@functools.partial(
    jax.jit, static_argnames=("tile_t", "tile_b", "interpret", "compute_dtype")
)
def lstm_pallas(
    xw: jnp.ndarray,
    recurrent: jnp.ndarray,
    *,
    tile_t: int = 16,
    tile_b: int | None = None,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """LSTM over precomputed input projections.

    ``xw``: ``[B, T, 4H]`` (``x @ W + bias``), ``recurrent``: ``[H, 4H]``.
    Returns every hidden state ``[B, T, H]`` in ``compute_dtype`` (the
    carry stays fp32 inside). Tile defaults fit the ~16 MB VMEM budget:
    xw block + out block (double-buffered by Mosaic) + weights + carries.
    """
    b, t, four_h = xw.shape
    h_dim = four_h // 4
    gp = _round_up(h_dim, 128)

    # gate-padded layouts: [.., 4H] → [.., 4·GP] with each gate lane-aligned
    xw_p = jnp.pad(
        xw.reshape(b, t, 4, h_dim), ((0, 0), (0, 0), (0, 0), (0, gp - h_dim))
    ).reshape(b, t, 4 * gp)
    u_p = jnp.pad(
        recurrent.reshape(h_dim, 4, h_dim), ((0, 0), (0, 0), (0, gp - h_dim))
    ).reshape(h_dim, 4 * gp)
    xw_p = xw_p.astype(compute_dtype)
    u_p = u_p.astype(compute_dtype)

    if tile_b is None:
        tile_b = min(b, 32)
    b_pad = _round_up(b, tile_b)
    t_pad = _round_up(t, tile_t)
    if b_pad != b or t_pad != t:
        xw_p = jnp.pad(xw_p, ((0, b_pad - b), (0, t_pad - t), (0, 0)))

    kernel = _make_kernel(tile_t, h_dim, gp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad, h_dim), compute_dtype),
        grid=(b_pad // tile_b, t_pad // tile_t),
        in_specs=[
            pl.BlockSpec((tile_b, tile_t, 4 * gp), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((h_dim, 4 * gp), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, tile_t, h_dim), lambda bi, ti: (bi, ti, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
            pltpu.VMEM((tile_b, h_dim), jnp.float32),
        ],
        interpret=interpret,
    )(xw_p, u_p)
    return out[:b, :t]
