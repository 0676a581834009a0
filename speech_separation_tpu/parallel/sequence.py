"""Sequence (time) parallelism: shard long waveforms across the mesh.

The reference handles long utterances by padding everything to the split
maximum on one device (SURVEY §5 "long-context"). For utterances beyond one
chip's HBM, this module shards the *time axis* of STFT analysis/synthesis
across mesh devices with halo exchange over ICI:

- analysis: each device owns ``S / n`` samples and emits ``S / (n·shift)``
  frames. A frame reaches ``size − shift`` samples past the chunk end, so
  each device receives that halo from its right neighbour via ``ppermute``
  (the last device uses zeros — trailing pad), then everything is one local
  MXU matmul;
- synthesis: each device overlap-adds its local frames; the ``size − shift``
  spill past its chunk shifts right one device and is added there — OLA is
  linear, so the seam is exact.

Frame correspondence with the single-device op is exact:
``sharded_stft(x)[j] == stft(x, fading=True)[j + k − 1]`` where
``k = size // shift`` — i.e. everything except the ``k − 1`` leading fade
frames (whose content is pure fade-in). Round-tripping
``sharded_istft(sharded_stft(x))`` reconstructs ``x`` exactly except the
first ``size − shift`` samples (the classic no-lead-fade edge).

Built on ``shard_map`` over any mesh axis, composing with ``(data, model)``
batch/tensor sharding. Correctness is pinned against the unsharded ops on
the CPU test mesh (`tests/test_sequence_parallel.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.framing import overlap_add
from ..ops.stft import analysis_basis, synthesis_basis

__all__ = ["sharded_stft", "sharded_istft"]


def _right_halo(chunk: jnp.ndarray, halo: int, axis: str, n_dev: int) -> jnp.ndarray:
    """First ``halo`` samples of the right neighbour (zeros for the last device)."""
    received = jax.lax.ppermute(
        chunk[:, :halo], axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    is_last = jax.lax.axis_index(axis) == n_dev - 1
    return jnp.where(is_last, jnp.zeros_like(received), received)


def sharded_stft(
    mesh: Mesh,
    signal: jnp.ndarray,
    size: int = 256,
    shift: int = 128,
    *,
    axis: str = "model",
) -> jnp.ndarray:
    """Time-sharded STFT: ``[B, S]`` → ``[B, S // shift, 2 * bins]``.

    ``S`` must divide by ``n_dev · shift``. Output frames are the real‖imag
    layout of :func:`ops.stft.analysis_basis`, sharded over ``axis``.
    """
    n_dev = mesh.shape[axis]
    b, samples = signal.shape
    if samples % (n_dev * shift):
        raise ValueError(f"samples {samples} must divide by n_dev*shift {n_dev * shift}")
    k = size // shift
    halo = size - shift
    basis = analysis_basis(size)

    def local(chunk):  # [B, S/n]
        ext = jnp.concatenate([chunk, _right_halo(chunk, halo, axis, n_dev)], axis=1)
        local_samples = chunk.shape[1]
        frames = local_samples // shift
        rows = ext.reshape(b, frames + k - 1, shift)
        stacked = jnp.stack([rows[:, c : c + frames, :] for c in range(k)], axis=2)
        return jnp.matmul(
            stacked.reshape(b, frames, size), basis, precision=jax.lax.Precision.HIGHEST
        )

    return jax.shard_map(
        local, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, axis), check_vma=False
    )(signal)


def sharded_istft(
    mesh: Mesh,
    flat_spec: jnp.ndarray,
    size: int = 256,
    shift: int = 128,
    *,
    axis: str = "model",
) -> jnp.ndarray:
    """Inverse of :func:`sharded_stft`: ``[B, F, 2*bins]`` → ``[B, F*shift]``."""
    n_dev = mesh.shape[axis]
    halo = size - shift
    basis = synthesis_basis(size, shift)

    def local(spec_chunk):  # [B, F/n, 2*bins]
        b = spec_chunk.shape[0]
        frames_td = jnp.matmul(spec_chunk, basis, precision=jax.lax.Precision.HIGHEST)
        sig = overlap_add(frames_td, shift)  # [B, F_local*shift + halo]
        body, spill = sig[:, :-halo], sig[:, -halo:]
        from_left = jax.lax.ppermute(
            spill, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        is_first = jax.lax.axis_index(axis) == 0
        add = jnp.where(is_first, jnp.zeros_like(from_left), from_left)
        return body.at[:, :halo].add(add)

    return jax.shard_map(
        local, mesh=mesh, in_specs=P(None, axis), out_specs=P(None, axis), check_vma=False
    )(flat_spec)
