"""Framing and overlap-add as pure, batched, statically-shaped JAX ops.

The reference frames signals with a numpy stride trick (`segment_axis`,
reference `parallel_stft.py:37-123`) and reconstructs with a per-frame Python
overlap-add loop (`uPIT_baseline.ipynb cell 39`). On TPU both become
reshape/stack manipulations that XLA turns into cheap copies:

- when ``size == k * hop`` a signal padded to ``(frames + k - 1) * hop`` is
  reshaped to ``hop``-chunks, and frame ``j`` is the concatenation of chunks
  ``j .. j+k-1`` — a stack of ``k`` shifted views, no gather needed;
- overlap-add is the exact adjoint: split each frame into ``k`` chunks and sum
  the ``k`` shifted copies.

Both ops are batched over a leading batch axis and fully static in shape.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["num_frames", "num_samples", "frame_signal", "overlap_add"]


def num_frames(samples: int, size: int, shift: int) -> int:
    """Frame count for `samples` time steps: ceil((samples - size + shift)/shift).

    Matches reference `_samples_to_stft_frames` (`parallel_stft.py:125-134`).
    """
    return -(-(samples - size + shift) // shift)


def num_samples(frames: int, size: int, shift: int) -> int:
    """Inverse of :func:`num_frames` (`parallel_stft.py:136-144`)."""
    return frames * shift + size - shift


def frame_signal(signal: jnp.ndarray, size: int, shift: int) -> jnp.ndarray:
    """Chop ``signal[..., t]`` into overlapping frames ``[..., frames, size]``.

    The signal must already be padded to a whole number of frames
    (``num_samples(frames, size, shift)`` samples). ``size`` must be a
    multiple of ``shift``.
    """
    if size % shift != 0:
        raise ValueError(f"size {size} must be a multiple of shift {shift}")
    k = size // shift
    total = signal.shape[-1]
    frames = (total - size + shift) // shift
    if num_samples(frames, size, shift) != total:
        raise ValueError(
            f"signal length {total} is not a whole number of frames for "
            f"size={size}, shift={shift}"
        )
    chunks = signal.reshape(*signal.shape[:-1], frames + k - 1, shift)
    stacked = jnp.stack(
        [chunks[..., c : c + frames, :] for c in range(k)], axis=-2
    )  # [..., frames, k, shift]
    return stacked.reshape(*signal.shape[:-1], frames, size)


def overlap_add(frames: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Adjoint of :func:`frame_signal`: sum overlapping frames into a signal.

    ``frames`` has shape ``[..., n_frames, size]`` with ``size`` a multiple of
    ``shift``; the result has ``num_samples(n_frames, size, shift)`` samples.
    """
    *lead, n_frames, size = frames.shape
    if size % shift != 0:
        raise ValueError(f"size {size} must be a multiple of shift {shift}")
    k = size // shift
    chunks = frames.reshape(*lead, n_frames, k, shift)
    out_chunks = n_frames + k - 1
    total = jnp.zeros((*lead, out_chunks, shift), dtype=frames.dtype)
    for c in range(k):
        pad = [(0, 0)] * len(lead) + [(c, out_chunks - n_frames - c), (0, 0)]
        total = total + jnp.pad(chunks[..., c, :], pad)
    return total.reshape(*lead, out_chunks * shift)
