"""Batched STFT / iSTFT on device, with rFFT and MXU matmul-DFT paths.

Semantics match the reference analysis/synthesis pair exactly at fp32:

- analysis (`parallel_stft.py:146-196`): optional fade-in/out zero padding of
  ``size - shift`` on both sides, trailing zero padding to a whole number of
  frames, Blackman windowing, rFFT → ``[..., frames, size // 2 + 1]``;
- synthesis (`uPIT_baseline.ipynb cells 38-39`): per-frame irFFT, multiply by
  the net biorthogonal synthesis window (see ``windows.py`` for the two
  reference quirks folded into it), overlap-add, fade compensation crop.

Two compute paths:

``method="matmul"``  (default) DFT-by-matmul: the window is folded into a
                     precomputed ``[size, 2 * bins]`` basis so each frame
                     block becomes a single MXU matmul. For ``size = 256``
                     this is the fast path on TPU — the systolic array beats
                     the FFT butterfly at these sizes, the windowing fuses for
                     free, and it does not depend on an XLA FFT lowering
                     (absent on some TPU runtimes).
``method="fft"``     jnp.fft.rfft / irfft (XLA FFT) — bit-exact oracle path.

Both paths are pure functions of statically-shaped arrays, safe under ``jit``,
``vmap``, ``grad`` and sharding.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame_signal, num_frames, num_samples, overlap_add
from .windows import analysis_window, biorthogonal_synthesis_window

__all__ = [
    "stft",
    "istft",
    "stft_frame_count",
    "analysis_basis",
    "synthesis_basis",
]

Method = Literal["fft", "matmul"]


def stft_frame_count(samples: int, size: int, shift: int, fading: bool = True) -> int:
    """Number of STFT frames produced for a ``samples``-long signal."""
    if fading:
        samples = samples + 2 * (size - shift)
    return num_frames(samples, size, shift)


@functools.lru_cache(maxsize=16)
def _analysis_basis_np(size: int, window_length: int | None) -> np.ndarray:
    """Windowed forward-DFT basis ``[size, 2 * bins]`` (cos block, -sin block)."""
    bins = size // 2 + 1
    win = analysis_window(size, window_length)
    n = np.arange(size, dtype=np.float64)[:, None]
    f = np.arange(bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * f / size
    return np.concatenate([win[:, None] * np.cos(ang), win[:, None] * -np.sin(ang)], axis=1)


@functools.lru_cache(maxsize=16)
def _synthesis_basis_np(size: int, shift: int, window_length: int | None) -> np.ndarray:
    """Inverse-DFT basis ``[2 * bins, size]`` with the synthesis window folded in.

    Row layout mirrors :func:`_analysis_basis_np`: real parts then imaginary
    parts. DC and Nyquist imaginary rows are zero, matching real-output irFFT.
    """
    bins = size // 2 + 1
    ws = biorthogonal_synthesis_window(size, shift, window_length)
    n = np.arange(size, dtype=np.float64)[None, :]
    f = np.arange(bins, dtype=np.float64)[:, None]
    ang = 2.0 * np.pi * n * f / size
    scale = np.full((bins, 1), 2.0 / size)
    scale[0] = scale[-1] = 1.0 / size  # DC and Nyquist appear once in the full spectrum
    re_rows = scale * np.cos(ang) * ws[None, :]
    im_rows = -scale * np.sin(ang) * ws[None, :]
    im_rows[0] = 0.0
    im_rows[-1] = 0.0
    return np.concatenate([re_rows, im_rows], axis=0)


def analysis_basis(size: int, window_length: int | None = None, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_analysis_basis_np(size, window_length), dtype=dtype)


def synthesis_basis(
    size: int, shift: int, window_length: int | None = None, dtype=jnp.float32
) -> jnp.ndarray:
    return jnp.asarray(_synthesis_basis_np(size, shift, window_length), dtype=dtype)


def _pad_for_stft(signal: jnp.ndarray, size: int, shift: int, fading: bool) -> jnp.ndarray:
    lead = signal.ndim - 1
    if fading:
        pad = [(0, 0)] * lead + [(size - shift, size - shift)]
        signal = jnp.pad(signal, pad)
    samples = signal.shape[-1]
    frames = num_frames(samples, size, shift)
    total = num_samples(frames, size, shift)
    if total != samples:
        pad = [(0, 0)] * lead + [(0, total - samples)]
        signal = jnp.pad(signal, pad)
    return signal


def stft(
    signal: jnp.ndarray,
    size: int = 256,
    shift: int = 128,
    *,
    window_length: int | None = None,
    fading: bool = True,
    method: Method = "matmul",
    precision: jax.lax.Precision | None = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Batched STFT of ``signal[..., t]`` → complex ``[..., frames, size//2+1]``."""
    signal = _pad_for_stft(signal.astype(jnp.float32), size, shift, fading)
    frames = frame_signal(signal, size, shift)
    if method == "fft":
        win = jnp.asarray(analysis_window(size, window_length), dtype=jnp.float32)
        return jnp.fft.rfft(frames * win, axis=-1)
    basis = analysis_basis(size, window_length)
    flat = jnp.matmul(frames, basis, precision=precision)
    bins = size // 2 + 1
    return jax.lax.complex(flat[..., :bins], flat[..., bins:])


def istft(
    spectrum: jnp.ndarray,
    size: int = 256,
    shift: int = 128,
    *,
    window_length: int | None = None,
    fading: bool = True,
    method: Method = "matmul",
    precision: jax.lax.Precision | None = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Inverse STFT of ``[..., frames, size//2+1]`` → ``[..., samples]``.

    With ``fading=True`` the fade pads added by :func:`stft` are cropped, so
    ``istft(stft(x))`` reconstructs ``x`` (up to the trailing frame padding).
    """
    bins = size // 2 + 1
    if spectrum.shape[-1] != bins:
        raise ValueError(f"expected {bins} bins, got {spectrum.shape[-1]}")
    if method == "fft":
        ws = jnp.asarray(
            biorthogonal_synthesis_window(size, shift, window_length), dtype=jnp.float32
        )
        frames_td = jnp.fft.irfft(spectrum, n=size, axis=-1) * ws
    else:
        flat = jnp.concatenate([jnp.real(spectrum), jnp.imag(spectrum)], axis=-1)
        basis = synthesis_basis(size, shift, window_length)
        frames_td = jnp.matmul(flat.astype(jnp.float32), basis, precision=precision)
    signal = overlap_add(frames_td, shift)
    if fading:
        edge = size - shift
        signal = signal[..., edge : signal.shape[-1] - edge]
    return signal
