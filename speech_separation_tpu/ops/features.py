"""On-device feature extraction for separator training.

The reference precomputes spectrogram features offline into TFRecords
(`uPIT_baseline.ipynb cell 10`): inputs ``concat(|mix|, ∠mix)`` and
phase-sensitive-mask labels ``|s_i| · cos(∠mix − ∠s_i)``. On TPU the STFT is
a single MXU matmul, so this framework computes the same features *inside the
jitted train step* from raw waveforms — no offline pass, no host transfer of
258-dim frames, and the phase trig reduces to real arithmetic:

    cos(∠mix − ∠s) = (Re_mix·Re_s + Im_mix·Im_s) / (|mix| · |s|)
    ⇒ psm_label      = (Re_mix·Re_s + Im_mix·Im_s) / |mix|

All functions are batched, jit/grad/shard-safe, statically shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .stft import stft

__all__ = ["SpectralFeatures", "psm_features", "magnitude_angle"]

_EPS = 1e-12


class SpectralFeatures(NamedTuple):
    magnitude: jnp.ndarray  # [..., T, F] mixture magnitude (model input)
    cos_angle: jnp.ndarray  # [..., T, F] cos of mixture phase
    sin_angle: jnp.ndarray  # [..., T, F] sin of mixture phase
    labels: jnp.ndarray  # [..., T, num_speakers * F] PSM targets


def magnitude_angle(spec: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(|X|, cos ∠X, sin ∠X) from a complex spectrum, avoiding atan2."""
    re, im = jnp.real(spec), jnp.imag(spec)
    mag = jnp.sqrt(re * re + im * im)
    inv = 1.0 / jnp.maximum(mag, _EPS)
    return mag, re * inv, im * inv


def psm_features(
    mix: jnp.ndarray,
    sources: jnp.ndarray,
    size: int = 256,
    shift: int = 128,
    **stft_kwargs,
) -> SpectralFeatures:
    """Mixture magnitude/phase and PSM labels from raw waveforms.

    ``mix``: ``[B, samples]``; ``sources``: ``[B, num_speakers, samples]``.
    """
    mix_spec = stft(mix, size, shift, **stft_kwargs)  # [B, T, F] complex
    src_spec = stft(sources, size, shift, **stft_kwargs)  # [B, S, T, F]
    mix_re, mix_im = jnp.real(mix_spec), jnp.imag(mix_spec)
    mag = jnp.sqrt(mix_re * mix_re + mix_im * mix_im)
    inv_mag = 1.0 / jnp.maximum(mag, _EPS)

    src_re, src_im = jnp.real(src_spec), jnp.imag(src_spec)
    # |s| cos(∠mix − ∠s) = (Re_mix Re_s + Im_mix Im_s) / |mix|
    psm = (mix_re[:, None] * src_re + mix_im[:, None] * src_im) * inv_mag[:, None]
    b, s, t, f = psm.shape
    labels = jnp.moveaxis(psm, 1, 2).reshape(b, t, s * f)
    return SpectralFeatures(
        magnitude=mag,
        cos_angle=mix_re * inv_mag,
        sin_angle=mix_im * inv_mag,
        labels=labels,
    )
