"""int16 wire quantization — the single home for the link-transfer math.

Upload direction (host→device): 16-bit PCM decodes to ``i / 32768``
exactly, so int16 counts + :func:`dequant_i16` on device reproduce the
float decoder bit-for-bit at half the bytes (loaders' ``transfer_int16``).

Download direction (device→host): model estimates are *not* bounded by
±1.0 (e.g. TasNet's linear decoder), so a plain round-and-clip would
flat-top loud estimates before the host's peak-normalized write.
:func:`quantize_estimates_i16` instead scales each signal by
``m = max(peak, 1)`` — never clipping — and ships the tiny per-signal
``m`` alongside; :func:`dequantize_estimates_i16` undoes it on the host.
Error is ≤ ``m / 65534`` per sample (≈0.5 LSB of the int16 wav the caller
writes for in-range signals, 15-bit relative precision above full scale).

Used by ``train/steps.py``, ``separate/pipeline.py`` and the CLI serving
paths; consolidating here keeps the convention from silently diverging.

No reference counterpart (beyond parity): the reference feeds float32
host↔device throughout; this module exists because TPU-pod-style
deployments are frequently interconnect-bound on the data path (measured
1.74× end-to-end corpus epochs on this relay-attached chip — RESULTS.md).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["dequant_i16", "quantize_estimates_i16", "dequantize_estimates_i16"]


def dequant_i16(wave):
    """On-device inverse of the loaders' int16 transfer (trace-time dtype
    branch: float inputs pass through untouched, so every step/serve
    function accepts either transfer mode with one implementation).

    int32 is the dynamic-mixing mix lane: the host ships the UNCLIPPED
    int32 sum of the quantized sources (two loud gained sources can exceed
    ±32767), same 1/32768 scale — so the dequantized mix still equals the
    dequantized sources' sum exactly."""
    if wave.dtype in (jnp.int16, jnp.int32):
        return wave.astype(jnp.float32) * (1.0 / 32768.0)
    return wave


def quantize_estimates_i16(wave):
    """Device-side estimate quantization for the fetch: returns
    ``(codes int16 [..., samples], scale float32 [...])`` with
    ``wave ≈ codes * scale / 32767`` and no clipping at any amplitude."""
    peak = jnp.max(jnp.abs(wave), axis=-1, keepdims=True)
    scale = jnp.maximum(peak, 1.0)
    codes = jnp.round(wave / scale * 32767.0).astype(jnp.int16)
    return codes, scale[..., 0].astype(jnp.float32)


def dequantize_estimates_i16(codes: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Host-side inverse of :func:`quantize_estimates_i16` (numpy)."""
    return codes.astype(np.float32) * (
        np.asarray(scale, dtype=np.float32)[..., None] / 32767.0
    )
