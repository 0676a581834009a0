"""SI-SDR and summed-square reconstruction losses (VQ-VAE family).

Matches the reference's ``custom_mse`` / ``custom_sisdr_loss``
(`vq-vae_for_1d_data.ipynb cell 14`, `vq-vae_for_1d_data_2.ipynb cell 16`):
``custom_mse`` is the batch mean of per-utterance *summed* squared error, and
the SI-SDR loss is the negative batch-mean SI-SDR using the projection
formula ``target = (ŷᵀy) · y / ‖y‖²``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["summed_squared_error", "si_sdr", "si_sdr_loss"]


def summed_squared_error(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Batch mean of per-utterance summed squared error. ``[B, T, F]`` inputs."""
    return jnp.mean(jnp.sum(jnp.square(preds - targets), axis=tuple(range(1, preds.ndim))))


def si_sdr(
    preds: jnp.ndarray, targets: jnp.ndarray, eps: float = 0.0
) -> jnp.ndarray:
    """Scale-invariant SDR in dB per batch element.

    ``preds`` / ``targets``: ``[B, T]`` or ``[B, T, 1]`` waveforms. Uses the
    projection ``target = <ŷ, y> y / ‖y‖²`` over the time axis, as in the
    reference SiSdr metric (`vq-vae_for_1d_data.ipynb cell 13`) and
    ``metrics/evaluate_metrics.py:22-26``.
    """
    if preds.ndim == 3:
        preds = preds[..., 0]
    if targets.ndim == 3:
        targets = targets[..., 0]
    dot = jnp.sum(preds * targets, axis=-1, keepdims=True)
    energy = jnp.sum(jnp.square(targets), axis=-1, keepdims=True)
    target = dot * targets / (energy + eps)
    noise = preds - target
    ratio = jnp.sum(jnp.square(target), axis=-1) / (jnp.sum(jnp.square(noise), axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def si_sdr_loss(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Negative batch-mean SI-SDR."""
    return -jnp.mean(si_sdr(preds, targets))
