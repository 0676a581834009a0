"""Optimisers and schedules (optax), mirroring the reference's settings.

- uPIT models: Adam on an exponential-decay schedule — initial 1e-3, decay
  rate 0.96 every 20 steps, staircase (`uPIT_baseline.ipynb cell 27`).
- VQ-VAE v1 custom loop: Adam(1e-4) (`vq-vae_for_1d_data.ipynb cell 17`).
- VQ-VAE t2/t3: Nadam(1e-3) (`_t2 cell 22`, `_t3 cell 25`).
"""

from __future__ import annotations

import optax

__all__ = ["exponential_decay_adam", "adam", "nadam"]


def _maybe_clip(
    tx: optax.GradientTransformation, grad_clip_norm: float
) -> optax.GradientTransformation:
    """Optional global-norm gradient clipping ahead of the optimiser.

    The reference trains unclipped (and so do our defaults); long
    corpus-scale runs showed transient loss spikes (RESULTS.md — epochs
    56–60 of the 100-epoch hard run jumped 1,445→2,173 before recovering),
    which clipping bounds without changing steady-state behaviour."""
    if grad_clip_norm <= 0:
        return tx
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)


def exponential_decay_adam(
    initial_learning_rate: float = 1e-3,
    decay_steps: int = 20,
    decay_rate: float = 0.96,
    staircase: bool = True,
    grad_clip_norm: float = 0.0,
) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=initial_learning_rate,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=staircase,
    )
    return _maybe_clip(optax.adam(schedule), grad_clip_norm)


def adam(
    learning_rate: float = 1e-4, grad_clip_norm: float = 0.0
) -> optax.GradientTransformation:
    return _maybe_clip(optax.adam(learning_rate), grad_clip_norm)


def nadam(
    learning_rate: float = 1e-3, grad_clip_norm: float = 0.0
) -> optax.GradientTransformation:
    return _maybe_clip(optax.nadam(learning_rate), grad_clip_norm)
