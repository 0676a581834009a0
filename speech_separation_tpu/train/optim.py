"""Optimisers and schedules (optax), mirroring the reference's settings.

- uPIT models: Adam on an exponential-decay schedule — initial 1e-3, decay
  rate 0.96 every 20 steps, staircase (`uPIT_baseline.ipynb cell 27`).
- VQ-VAE v1 custom loop: Adam(1e-4) (`vq-vae_for_1d_data.ipynb cell 17`).
- VQ-VAE t2/t3: Nadam(1e-3) (`_t2 cell 22`, `_t3 cell 25`).
"""

from __future__ import annotations

import optax

__all__ = ["exponential_decay_adam", "adam", "nadam"]


def exponential_decay_adam(
    initial_learning_rate: float = 1e-3,
    decay_steps: int = 20,
    decay_rate: float = 0.96,
    staircase: bool = True,
) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=initial_learning_rate,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=staircase,
    )
    return optax.adam(schedule)


def adam(learning_rate: float = 1e-4) -> optax.GradientTransformation:
    return optax.adam(learning_rate)


def nadam(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    return optax.nadam(learning_rate)
