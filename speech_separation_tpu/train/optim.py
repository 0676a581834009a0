"""Optimisers and schedules (optax), mirroring the reference's settings.

- uPIT models: Adam on an exponential-decay schedule — initial 1e-3, decay
  rate 0.96 every 20 steps, staircase (`uPIT_baseline.ipynb cell 27`).
- VQ-VAE v1 custom loop: Adam(1e-4) (`vq-vae_for_1d_data.ipynb cell 17`).
- VQ-VAE t2/t3: Nadam(1e-3) (`_t2 cell 22`, `_t3 cell 25`).
"""

from __future__ import annotations

import optax

__all__ = ["exponential_decay_adam", "adam", "nadam", "cosine_adam"]


def _maybe_clip(
    tx: optax.GradientTransformation, grad_clip_norm: float
) -> optax.GradientTransformation:
    """Optional global-norm gradient clipping ahead of the optimiser.

    The reference trains unclipped (and so do our defaults); long
    corpus-scale runs showed transient loss spikes (RESULTS.md — epochs
    56–60 of the 100-epoch hard run jumped 1,445→2,173 before recovering),
    which clipping bounds without changing steady-state behaviour.

    Always wraps in ``optax.chain`` (identity when clip<=0) so the
    ``opt_state`` pytree STRUCTURE is independent of the clip setting —
    resuming a checkpointed run with a different CLIP value must restore
    cleanly (advisor round 3)."""
    head = (
        optax.clip_by_global_norm(grad_clip_norm)
        if grad_clip_norm > 0
        else optax.identity()
    )
    return optax.chain(head, tx)


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


def cosine_adam(
    peak_learning_rate: float = 1e-3,
    total_steps: int = 10_000,
    warmup_steps: int = 0,
    end_scale: float = 0.05,
    grad_clip_norm: float = 0.0,
) -> optax.GradientTransformation:
    """Adam on a warmup+cosine-decay schedule for corpus-scale convergence.

    The reference's exp-decay staircase (`uPIT_baseline.ipynb cell 27`) was
    tuned for its 2-step toy epochs; at corpus scale a horizon-aware cosine
    to ``end_scale × peak`` is what lets long runs keep improving instead of
    plateauing at a too-high constant LR (VERDICT round 3, item 2)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps else peak_learning_rate,
        peak_value=peak_learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=end_scale * peak_learning_rate,
    )
    return _maybe_clip(optax.adam(schedule), grad_clip_norm)
