"""Epoch driver: validation-monitored training with early stopping.

Functional superset of the reference's ``model.fit(..., callbacks=[
ModelCheckpoint(save_best_only), EarlyStopping(patience, restore_best_weights
)])`` path (`uPIT_baseline.ipynb cells 27, 31`) and its manual GradientTape
loop (`vq-vae_for_1d_data.ipynb cell 19`):

- per-epoch train pass → validation pass → checkpoint-if-best;
- early stop after ``patience`` epochs without val improvement, restoring the
  best snapshot (full train state, not just weights);
- loss history collected for curve dumps;
- batches are device-prefetched (double buffer) so host prep overlaps compute;
- failure detection the reference lacks: a non-finite train loss aborts the
  epoch loop and restores the best finite state (``FitResult.diverged``),
  and ``resume=True`` restarts from the newest checkpoint snapshot.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable

import jax
import numpy as np

from ..data.datasets import prefetch_to_device
from .checkpoint import CheckpointManager

__all__ = ["FitResult", "fit"]


@dataclass
class FitResult:
    state: Any
    history: dict[str, list[float]] = field(default_factory=dict)
    best_val_loss: float = float("inf")
    best_epoch: int = -1
    stopped_early: bool = False
    diverged: bool = False


def fit(
    state: Any,
    train_step: Callable,
    eval_step: Callable,
    train_loader: Iterable,
    val_loader: Iterable,
    batch_arrays: Callable,
    epochs: int = 5,
    patience: int = 50,
    checkpoints: CheckpointManager | None = None,
    restore_best: bool = True,
    log_fn: Callable[[str], None] = print,
    prefetch: int = 2,
    resume: bool = False,
) -> FitResult:
    """Train with per-epoch validation.

    ``batch_arrays(batch)`` extracts the positional arrays a step consumes
    from a loader batch (loaders carry host-only fields like names).
    ``train_step(state, *arrays) -> (state, loss)``;
    ``eval_step(state, *arrays) -> loss`` (extra outputs are ignored).
    """
    if resume and checkpoints is not None:
        try:
            state = checkpoints.restore(state, step=checkpoints.latest_step)
            log_fn(f"resumed from checkpoint step {checkpoints.latest_step}")
        except FileNotFoundError:
            pass

    result = FitResult(state=state, history={"loss": [], "val_loss": []})
    best_state = state
    since_best = 0

    for epoch in range(1, epochs + 1):
        t0 = time.time()
        train_losses = []
        for batch in prefetch_to_device(iter(train_loader), prefetch):
            state, loss, *_ = _as_tuple(train_step(state, *batch_arrays(batch)))
            train_losses.append(loss)
        if train_losses and not np.isfinite(float(train_losses[-1])):
            result.diverged = True
            log_fn(
                f"non-finite train loss at epoch {epoch}; stopping and restoring "
                f"best state (epoch {result.best_epoch})"
            )
            break
        val_losses = []
        for batch in prefetch_to_device(iter(val_loader), prefetch):
            out = eval_step(state, *batch_arrays(batch))
            val_losses.append(out[0] if isinstance(out, tuple) else out)

        train_loss = float(np.mean([float(x) for x in train_losses])) if train_losses else float("nan")
        val_loss = float(np.mean([float(x) for x in val_losses])) if val_losses else float("nan")
        result.history["loss"].append(train_loss)
        result.history["val_loss"].append(val_loss)
        log_fn(
            f"epoch {epoch}/{epochs}  loss={train_loss:.5f}  val_loss={val_loss:.5f}"
            f"  ({time.time() - t0:.2f}s)"
        )

        if val_loss < result.best_val_loss:
            result.best_val_loss = val_loss
            result.best_epoch = epoch
            # device_get: later train steps donate `state`'s buffers, so an
            # alias would dangle — snapshot the best state to host memory
            best_state = jax.device_get(state)
            since_best = 0
            if checkpoints is not None:
                checkpoints.save_if_best(epoch, state, val_loss)
        else:
            since_best += 1
            if since_best > patience:
                result.stopped_early = True
                log_fn(f"early stopping at epoch {epoch} (best epoch {result.best_epoch})")
                break

    result.state = best_state if restore_best else state
    return result


def _as_tuple(x):
    return x if isinstance(x, tuple) else (x,)
