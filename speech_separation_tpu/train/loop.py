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
  run *mid-epoch* (checked every ``nan_check_every`` steps so a step-1 NaN
  doesn't burn the whole epoch) and restores the best finite state
  (``FitResult.diverged``), and ``resume=True`` restarts from the newest
  checkpoint snapshot;
- observability: pass a :class:`~speech_separation_tpu.utils.MetricsLogger`
  as ``metrics`` and every train step's loss plus per-epoch summaries stream
  to its JSONL file (step losses are fetched at epoch end so logging adds no
  per-step host sync).
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
    metrics: Any = None,
    nan_check_every: int = 25,
) -> FitResult:
    """Train with per-epoch validation.

    ``batch_arrays(batch)`` extracts the positional arrays a step consumes
    from a loader batch (loaders carry host-only fields like names).
    ``train_step(state, *arrays) -> (state, loss)``;
    ``eval_step(state, *arrays) -> loss`` (extra outputs are ignored).
    ``metrics`` is an optional ``MetricsLogger``; ``nan_check_every`` bounds
    how many steps a divergent run can waste before it is aborted (0 → only
    check at epoch end).
    """
    epoch_offset = 0
    if resume and checkpoints is not None:
        try:
            state = checkpoints.restore(state, step=checkpoints.latest_step)
            # continue the shuffle stream: a resumed run must not replay the
            # original run's epoch-0 batch order (checkpoint steps = epochs)
            epoch_offset = int(checkpoints.latest_step or 0)
            log_fn(f"resumed from checkpoint step {checkpoints.latest_step}")
        except FileNotFoundError:
            pass
        except ValueError:
            # optimizer-state structure drift (e.g. the checkpoint predates
            # the unconditional optax.chain wrapper, or clip/schedule config
            # changed across chunks): fall back to params-only restore —
            # optimizer moments restart, which beats dying at startup
            state = checkpoints.restore_params(state, step=checkpoints.latest_step)
            epoch_offset = int(checkpoints.latest_step or 0)
            # fast-forward the step counter AND optax's schedule count so a
            # warmup+cosine LR does not replay warmup / retrace the early
            # high-LR region for the resumed chunk (only the moments restart)
            est_steps = (
                epoch_offset * len(train_loader)
                if hasattr(train_loader, "__len__")
                else 0
            )
            if est_steps and hasattr(state, "step"):
                import optax.tree_utils as _otu

                count = jax.numpy.asarray(est_steps, jax.numpy.int32)
                state = state.replace(
                    step=count,
                    opt_state=_otu.tree_set(state.opt_state, count=count),
                )
            log_fn(
                f"resumed PARAMS ONLY from checkpoint step {checkpoints.latest_step} "
                "(optimizer-state structure drift; moments restart, "
                f"LR schedule fast-forwarded to step {est_steps})"
            )

    result = FitResult(state=state, history={"loss": [], "val_loss": []})
    best_state = state
    since_best = 0
    global_step = int(np.asarray(state.step)) if hasattr(state, "step") else 0

    for epoch in range(1, epochs + 1):
        if epoch_offset and hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch_offset + epoch - 1)
        t0 = time.time()
        train_losses = []
        diverged_at = None
        for batch in prefetch_to_device(iter(train_loader), prefetch):
            state, loss, *_ = _as_tuple(train_step(state, *batch_arrays(batch)))
            train_losses.append(loss)
            global_step += 1
            # periodic mid-epoch guard: fetching the newest loss syncs on an
            # already-dispatched step, so the pipeline bubble is ~1/N steps
            if nan_check_every and len(train_losses) % nan_check_every == 0:
                if not np.isfinite(float(train_losses[-1])):
                    diverged_at = global_step
                    break
        if diverged_at is None and train_losses and not np.isfinite(float(train_losses[-1])):
            diverged_at = global_step
        if diverged_at is not None:
            result.diverged = True
            log_fn(
                f"non-finite train loss at step {diverged_at} (epoch {epoch}); "
                f"stopping and restoring best state (epoch {result.best_epoch})"
            )
            break
        if not train_losses:
            # a silent no-op "epoch" (misconfigured split dir, empty list
            # file) would otherwise log loss=nan and checkpoint an untrained
            # model as "best" — fail loudly instead (failure-detection, §5)
            raise ValueError(
                f"train loader yielded no batches in epoch {epoch}; "
                f"check the split directory / utterance lists"
            )
        val_losses = []
        for batch in prefetch_to_device(iter(val_loader), prefetch):
            out = eval_step(state, *batch_arrays(batch))
            val_losses.append(out[0] if isinstance(out, tuple) else out)

        step_losses = _fetch_scalars(train_losses)
        train_loss = float(np.mean(step_losses)) if step_losses else float("nan")
        vals = _fetch_scalars(val_losses)
        val_loss = float(np.mean(vals)) if vals else float("nan")
        result.history["loss"].append(train_loss)
        result.history["val_loss"].append(val_loss)
        epoch_time = time.time() - t0
        if metrics is not None:
            first_step = global_step - len(step_losses) + 1
            for i, step_loss in enumerate(step_losses):
                metrics.log(first_step + i, loss=step_loss)
            metrics.log(
                global_step,
                epoch=epoch,
                train_loss=train_loss,
                val_loss=val_loss,
                epoch_time_s=round(epoch_time, 3),
            )
        log_fn(
            f"epoch {epoch}/{epochs}  loss={train_loss:.5f}  val_loss={val_loss:.5f}"
            f"  ({epoch_time:.2f}s)"
        )

        if val_loss < result.best_val_loss:
            result.best_val_loss = val_loss
            result.best_epoch = epoch
            # device_get: later train steps donate `state`'s buffers, so an
            # alias would dangle — snapshot the best state to host memory
            best_state = jax.device_get(state)
            since_best = 0
            if checkpoints is not None:
                # cumulative step: a resumed chunk must NOT reuse a previous
                # chunk's step numbers — orbax silently skips saves at an
                # existing step, which would drop the improved model and make
                # `latest_step` non-chronological across chunks
                checkpoints.save_if_best(epoch_offset + epoch, state, val_loss)
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


def _fetch_scalars(xs) -> list[float]:
    """Fetch a list of device scalars in ONE host transfer.

    Fetching each loss individually costs one host round trip per step —
    on a high-latency device link (e.g. a TPU relay) that turns epoch-end
    logging into seconds of dead time. Stacking on device first makes it a
    single [N]-array fetch regardless of step count."""
    if not xs:
        return []
    import jax.numpy as jnp

    return [float(v) for v in np.asarray(jnp.stack([jnp.asarray(x) for x in xs]))]
