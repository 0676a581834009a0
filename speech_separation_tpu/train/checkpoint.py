"""Orbax checkpointing: best-val snapshots with full-state resume.

Capability superset of the reference's Keras ``ModelCheckpoint``
(``save_best_only`` on ``val_loss``, `uPIT_baseline.ipynb cells 26-27`): the
whole :class:`~..train.state.TrainState` pytree (params + optimizer moments +
step + PRNG) round-trips, so a resumed run continues the optimizer schedule
exactly where it stopped instead of restarting from weights alone.
"""

from __future__ import annotations

import pathlib
from typing import Any

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 3):
        self._dir = pathlib.Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda metrics: metrics["val_loss"],
                best_mode="min",
            ),
        )

    def save_if_best(self, step: int, state: Any, val_loss: float) -> bool:
        """Save a snapshot; the manager keeps the best ``max_to_keep`` by val_loss."""
        saved = self._manager.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={"val_loss": float(val_loss)},
        )
        self._manager.wait_until_finished()
        return bool(saved)

    @property
    def best_step(self) -> int | None:
        return self._manager.best_step()

    @property
    def latest_step(self) -> int | None:
        return self._manager.latest_step()

    def restore(self, state: Any, step: int | None = None) -> Any:
        """Restore array leaves into ``state`` (a template with matching tree)."""
        if step is None:
            step = self._manager.best_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        restored = self._manager.restore(step, args=ocp.args.StandardRestore(state))
        # rebuild on the template's treedef so static fields (tx, apply_fn —
        # non-pytree nodes) come from the template, arrays from the snapshot
        leaves, treedef = jax.tree.flatten(state)
        new_leaves = jax.tree.leaves(restored)
        assert len(leaves) == len(new_leaves)
        return jax.tree.unflatten(treedef, new_leaves)

    def restore_params(self, state: Any, step: int | None = None) -> Any:
        """Restore only the model parameters into ``state`` (serving paths).

        Template-free for everything but ``params``, so optimizer-state
        structure drift across versions (e.g. round 3 made the clip wrapper
        an unconditional ``optax.chain``, changing the ``opt_state`` pytree)
        can never break inference on a checkpoint written before the change.
        ``step`` stays at the template's value — serving never reads it."""
        if step is None:
            step = self._manager.best_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        # a scoped reader: orbax binds one handler type per manager+item, and
        # self._manager may already be bound to StandardRestore
        with ocp.CheckpointManager(self._dir) as reader:
            restored = reader.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    item={"params": state.params}, partial_restore=True
                ),
            )
        return state.replace(params=restored["params"])

    def close(self) -> None:
        self._manager.close()
