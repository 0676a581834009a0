"""Train state: one pytree carrying everything a resumable run needs.

Unlike the reference (weights-only ``.h5`` checkpoints, no optimizer or step
state — `uPIT_baseline.ipynb cells 26-27`), the full state — parameters,
optimizer moments, step counter and PRNG key — is a single pytree that orbax
snapshots and restores losslessly.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import optax

__all__ = ["TrainState"]


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, tx, rng) -> "TrainState":
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )
