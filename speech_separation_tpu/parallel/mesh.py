"""Device mesh construction for SPMD training.

The reference's only distribution mechanism is single-host
``tf.distribute.MirroredStrategy`` with one replica (`uPIT_baseline.ipynb
cell 31`). The TPU-native replacement is a named ``jax.sharding.Mesh`` over
ICI with two logical axes:

- ``data``  — batch (data parallelism; gradient all-reduce comes from XLA
  SPMD automatically);
- ``model`` — tensor parallelism for the wide BLSTM / dense kernels.

Multi-host (DCN) initialisation is a thin wrapper over
``jax.distributed.initialize``; every reference workload fits on one chip, so
multi-host is scale-out headroom rather than parity.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "initialize_distributed"]


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``data=None`` → all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host bring-up (DCN). No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
