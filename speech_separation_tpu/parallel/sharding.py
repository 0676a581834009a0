"""Sharding rules: map parameters and batches onto the ``(data, model)`` mesh.

Strategy (GSPMD-style): annotate the *placement* of parameters and inputs
with ``NamedSharding`` and let XLA SPMD derive activation shardings and
insert the collectives (all-gather / reduce-scatter / all-reduce over ICI).

Default parameter rules for the separator models:

- matmul-heavy kernels — LSTM input/recurrent kernels ``[in, 4H]`` and dense
  kernels ``[in, out]`` — shard their output dimension over ``model``
  (tensor parallelism: each model shard computes a slice of the gates/units);
- biases and small params follow their kernel's output sharding;
- everything else is replicated.

Batches shard their leading (batch) dimension over ``data``. Gradients of
replicated params are all-reduced by XLA because their sharding is declared
replicated — exactly the MirroredStrategy semantic, derived not hand-written.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "batch_sharding",
    "replicated",
    "param_pspec",
    "shard_params",
    "shard_state",
    "shard_batch",
]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_pspec(path: tuple[str, ...], value: Any, model_axis: str = "model") -> P:
    """Partition spec for one parameter, by name/shape convention."""
    name = path[-1] if path else ""
    if name in ("kernel", "recurrent_kernel") and value.ndim >= 2:
        # shard the output/gate dimension (last axis)
        return P(*([None] * (value.ndim - 1) + [model_axis]))
    if name == "bias" and value.ndim == 1:
        return P(model_axis)
    return P()


def shard_params(params: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    """Place a parameter pytree on the mesh according to the rules."""

    def _place(path, value):
        if tensor_parallel:
            names = tuple(getattr(k, "key", str(k)) for k in path)
            spec = param_pspec(names, value)
            # only shard dims divisible by the mesh axis size
            axis_size = mesh.shape["model"]
            for dim, axis in enumerate(spec):
                if axis is not None and value.shape[dim] % axis_size:
                    spec = P()
                    break
        else:
            spec = P()
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(_place, params)


def shard_state(state: Any, mesh: Mesh, tensor_parallel: bool = True) -> Any:
    """Shard a TrainState: params + optimizer moments alike, scalars replicated."""
    params = shard_params(state.params, mesh, tensor_parallel)
    opt_state = _mirror_param_sharding(state.opt_state, params, mesh)
    return state.replace(
        params=params,
        opt_state=opt_state,
        step=jax.device_put(state.step, replicated(mesh)),
        rng=jax.device_put(state.rng, replicated(mesh)),
    )


def _key_name(entry: Any) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _mirror_param_sharding(opt_state: Any, params: Any, mesh: Mesh) -> Any:
    """Give optimizer moment tensors the same sharding as their parameter.

    Moment trees (e.g. optax ``ScaleByAdamState.mu``/``nu``) embed the
    parameter tree, so an opt-state leaf's path *ends with* its parameter's
    path — match by the longest such suffix, never by shape: two same-shaped
    params can carry different shardings (exactly what the divisibility
    fallback in :func:`shard_params` produces). Scalars and unmatched leaves
    are replicated.
    """
    param_by_path = {
        tuple(_key_name(k) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }

    def _place(path, value):
        if getattr(value, "ndim", 0) == 0:
            return jax.device_put(value, replicated(mesh))
        keys = tuple(_key_name(k) for k in path)
        for start in range(len(keys)):  # first hit = longest suffix
            param = param_by_path.get(keys[start:])
            if param is not None and tuple(param.shape) == tuple(value.shape):
                return jax.device_put(value, param.sharding)
        return jax.device_put(value, replicated(mesh))

    return jax.tree_util.tree_map_with_path(_place, opt_state)


def shard_batch(arrays: tuple, mesh: Mesh) -> tuple:
    """Shard each array's leading (batch) axis over the ``data`` mesh axis.

    The leading dimension must divide by the ``data`` axis size — use
    :func:`pad_batch_for_mesh` first for ragged final batches.
    """
    n = mesh.shape["data"]
    for a in arrays:
        if a.shape[0] % n:
            raise ValueError(
                f"batch dim {a.shape[0]} not divisible by data axis size {n}; "
                f"pad with pad_batch_for_mesh first"
            )
    sharding = batch_sharding(mesh)
    return tuple(jax.device_put(a, sharding) for a in arrays)


def pad_batch_for_mesh(arrays: tuple, mesh: Mesh) -> tuple[tuple, int]:
    """Zero-pad leading dims up to a multiple of the ``data`` axis size.

    Returns ``(padded_arrays, original_batch)``; padded rows are zeros, which
    the masked losses score as zero-length contributions the caller can
    correct for (or simply slice outputs back to ``original_batch``).
    """
    import numpy as np

    n = mesh.shape["data"]
    b = arrays[0].shape[0]
    target = -(-b // n) * n
    if target == b:
        return arrays, b
    padded = tuple(
        np.concatenate([np.asarray(a), np.zeros((target - b, *a.shape[1:]), a.dtype)])
        for a in arrays
    )
    return padded, b
