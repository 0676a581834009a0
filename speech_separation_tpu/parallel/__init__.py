from .mesh import initialize_distributed, make_mesh
from .sharding import (
    batch_sharding,
    param_pspec,
    replicated,
    shard_batch,
    shard_params,
    shard_state,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "batch_sharding",
    "param_pspec",
    "replicated",
    "shard_batch",
    "shard_params",
    "shard_state",
]
