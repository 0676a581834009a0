from .mesh import initialize_distributed, make_mesh
from .sequence import sharded_istft, sharded_stft
from .sharding import (
    batch_sharding,
    pad_batch_for_mesh,
    param_pspec,
    replicated,
    shard_batch,
    shard_params,
    shard_state,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "sharded_stft",
    "sharded_istft",
    "batch_sharding",
    "pad_batch_for_mesh",
    "param_pspec",
    "replicated",
    "shard_batch",
    "shard_params",
    "shard_state",
]
