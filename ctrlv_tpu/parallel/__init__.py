from .mesh import make_mesh, make_train_mesh, MeshAxes
from .sharding import (
    shard_batch_frames,
    replicate,
    shard_params,
    shard_train_state,
    data_parallel_sharding,
    zero1_sharding_tree,
)

__all__ = [
    "make_mesh",
    "make_train_mesh",
    "MeshAxes",
    "shard_batch_frames",
    "replicate",
    "shard_params",
    "shard_train_state",
    "data_parallel_sharding",
    "zero1_sharding_tree",
]
