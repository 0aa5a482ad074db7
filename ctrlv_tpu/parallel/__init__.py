from .mesh import make_mesh, MeshAxes
from .sharding import (
    shard_batch_frames,
    replicate,
    shard_params,
    data_parallel_sharding,
)

__all__ = [
    "make_mesh",
    "MeshAxes",
    "shard_batch_frames",
    "replicate",
    "shard_params",
    "data_parallel_sharding",
]
