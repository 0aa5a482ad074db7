"""NamedSharding helpers for latents, params, and batches.

Replaces the reference's Accelerate/NCCL layer (SURVEY.md §2.9): gradient
allreduce becomes an XLA-inserted psum from sharded-batch + replicated-param
annotations; `accelerator.gather` becomes jax.lax.all_gather or simply an
unsharded output.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXES


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_frames(mesh: Mesh, ndim: int, batch_axis: int = 0, frame_axis: int = 1):
    """Sharding for (B, F, ...) video tensors: B over data, F over frame."""
    spec = [None] * ndim
    spec[batch_axis] = AXES.data
    if mesh.shape[AXES.frame] > 1:
        spec[frame_axis] = AXES.frame
    return NamedSharding(mesh, P(*spec))


def data_parallel_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0):
    """Shard only the batch axis over the data axis."""
    spec = [None] * ndim
    spec[batch_axis] = AXES.data
    return NamedSharding(mesh, P(*spec))


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate a param pytree across the mesh (DP training layout).

    The SVD UNet (1.5B params <= 3GB bf16) fits per-chip, so replication +
    batch sharding is the right layout; FSDP-style param sharding is a
    later optimization for larger variants.
    """
    sharding = replicate(mesh)
    return jax.device_put(params, sharding)
