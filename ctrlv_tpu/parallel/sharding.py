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


def zero1_sharding_tree(tree: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    """Per-leaf NamedShardings that shard the largest data-axis-divisible
    dimension over the "data" axis (ZeRO-1 optimizer-state partitioning).

    Leaves smaller than min_size elements, or with no divisible axis,
    replicate. Under jit, XLA's SPMD partitioner turns the layout into the
    reduce-scatter(moment update) + all-gather(param update) pattern —
    there is no hand-written collective (the reference has no equivalent;
    its DDP replicates optimizer state per GPU).
    """
    n = mesh.shape[AXES.data]

    def leaf(x):
        shape = getattr(x, "shape", ())
        size = int(getattr(x, "size", 0) or 0)
        if n <= 1 or size < min_size:
            return replicate(mesh)
        divisible = [(d, i) for i, d in enumerate(shape) if d % n == 0 and d >= n]
        if not divisible:
            return replicate(mesh)
        _, axis = max(divisible)
        spec = [None] * len(shape)
        spec[axis] = AXES.data
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, tree)


def shard_train_state(state: Any, mesh: Mesh, zero1: bool = False) -> Any:
    """Place a TrainState on the mesh: params/step replicated, optimizer
    moments ZeRO-1 sharded over the data axis when zero1=True."""
    if not zero1:
        return jax.device_put(state, replicate(mesh))
    import dataclasses

    shardings = dataclasses.replace(
        jax.tree.map(lambda _: replicate(mesh), state),
        opt_state=zero1_sharding_tree(state.opt_state, mesh),
    )
    return jax.device_put(state, shardings)
