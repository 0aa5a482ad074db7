"""Packed parameter trees: few flat buffers instead of ~2800 arrays.

Why this exists (PERF.md round-4/5): under the axon tunnel, a cached
(deserialized) executable pays a one-time remote instantiation cost that
scales with its OUTPUT COUNT — the four-model bench init returns ~2800
param tensors and pays ~120-150 s on a cache HIT, while the 432 MB
sampler with a handful of outputs pays ~8 s. Controlled probe (round 5,
equal bytes): a 2800-output program costs 20.8 s to obtain vs 3.0 s for
the same data fused into one output.

The fix: the init program returns ONE flat buffer per dtype per model
(`pack_tree` appended to the init function), and consumers unpack
INSIDE their own traced program (`unpack_tree` at the top of the sampler
fn) — slicing a contiguous fp buffer into static views is free-ish for
XLA (bitcast/slice folding), and the 2800-leaf tree never has to be
materialized as separate device arrays at all.

The reference has no analog: torch keeps params as module attributes and
pays none of this (no remote executable instantiation in its runtime).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PackSpec:
    """Static recipe mapping a param pytree <-> per-dtype flat buffers.

    Leaves are laid out in `jax.tree.flatten` order within their dtype
    group; `entries` holds (dtype_name, offset, size, shape) per leaf in
    flatten order, `totals` the flat length per dtype group.
    """

    treedef: Any
    entries: Tuple[Tuple[str, int, int, Tuple[int, ...]], ...]
    totals: Tuple[Tuple[str, int], ...]

    def digest(self) -> str:
        """Stable hash for exec-cache keys (spec changes retrace).

        Memoized on the instance: the pipelines recompute the jit-table
        key (and hence this digest) on EVERY sampler call, and hashing
        str(treedef) + repr of ~2800 entries is hundreds of KB of work.
        The spec is immutable after construction, so cache via
        object.__setattr__ (frozen dataclass; writes bypass __setattr__)."""
        cached = self.__dict__.get("_digest")
        if cached is None:
            h = hashlib.sha256()
            h.update(str(self.treedef).encode())
            h.update(repr(self.entries).encode())
            cached = h.hexdigest()[:16]
            object.__setattr__(self, "_digest", cached)
        return cached


def make_pack_spec(tree) -> PackSpec:
    """Build a PackSpec from a concrete or abstract (eval_shape) pytree."""
    leaves, treedef = jax.tree.flatten(tree)
    offsets: Dict[str, int] = {}
    entries = []
    for leaf in leaves:
        dt = jnp.dtype(leaf.dtype).name
        size = 1
        for d in leaf.shape:
            size *= int(d)
        off = offsets.get(dt, 0)
        entries.append((dt, off, size, tuple(int(d) for d in leaf.shape)))
        offsets[dt] = off + size
    return PackSpec(
        treedef=treedef,
        entries=tuple(entries),
        totals=tuple(sorted(offsets.items())),
    )


def pack_tree(tree, spec: PackSpec | None = None) -> Dict[str, jax.Array]:
    """{dtype_name: flat buffer} holding every leaf, raveled and
    concatenated in flatten order. Traceable (used inside the init jit)."""
    spec = spec or make_pack_spec(tree)
    leaves = jax.tree.leaves(tree)
    groups: Dict[str, list] = {}
    for leaf, (dt, _off, _size, _shape) in zip(leaves, spec.entries):
        groups.setdefault(dt, []).append(jnp.ravel(leaf))
    return {dt: jnp.concatenate(parts) for dt, parts in groups.items()}


def unpack_tree(buffers: Dict[str, jax.Array], spec: PackSpec):
    """Rebuild the pytree from flat buffers via static slices + reshapes.

    Traceable; meant to run INSIDE the consumer's jitted program so the
    leaves stay XLA values (slice/bitcast), not separate device arrays."""
    leaves = [
        jax.lax.slice(buffers[dt], (off,), (off + size,)).reshape(shape)
        for dt, off, size, shape in spec.entries
    ]
    return jax.tree.unflatten(spec.treedef, leaves)


@dataclasses.dataclass
class PackedParams:
    """A param tree stored as flat per-dtype buffers + the static spec.

    Pipelines accept this anywhere they accept a param tree; the unpack
    happens inside their jitted program (pipelines/common.py
    `resolve_params`). `.tree()` materializes the leaves eagerly (slow
    under the tunnel — one dispatch per leaf; for tests/tools only)."""

    buffers: Dict[str, jax.Array]
    spec: PackSpec

    @classmethod
    def pack(cls, tree) -> "PackedParams":
        spec = make_pack_spec(tree)
        return cls(buffers=pack_tree(tree, spec), spec=spec)

    def tree(self):
        return unpack_tree(self.buffers, self.spec)


def tuple_specs(init_fn, args) -> Tuple[PackSpec, ...]:
    """PackSpecs for each element of an init fn returning a tuple of
    param trees, computed abstractly (no device work)."""
    out = jax.eval_shape(init_fn, *args)
    return tuple(make_pack_spec(t) for t in out)


def packed_init(init_fn, args, *, tag: str) -> Tuple[PackedParams, ...]:
    """Run `init_fn(*args) -> tuple of param trees` through the exec
    cache with its outputs packed into flat per-dtype buffers, returning
    one PackedParams per tree.

    This is THE entry-point wiring for cheap cached-executable
    instantiation (bench.py, __graft_entry__.entry): the init program's
    output count drops from ~2800 tensors to one buffer per dtype per
    model, and the packing layout contract lives here instead of being
    hand-rolled per entry script. The exec-cache closure scan seeds from
    `init_fn` (closure_seed), NOT the internal wrapper — edits to the
    models the init builds must keep invalidating the entry.
    """
    from .exec_cache import compile_cached

    specs = tuple_specs(init_fn, args)

    def _init_packed(*a):
        return tuple(pack_tree(t, s) for t, s in zip(init_fn(*a), specs))

    bufs = compile_cached(_init_packed, args, tag=tag, closure_seed=init_fn)(*args)
    return tuple(PackedParams(b, s) for b, s in zip(bufs, specs))
