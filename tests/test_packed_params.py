"""utils/packed_params: flat-buffer pack/unpack of param trees.

Exists for the cached-init instantiation cost (PERF.md round-5): the
bench init returns a handful of flat buffers instead of ~2800 tensors,
and samplers unpack inside their traced program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.utils.packed_params import (
    PackedParams,
    make_pack_spec,
    pack_tree,
    tuple_specs,
    unpack_tree,
)


def _tree(key):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "a": {"w": jax.random.normal(k1, (3, 5), jnp.float32),
              "b": jax.random.normal(k2, (5,), jnp.bfloat16)},
        "c": [jax.random.normal(k3, (2, 2, 2), jnp.bfloat16),
              jnp.arange(4, dtype=jnp.int32)],
    }


def test_pack_unpack_roundtrip_mixed_dtypes():
    tree = _tree(jax.random.PRNGKey(0))
    spec = make_pack_spec(tree)
    bufs = pack_tree(tree, spec)
    assert set(bufs) == {"float32", "bfloat16", "int32"}
    out = unpack_tree(bufs, spec)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unpack_inside_jit_matches_eager():
    tree = _tree(jax.random.PRNGKey(1))
    packed = PackedParams.pack(tree)

    def consume(bufs):
        t = unpack_tree(bufs, packed.spec)
        return jnp.sum(t["a"]["w"]) + jnp.sum(t["c"][0].astype(jnp.float32))

    jitted = jax.jit(consume)(packed.buffers)
    eager = consume(packed.buffers)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager), rtol=1e-6)


def test_spec_from_eval_shape_matches_concrete():
    """The bench derives specs abstractly (tuple_specs) while the packed
    init packs concrete trees — the layouts must agree."""

    def init(k):
        return (_tree(k), {"solo": jnp.zeros((7,), jnp.bfloat16)})

    key = jax.random.PRNGKey(2)
    specs = tuple_specs(init, (key,))
    concrete = init(key)
    for spec, tree in zip(specs, concrete):
        assert spec == make_pack_spec(tree)
        out = unpack_tree(pack_tree(tree, spec), spec)
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_spec_digest_changes_with_layout():
    t1 = {"w": jnp.zeros((3, 5), jnp.float32)}
    t2 = {"w": jnp.zeros((5, 3), jnp.float32)}
    assert make_pack_spec(t1).digest() != make_pack_spec(t2).digest()


def test_packed_init_matches_direct_init():
    """packed_init (the shared bench/__graft_entry__ wiring) must hand
    back the same values the raw init would, as PackedParams per tree."""
    from ctrlv_tpu.utils.packed_params import packed_init

    def init(k):
        return (_tree(k), {"solo": jnp.ones((7,), jnp.bfloat16)})

    key = jax.random.PRNGKey(5)
    a, b = packed_init(init, (key,), tag="test_packed_init")
    assert isinstance(a, PackedParams) and isinstance(b, PackedParams)
    ref_a, ref_b = init(key)
    for got, ref in ((a, ref_a), (b, ref_b)):
        for x, y in zip(jax.tree.leaves(got.tree()), jax.tree.leaves(ref)):
            assert x.dtype == y.dtype
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
