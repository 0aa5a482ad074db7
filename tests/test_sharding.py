"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ctrlv_tpu.parallel import make_mesh

pytestmark = pytest.mark.mesh


def test_virtual_devices():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "frame": 1}
    mesh2 = make_mesh(n_data=4, n_frame=2)
    assert mesh2.shape == {"data": 4, "frame": 2}


def test_dp_psum_semantics():
    """Sharded-batch loss grad == single-device grad (XLA-inserted psum)."""
    mesh = make_mesh()
    w = jnp.asarray([2.0, -1.0])
    x = jnp.arange(16, dtype=jnp.float32).reshape(8, 2)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.grad(loss)(w, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-6)


def test_zero1_optimizer_state_sharding():
    """ZeRO-1 moment sharding: same numerics as replicated, and the big
    AdamW moment leaves actually land sharded over the data axis."""
    import optax

    from ctrlv_tpu.parallel import shard_train_state, zero1_sharding_tree
    from ctrlv_tpu.train.state import init_train_state

    from ctrlv_tpu.train.state import TrainState

    mesh = make_mesh()  # data=8
    params = {
        # large enough to pass zero1's min_size and divisible by 8
        "dense": {"kernel": jnp.ones((64, 1024)), "bias": jnp.zeros((1024,))},
        "tiny": {"w": jnp.ones((3,))},
    }
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(0.1))

    def make_step():
        def step(state, x):
            def loss_fn(p):
                return jnp.mean((x @ p["dense"]["kernel"]) ** 2) + jnp.sum(
                    p["tiny"]["w"] ** 2
                )

            grads = jax.grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(
                params=params, opt_state=opt_state, step=state.step + 1
            )

        return jax.jit(step)

    x = jnp.arange(8 * 64, dtype=jnp.float32).reshape(8, 64) / 512.0

    # replicated reference
    s_ref = shard_train_state(init_train_state(params, tx), mesh, zero1=False)
    out_ref = make_step()(s_ref, jax.device_put(x, NamedSharding(mesh, P("data"))))

    # ZeRO-1
    s_z1 = shard_train_state(init_train_state(params, tx), mesh, zero1=True)
    # the big kernel's AdamW moments must actually land sharded on device
    kernel_mu = s_z1.opt_state[1][0].mu["dense"]["kernel"]
    assert kernel_mu.sharding.spec != P(), kernel_mu.sharding
    shardings = zero1_sharding_tree(s_z1.opt_state, mesh)
    flat = jax.tree.leaves(shardings, is_leaf=lambda s: isinstance(s, NamedSharding))
    assert any(s.spec != P() for s in flat)
    out_z1 = make_step()(s_z1, jax.device_put(x, NamedSharding(mesh, P("data"))))

    for a, b in zip(jax.tree.leaves(out_ref.params), jax.tree.leaves(out_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must pass on the virtual mesh."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
