"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ctrlv_tpu.parallel import make_mesh


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


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must pass on the virtual mesh."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
