"""Cross-validation: C++ native rasterizer vs the XLA device rasterizer."""

import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.data.native import (
    load_native,
    rasterize_frame_native,
    rasterize_trajectory_native,
)
from ctrlv_tpu.ops.rasterize import (
    project_boxes_3d,
    rasterize_frame,
    rasterize_trajectory_frame,
)

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native library build failed"
)

H, W = 64, 96


def _case(seed=0, n=4):
    rng = np.random.default_rng(seed)
    calib = jnp.asarray(
        [[80.0, 0, W / 2, 0], [0, 80.0, H / 2, 0], [0, 0, 1, 0]], jnp.float32
    )
    loc = jnp.asarray(rng.uniform([-4, 0, 6], [4, 2, 25], (n, 3)), jnp.float32)
    dims = jnp.asarray(rng.uniform(1, 3, (n, 3)), jnp.float32)
    rot = jnp.asarray(rng.uniform(-3, 3, n), jnp.float32)
    corners = project_boxes_3d(loc, dims, rot, calib)
    bbox = np.sort(rng.uniform(0, [W, H, W, H], (n, 4)).astype(np.float32), axis=-1)[
        :, [0, 1, 2, 3]
    ]
    bbox = np.stack(
        [
            np.minimum(bbox[:, 0], bbox[:, 2]),
            np.minimum(bbox[:, 1], bbox[:, 3]),
            np.maximum(bbox[:, 0], bbox[:, 2]),
            np.maximum(bbox[:, 1], bbox[:, 3]),
        ],
        axis=-1,
    )
    valid = rng.random(n) > 0.25
    tcol = rng.random((n, 3)).astype(np.float32)
    kcol = rng.random((n, 3)).astype(np.float32)
    return corners, bbox, valid, tcol, kcol


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_frame_parity(seed):
    corners, bbox, valid, tcol, kcol = _case(seed)
    xla = np.asarray(
        rasterize_frame(
            corners, jnp.asarray(bbox), jnp.asarray(valid),
            jnp.asarray(tcol), jnp.asarray(kcol), height=H, width=W,
        )
    )
    native = rasterize_frame_native(
        np.asarray(corners), bbox, valid, tcol, kcol, height=H, width=W
    )
    # float rounding at segment boundaries can flip isolated pixels;
    # require near-exact agreement.
    mismatched = np.abs(xla - native).max(axis=-1) > 1e-4
    assert mismatched.mean() < 0.002, f"{mismatched.sum()} mismatched pixels"


def test_trajectory_parity():
    rng = np.random.default_rng(0)
    n = 3
    centers = rng.uniform([10, 10], [W - 10, H - 10], (n, 2)).astype(np.float32)
    valid = np.asarray([True, True, False])
    tcol = rng.random((n, 3)).astype(np.float32)
    kcol = rng.random((n, 3)).astype(np.float32)
    xla = np.asarray(
        rasterize_trajectory_frame(
            jnp.asarray(centers), jnp.asarray(valid),
            jnp.asarray(tcol), jnp.asarray(kcol), height=H, width=W,
        )
    )
    native = rasterize_trajectory_native(centers, valid, tcol, kcol, H, W)
    mismatched = np.abs(xla - native).max(axis=-1) > 1e-4
    assert mismatched.mean() < 0.002
