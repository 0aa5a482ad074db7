"""XLA rasterizer tests: projection math, coverage semantics, determinism."""

import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.ops.rasterize import (
    TYPE_COLORS,
    project_boxes_3d,
    rasterize_clip,
    rasterize_frame,
    rasterize_trajectory_frame,
    track_color,
)


def _simple_calib(f=100.0, cx=64.0, cy=40.0):
    return jnp.asarray([[f, 0, cx, 0], [0, f, cy, 0], [0, 0, 1, 0]], jnp.float32)


def test_projection_center():
    """A box at the optical axis projects around the principal point."""
    loc = jnp.asarray([[0.0, 0.0, 10.0]])
    dims = jnp.asarray([[2.0, 2.0, 4.0]])
    rot = jnp.asarray([0.0])
    pts = np.asarray(project_boxes_3d(loc, dims, rot, _simple_calib()))
    assert pts.shape == (1, 8, 2)
    # All corners near the principal point (64, 40) within f*size/z margin
    assert np.all(np.abs(pts[0, :, 0] - 64) < 100 * 3 / 10 + 2)
    # y: box extends upward (KITTI y-down, bottom at y=0 -> rows <= cy)
    assert pts[0, :, 1].max() <= 41


def test_rasterize_frame_draws_rect():
    n = 2
    corners = jnp.full((n, 8, 2), -1000.0)  # wireframes off-screen
    bbox = jnp.asarray([[10, 10, 30, 20], [0, 0, 0, 0]], jnp.float32)
    valid = jnp.asarray([True, False])
    tcol = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    kcol = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    img = np.asarray(
        rasterize_frame(corners, bbox, valid, tcol, kcol, height=40, width=64)
    )
    # inside rect: alpha-blended track color (0.75 * green)
    np.testing.assert_allclose(img[15, 20], [0.0, 0.75, 0.0], atol=1e-5)
    # outside: black; invalid object contributed nothing
    np.testing.assert_allclose(img[35, 50], [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(img[1, 1], [0.0, 0.0, 0.0], atol=1e-6)


def test_last_object_wins_overlap():
    n = 2
    corners = jnp.full((n, 8, 2), -1000.0)
    bbox = jnp.asarray([[5, 5, 30, 30], [10, 10, 20, 20]], jnp.float32)
    valid = jnp.asarray([True, True])
    tcol = jnp.zeros((n, 3))
    kcol = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    img = np.asarray(
        rasterize_frame(corners, bbox, valid, tcol, kcol, height=40, width=64)
    )
    # overlap region: object 1 (blue) wins, like sequential cv2 draws
    np.testing.assert_allclose(img[15, 15], [0.0, 0.0, 0.75], atol=1e-5)
    # non-overlap region of object 0: red
    np.testing.assert_allclose(img[7, 7], [0.75, 0.0, 0.0], atol=1e-5)


def test_wireframe_draws_lines():
    calib = _simple_calib()
    loc = jnp.asarray([[0.0, 1.0, 8.0]])
    dims = jnp.asarray([[1.5, 1.6, 4.0]])
    rot = jnp.asarray([0.3])
    corners = project_boxes_3d(loc, dims, rot, calib)
    valid = jnp.asarray([True])
    tcol = jnp.asarray([[1.0, 1.0, 1.0]])
    kcol = jnp.asarray([[0.5, 0.5, 0.5]])
    img = np.asarray(
        rasterize_frame(
            corners, jnp.zeros((1, 4)), valid, tcol, kcol,
            height=80, width=128, plot_2d_bbox=False,
        )
    )
    assert img.sum() > 0  # some wireframe pixels drawn
    assert (img.sum(axis=-1) > 0).mean() < 0.5  # but sparse (lines, not fill)


def test_track_color_deterministic_and_in_range():
    c1 = np.asarray(track_color(jnp.asarray([1, 2, 3, 1])))
    assert c1.shape == (4, 3)
    np.testing.assert_array_equal(c1[0], c1[3])
    assert (c1 >= 50 / 255 - 1e-6).all() and (c1 <= 1.0).all()
    assert not np.allclose(c1[0], c1[1])


def test_rasterize_clip_batch():
    F, N = 2, 3
    rng = np.random.default_rng(0)
    out = rasterize_clip(
        jnp.asarray(rng.uniform(-5, 5, (F, N, 3)), jnp.float32),
        jnp.asarray(rng.uniform(1, 3, (F, N, 3)), jnp.float32),
        jnp.asarray(rng.uniform(-3, 3, (F, N)), jnp.float32),
        jnp.asarray(rng.uniform(0, 60, (F, N, 4)), jnp.float32),
        jnp.asarray(rng.integers(0, 5, (F, N))),
        jnp.asarray(rng.integers(0, 100, (F, N))),
        jnp.asarray([N, N - 1]),
        np.asarray(_simple_calib()),
        height=40,
        width=64,
    )
    assert out.shape == (F, 40, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_trajectory_frame():
    centers = jnp.asarray([[32.0, 20.0]])
    img = np.asarray(
        rasterize_trajectory_frame(
            centers,
            jnp.asarray([True]),
            jnp.asarray([[1.0, 0.0, 0.0]]),
            jnp.asarray([[0.0, 1.0, 0.0]]),
            height=40,
            width=64,
        )
    )
    np.testing.assert_allclose(img[20, 32], [1.0, 0.0, 0.0])  # inner dot
    np.testing.assert_allclose(img[20, 32 + 15], [0.0, 1.0, 0.0])  # outer ring
    np.testing.assert_allclose(img[5, 5], [0.0, 0.0, 0.0])


def test_render_gt_3d_bbox_plots_reference_colors():
    """Teaser GT plots: white canvas, plum wireframes on frame 0, gold on
    later frames (reference draw_teaser.py:229-240 semantics)."""
    from ctrlv_tpu.utils.misc import render_gt_3d_bbox_plots

    n = 30
    objects = {
        "locations": np.zeros((2, n, 3), np.float32),
        "dimensions": np.zeros((2, n, 3), np.float32),
        "rotation_y": np.zeros((2, n), np.float32),
        "bbox": np.zeros((2, n, 4), np.float32),
        "track_id": np.zeros((2, n), np.int64),
        "num_objects": np.asarray([1, 1]),
    }
    # one box in front of the camera in both frames
    objects["locations"][:, 0] = [0.0, 0.0, 10.0]
    objects["dimensions"][:, 0] = [2.0, 2.0, 4.0]
    calib = np.asarray([[100, 0, 64, 0], [0, 100, 40, 0], [0, 0, 1, 0]], np.float32)
    plots = render_gt_3d_bbox_plots(objects, calib, 80, 128, plot_2d_bbox=False)
    assert len(plots) == 2 and plots[0].shape == (80, 128, 3)
    plum = np.asarray([221, 160, 221], np.float32)[::-1] / 255.0
    gold = np.asarray([255, 215, 0], np.float32)[::-1] / 255.0
    # background stays white
    np.testing.assert_allclose(plots[0][0, 0], [1, 1, 1], atol=1e-6)
    # wireframe pixels exist and carry the frame color exactly
    f0_drawn = (np.abs(plots[0] - plum[None, None]) < 1e-6).all(-1)
    f1_drawn = (np.abs(plots[1] - gold[None, None]) < 1e-6).all(-1)
    assert f0_drawn.sum() > 10
    assert f1_drawn.sum() > 10
