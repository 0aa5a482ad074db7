"""Devkit-free fixture tests for the native nuScenes math
(reference parity: nuscenes_.py:283-306 timestamp resampling,
:473-489 corner filtering + convex-hull canvas clipping)."""

import numpy as np

from ctrlv_tpu.data.nuscenes import (
    post_process_coords,
    project_box_to_2d,
    resample_by_timestamps,
    view_points,
)

INTRINSIC = np.array([[100.0, 0.0, 50.0], [0.0, 100.0, 50.0], [0.0, 0.0, 1.0]])


def _cube_corners(center_z: float, half: float = 0.5) -> np.ndarray:
    """(3,8) axis-aligned cube corners in the camera frame."""
    pts = []
    for dx in (-half, half):
        for dy in (-half, half):
            for dz in (-half, half):
                pts.append([dx, dy, center_z + dz])
    return np.asarray(pts).T


def test_resample_12hz_to_7hz():
    ts = np.arange(48) / 12.0  # 4 s of 12 Hz frames
    keep = resample_by_timestamps(ts, target_fps=7.0)
    # target_period = 1/7 - 0.05 ~= 0.0929 s; at exact 12 Hz the cumulative
    # delta crosses it every 2nd frame (the reference's own comment notes
    # the effective rate is faster than the nominal 7 Hz)
    assert keep == list(range(0, 48, 2))


def test_resample_respects_irregular_timestamps():
    # a dropped-frame gap must count as elapsed time
    ts = np.asarray([0.0, 1 / 12, 0.25, 0.26, 0.27, 0.40])
    keep = resample_by_timestamps(ts, target_fps=7.0)
    assert keep[0] == 0
    assert 2 in keep  # the 0.25s frame follows a >period gap
    # every consecutive selected pair is >= period apart OR follows a reset
    assert keep == sorted(set(keep))


def test_view_points_pinhole():
    pts = np.asarray([[0.0, 1.0], [0.0, -1.0], [2.0, 2.0]])  # (3,2)
    uv = view_points(pts, INTRINSIC)
    np.testing.assert_allclose(uv[:, 0], [50.0, 50.0])
    np.testing.assert_allclose(uv[:, 1], [100.0, 0.0])


def test_project_box_fully_visible():
    coords = project_box_to_2d(_cube_corners(5.0), INTRINSIC, imsize=(100, 100))
    assert coords is not None
    x1, y1, x2, y2 = coords
    # nearest face (z=4.5) gives the widest extent: 50 +- 100*0.5/4.5
    np.testing.assert_allclose([x1, y1], [50 - 100 * 0.5 / 4.5] * 2, rtol=1e-6)
    np.testing.assert_allclose([x2, y2], [50 + 100 * 0.5 / 4.5] * 2, rtol=1e-6)


def test_project_box_partially_behind_camera():
    # z corners at -0.2 and 0.8: the 4 behind-corners are dropped, the box
    # is kept (the round-1 implementation wrongly skipped it entirely)
    coords = project_box_to_2d(_cube_corners(0.3), INTRINSIC, imsize=(100, 100))
    assert coords is not None
    x1, y1, x2, y2 = coords
    # front face projects to 50 +- 62.5, clipped to the canvas
    assert (x1, y1) == (0.0, 0.0)
    assert (x2, y2) == (100.0, 100.0)


def test_project_box_fully_behind_camera():
    assert project_box_to_2d(_cube_corners(-5.0), INTRINSIC) is None


def test_hull_missing_canvas_is_dropped():
    corners = _cube_corners(5.0)
    corners[0] += 100.0  # shift far right: projects at x ~= 2000+
    assert project_box_to_2d(corners, INTRINSIC, imsize=(100, 100)) is None


def test_post_process_coords_clips_to_canvas():
    pts = np.asarray([[-10.0, -10.0], [110.0, -10.0], [110.0, 55.0], [-10.0, 55.0]])
    coords = post_process_coords(pts, imsize=(100, 100))
    assert coords == (0.0, 0.0, 100.0, 55.0)


def test_post_process_coords_degenerate_segment():
    # two corners in front -> hull is a segment; must still clip sanely
    pts = np.asarray([[-10.0, 20.0], [50.0, 20.0]])
    coords = post_process_coords(pts, imsize=(100, 100))
    assert coords == (0.0, 20.0, 50.0, 20.0)
