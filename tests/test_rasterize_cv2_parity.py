"""Characterize the XLA rasterizer against a real cv2 render (VERDICT r2
weak #7): the reference draws conditioning frames with cv2 Bresenham
thickness-2 lines + FILLED rects (+0.75 alpha) on a black canvas
(/root/reference/src/ctrlv/utils/plotting.py:55-124); ours tests
distance-to-segment coverage per pixel on device. This test renders the
same projected geometry through BOTH backends and quantifies the drift
(wireframe mask IoU, combined mask IoU, color agreement) so the
conditioning-frame distribution delta a finetuned checkpoint would see is
measured, not assumed. Numbers recorded in STATUS.md round-3 notes.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from ctrlv_tpu.ops.rasterize import (  # noqa: E402
    TYPE_COLORS,
    project_boxes_3d_np,
    rasterize_frame,
    track_color,
)

H, W = 320, 512
# KITTI P2 intrinsics scaled from 1242x375 to the 512x320 render size.
_SX, _SY = W / 1242.0, H / 375.0
CAM = np.asarray(
    [
        [721.5377 * _SX, 0.0, 609.5593 * _SX, 44.857 * _SX],
        [0.0, 721.5377 * _SY, 172.854 * _SY, 0.2164 * _SY],
        [0.0, 0.0, 1.0, 0.00274],
    ],
    np.float32,
)


def _scene():
    """Five KITTI-plausible cars: near/far, rotated, one truncated at the
    left edge — exercises on-screen edges, steep diagonals, and clipping."""
    location = np.asarray(
        [
            [2.5, 1.6, 8.0],     # near, right of center
            [-3.0, 1.7, 14.0],   # mid, left
            [0.5, 1.6, 25.0],    # far, centered
            [-8.5, 1.8, 10.0],   # truncated at left edge
            [5.0, 1.7, 18.0],    # mid-right, rotated
        ],
        np.float32,
    )
    dimensions = np.asarray(
        [
            [1.5, 1.6, 3.9],
            [1.6, 1.7, 4.1],
            [1.4, 1.6, 3.6],
            [2.0, 1.9, 5.5],
            [1.5, 1.6, 4.0],
        ],
        np.float32,
    )  # (h, w, l)
    rotation_y = np.asarray([0.1, -1.5, 1.57, 0.8, -0.6], np.float32)
    corners = project_boxes_3d_np(location, dimensions, rotation_y, CAM)
    # 2D boxes from the projected extent, clipped to the image
    x1 = np.clip(corners[..., 0].min(1), 0, W - 1)
    x2 = np.clip(corners[..., 0].max(1), 0, W - 1)
    y1 = np.clip(corners[..., 1].min(1), 0, H - 1)
    y2 = np.clip(corners[..., 1].max(1), 0, H - 1)
    bbox2d = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    types = np.asarray([0, 2, 0, 5, 0])  # car, car, truck-ish, ...
    tracks = np.asarray([3, 7, 11, 2, 19])
    tcol = np.asarray(TYPE_COLORS)[types]
    kcol = np.asarray(track_color(tracks))
    return corners, bbox2d, tcol, kcol


def _cv2_render(corners, bbox2d, type_cols, trk_cols, plot_2d_bbox, alpha=0.75):
    """Transliteration of the reference's draw sequence (plotting.py:65-124)
    with explicit colors, black background — the oracle."""
    img = np.zeros((H, W, 3), np.float32)
    canvas3d = np.zeros_like(img)
    canvas2d = np.zeros_like(img)
    for n in range(len(corners)):
        box_3d = corners[n].astype(np.int16)
        color = tuple(float(c) * 255.0 for c in type_cols[n])
        for i in range(4):
            p1, p2 = box_3d[2 * i], box_3d[2 * i + 1]
            cv2.line(canvas3d, (int(p1[0]), int(p1[1])), (int(p2[0]), int(p2[1])), color, 2)
        for i in range(8):
            p1, p2 = box_3d[i], box_3d[(i + 2) % 8]
            cv2.line(canvas3d, (int(p1[0]), int(p1[1])), (int(p2[0]), int(p2[1])), color, 2)
        back = [(int(box_3d[i][0]), int(box_3d[i][1])) for i in (2, 3, 4, 5)]
        cv2.line(canvas3d, back[0], back[3], color, 1)
        cv2.line(canvas3d, back[1], back[2], color, 1)
        if plot_2d_bbox:
            tc = tuple(float(c) * 255.0 for c in trk_cols[n])
            cv2.rectangle(
                canvas2d,
                (int(bbox2d[n, 0]), int(bbox2d[n, 1])),
                (int(bbox2d[n, 2]), int(bbox2d[n, 3])),
                tc,
                cv2.FILLED,
            )
    mask = canvas2d.astype(bool)
    img[mask] = cv2.addWeighted(canvas2d, alpha, img, 1 - alpha, 0)[mask]
    mask = canvas3d.astype(bool)
    img[mask] = canvas3d[mask]
    return img / 255.0


def _ours(corners, bbox2d, tcol, kcol, plot_2d_bbox):
    out = rasterize_frame(
        jnp.asarray(corners),
        jnp.asarray(bbox2d),
        jnp.ones(len(corners), bool),
        jnp.asarray(tcol),
        jnp.asarray(kcol),
        height=H,
        width=W,
        plot_2d_bbox=plot_2d_bbox,
    )
    return np.asarray(out)


def _mask_iou(a, b):
    am, bm = a.any(-1), b.any(-1)
    inter = (am & bm).sum()
    union = (am | bm).sum()
    return inter / max(union, 1), am.sum(), bm.sum()


def test_wireframe_mask_iou_vs_cv2():
    corners, bbox2d, tcol, kcol = _scene()
    ref = _cv2_render(corners, bbox2d, tcol, kcol, plot_2d_bbox=False)
    ours = _ours(corners, bbox2d, tcol, kcol, plot_2d_bbox=False)
    iou, n_ref, n_ours = _mask_iou(ref, ours)
    # The coverage half-width (ops/rasterize._HW_THICK2=1.4) is fitted to
    # cv2's drawn pixel set (thickness 2 lights a ~3 px band with ~1 px
    # caps). Measured on this scene: IoU=0.958 (cv2 7628 px vs ours 7466).
    print(f"wireframe: IoU={iou:.3f} cv2_px={n_ref} ours_px={n_ours}")
    assert iou > 0.9, f"wireframe mask IoU collapsed: {iou:.3f}"
    # Coverage area must be the same order (not 2x thicker/thinner)
    assert 0.8 < n_ours / n_ref < 1.25


def test_full_frame_iou_and_color_agreement_vs_cv2():
    corners, bbox2d, tcol, kcol = _scene()
    ref = _cv2_render(corners, bbox2d, tcol, kcol, plot_2d_bbox=True)
    ours = _ours(corners, bbox2d, tcol, kcol, plot_2d_bbox=True)
    iou, n_ref, n_ours = _mask_iou(ref, ours)
    both = ref.any(-1) & ours.any(-1)
    close = (np.abs(ref - ours).max(-1) < 2.5 / 255.0) & both
    agree = close.sum() / max(both.sum(), 1)
    mad = float(np.abs(ref - ours).mean())
    print(
        f"full frame: IoU={iou:.3f} color-agreement={agree:.3f} "
        f"mean|diff|={mad:.5f} cv2_px={n_ref} ours_px={n_ours}"
    )
    # Rect fills dominate the covered area and are geometrically identical
    # up to the 1px floor-vs-round boundary, so the combined IoU is high.
    # Measured on this scene: IoU=0.999, agreement=0.852 (the disagreeing
    # ~15% of overlap pixels are wireframe-vs-rect assignments along the
    # cv2 line band's rounding), mean|diff|=0.011. Floors set below the
    # measured values to catch regressions, not to claim bit parity.
    assert iou > 0.97, f"combined mask IoU {iou:.3f}"
    assert agree > 0.80, f"color agreement on overlap {agree:.3f}"


def test_darkness_cleanup_survival_matches_cv2():
    """What the OverallPipeline's IoU selection actually consumes: the
    binary mask after the reference's darkness cleanup (channel-sum >= 50/255).
    Both renders must survive the threshold identically at rect interiors."""
    corners, bbox2d, tcol, kcol = _scene()
    ref = _cv2_render(corners, bbox2d, tcol, kcol, plot_2d_bbox=True)
    ours = _ours(corners, bbox2d, tcol, kcol, plot_2d_bbox=True)
    ref_m = ref.sum(-1) >= 50.0 / 255.0
    ours_m = ours.sum(-1) >= 50.0 / 255.0
    inter = (ref_m & ours_m).sum()
    union = (ref_m | ours_m).sum()
    iou = inter / max(union, 1)
    print(f"post-cleanup mask IoU={iou:.3f}")
    assert iou > 0.9
