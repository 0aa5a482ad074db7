"""Characterize the native nuScenes conditioning-frame renderer against a
real matplotlib render (VERDICT r3 missing #1): the reference draws nuScenes
bbox frames with matplotlib patches + line plots on a 1600x900 black canvas,
tight-crops the figure to png, and resizes to the train size
(/root/reference/src/ctrlv/datasets/nuscenes_.py:45-156, cached at :354-384).
Ours draws straight at the train raster with coords scaled by
(train_W/1600, train_H/900) and fitted line-band half-widths. This test
renders the same projected geometry through BOTH pipelines and quantifies
the drift (fill-mask IoU, wireframe-mask IoU, color agreement) — the same
protocol as tests/test_rasterize_cv2_parity.py. Numbers recorded below and
in STATUS.md round-4 notes.
"""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.patches as patches  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402
from PIL import Image  # noqa: E402

from ctrlv_tpu.ops.rasterize import (  # noqa: E402
    TYPE_COLORS,
    rasterize_frame_3dstyle_np,
)

ORIG_W, ORIG_H = 1600, 900
H, W = 320, 512
SX, SY = W / ORIG_W, H / ORIG_H


def _nusc_corners(center, wlh, yaw):
    """(3, 8) camera-frame corners in the devkit convention: x right,
    y down, z forward; first 4 corners = front face."""
    w, l, h = wlh
    x = l / 2 * np.asarray([1, 1, 1, 1, -1, -1, -1, -1])
    y = h / 2 * np.asarray([-1, -1, 1, 1, -1, -1, 1, 1])
    z = w / 2 * np.asarray([1, -1, -1, 1, 1, -1, -1, 1])
    pts = np.stack([x, y, z])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return rot @ pts + np.asarray(center, np.float64)[:, None]


INTRINSIC = np.asarray(
    [[1266.42, 0.0, 800.0], [0.0, 1266.42, 450.0], [0.0, 0.0, 1.0]]
)


def _scene():
    """Five nuScenes-plausible boxes in camera frame: near/far, rotated,
    one partially outside the canvas."""
    specs = [
        ((2.5, 1.0, 12.0), (1.9, 4.6, 1.7), 0.15),
        ((-4.0, 1.1, 20.0), (2.0, 4.8, 1.8), -1.3),
        ((0.5, 1.0, 35.0), (1.8, 4.4, 1.6), 1.57),
        ((-9.5, 1.2, 14.0), (2.5, 7.0, 2.9), 0.6),   # clipped at left edge
        ((6.0, 1.0, 25.0), (1.9, 4.5, 1.7), -0.5),
    ]
    corners2d = []
    for center, wlh, yaw in specs:
        c3 = _nusc_corners(center, wlh, yaw)
        pts = (INTRINSIC @ c3) / np.maximum((INTRINSIC @ c3)[2:3], 1e-6)
        corners2d.append(pts[:2].T)
    corners2d = np.asarray(corners2d, np.float32)  # (N, 8, 2) @ 1600x900
    types = np.asarray([3, 4, 3, 5, 7])
    outline = np.asarray(TYPE_COLORS)[types][:, ::-1]  # REVERT_CHANNEL_F
    rng = np.random.default_rng(7)
    fill = rng.uniform(50 / 255.0, 1.0, size=(len(specs), 3)).astype(np.float32)
    return corners2d, outline.astype(np.float32), fill


def _matplotlib_render(corners2d, outline, fill, show_3d, tmp_path):
    """Transliteration of my_render_3d_style + the reference figure pipeline
    (nuscenes_.py:91-156, :369-380) — the oracle."""
    fig, ax = plt.subplots()
    ax.set_xlim(0, ORIG_W)
    ax.set_ylim(ORIG_H, 0)
    ax.set_aspect("equal")
    im = Image.new("RGB", (ORIG_W, ORIG_H))
    ax.imshow(im)
    ax.axis("off")
    for n in range(len(corners2d)):
        c = corners2d[n].astype(np.float64)
        if show_3d:
            for i in range(4):  # sides
                ax.plot(
                    [c[i][0], c[i + 4][0]], [c[i][1], c[i + 4][1]],
                    color=outline[n], linewidth=2,
                )
            for ring in (c[:4], c[4:]):  # front/rear rings
                prev = ring[-1]
                for corner in ring:
                    ax.plot(
                        [prev[0], corner[0]], [prev[1], corner[1]],
                        color=outline[n], linewidth=2,
                    )
                    prev = corner
            ax.plot(  # rear-face x mark (4-6-5-7 polyline)
                [c[4][0], c[6][0], c[5][0], c[7][0]],
                [c[4][1], c[6][1], c[5][1], c[7][1]],
                color=outline[n], linewidth=1,
            )
        x1, x2 = c[:, 0].min(), c[:, 0].max()
        y1, y2 = c[:, 1].min(), c[:, 1].max()
        edgecolor = "none" if show_3d else outline[n]
        ax.add_patch(
            patches.Rectangle(
                (x1, y1), x2 - x1, y2 - y1, linewidth=2,
                edgecolor=edgecolor, facecolor=fill[n], alpha=0.75,
            )
        )
    ax.axis("off")
    plt.margins(x=0, y=0)
    fig.tight_layout()
    path = str(tmp_path / f"oracle_{int(show_3d)}.png")
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.clf()
    plt.close()
    img = Image.open(path).convert("RGB").resize((W, H))
    return np.asarray(img, np.float32) / 255.0


def _ours(corners2d, outline, fill, show_3d):
    scaled = corners2d * np.asarray([SX, SY], np.float32)
    return rasterize_frame_3dstyle_np(
        scaled, np.ones(len(corners2d), bool), outline, fill,
        height=H, width=W, show_3d=show_3d, show_2d=True,
    )


def _mask_iou(a, b, thresh=10 / 255.0):
    am, bm = a.max(-1) > thresh, b.max(-1) > thresh
    inter = (am & bm).sum()
    union = (am | bm).sum()
    return inter / max(union, 1), am.sum(), bm.sum()


def test_2dstyle_fill_parity_vs_matplotlib(tmp_path):
    """if_3d=False (the reference default): alpha-0.75 fills + lw-2 edges."""
    corners2d, outline, fill = _scene()
    ref = _matplotlib_render(corners2d, outline, fill, False, tmp_path)
    ours = _ours(corners2d, outline, fill, False)
    iou, n_ref, n_ours = _mask_iou(ref, ours)
    both = (ref.max(-1) > 10 / 255.0) & (ours.max(-1) > 10 / 255.0)
    close = (np.abs(ref - ours).max(-1) < 16 / 255.0) & both
    agree = close.sum() / max(both.sum(), 1)
    print(f"2d-style: IoU={iou:.3f} agree={agree:.3f} "
          f"mpl_px={n_ref} ours_px={n_ours}")
    # Rect fills dominate; measured IoU=0.972, color agreement=0.952 (the
    # disagreement is the anti-aliased 1px rim + anisotropic edge bands).
    assert iou > 0.95, f"fill mask IoU {iou:.3f}"
    assert agree > 0.85, f"color agreement {agree:.3f}"
    assert 0.85 < n_ours / n_ref < 1.15


def test_3dstyle_wireframe_parity_vs_matplotlib(tmp_path):
    """if_3d=True: opaque wireframes above the fills."""
    corners2d, outline, fill = _scene()
    ref = _matplotlib_render(corners2d, outline, fill, True, tmp_path)
    ours = _ours(corners2d, outline, fill, True)
    iou, n_ref, n_ours = _mask_iou(ref, ours)
    # Wireframe-only masks: pixels where the opaque outline color won.
    # Approximate via exact-color match to each box's outline color.
    def wire_mask(img):
        m = np.zeros(img.shape[:2], bool)
        for n in range(len(outline)):
            m |= np.abs(img - outline[n]).max(-1) < 0.25
        return m

    wref, wours = wire_mask(ref), wire_mask(ours)
    winter = (wref & wours).sum()
    wiou = winter / max((wref | wours).sum(), 1)
    print(f"3d-style: frame IoU={iou:.3f} wire IoU={wiou:.3f} "
          f"mpl_wire_px={wref.sum()} ours_wire_px={wours.sum()}")
    # Measured: combined IoU=0.974, wireframe-band IoU=0.882 (matplotlib's
    # anti-aliased lw-2 band at the resized raster vs our hard band; fitted
    # half-width _HW_3DSTYLE_2 keeps the areas within 10%).
    assert iou > 0.95, f"combined mask IoU {iou:.3f}"
    assert wiou > 0.7, f"wireframe mask IoU {wiou:.3f}"
    assert 0.75 < wours.sum() / max(wref.sum(), 1) < 1.3


def test_native_xla_numpy_bit_parity():
    """The two host backends (numpy, C++) are bit-equal; the XLA device
    twin matches to 1 ulp (XLA fuses the blend into FMAs), so the
    characterization above covers all of them."""
    import jax.numpy as jnp

    from ctrlv_tpu.data.native import load_native, rasterize_frame_3dstyle_native
    from ctrlv_tpu.ops.rasterize import rasterize_frame_3dstyle

    corners2d, outline, fill = _scene()
    scaled = corners2d * np.asarray([SX, SY], np.float32)
    valid = np.asarray([1, 1, 0, 1, 1], bool)
    for show_3d in (False, True):
        a = rasterize_frame_3dstyle_np(
            scaled, valid, outline, fill, H, W, show_3d=show_3d
        )
        c = np.asarray(
            rasterize_frame_3dstyle(
                jnp.asarray(scaled), jnp.asarray(valid), jnp.asarray(outline),
                jnp.asarray(fill), height=H, width=W, show_3d=show_3d,
            )
        )
        np.testing.assert_allclose(a, c, atol=1e-6)
        if load_native() is not None:
            b = rasterize_frame_3dstyle_native(
                scaled, valid, outline, fill,
                height=H, width=W, show_3d=show_3d,
            )
            np.testing.assert_array_equal(a, b)
