"""XLA-native bounding-box rasterizer (jit-able conditioning-frame renderer).

Replaces the reference's OpenCV host-side renderer
(/root/reference/src/ctrlv/utils/plotting.py:55-124 plot_3d_bbox,
:33-51 plot_trajectory): 3D wireframe boxes (12 edges, 2px, per-type
color + 1px back-X), filled 2D rects (per-track color, alpha 0.75), and
trajectory dot frames (r=20 track-color circle + r=10 type-color circle).

TPU-first design: instead of sequential cv2 draw calls, every pixel tests
coverage against all N padded object slots at once (N=30 —
MAX_BOXES_PER_DATA), with "last object wins" select semantics matching
cv2's sequential overwrites. The whole conditioning clip can therefore be
rendered on device inside the input pipeline or fused into the sampler.
Colors use the reference's palette; per-track colors come from a
deterministic integer hash instead of a random defaultdict (documented
behavioral delta — the model only needs color *consistency* per track).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Reference palette (plotting.py:10-31), applied to RGB arrays verbatim as
# the reference does (rgb2bgr=False in the dataset path).
TYPE_COLORS = np.asarray(
    [
        (255, 0, 0),      # BLUE (tuple order as reference applies it)
        (255, 255, 255),  # WHITE
        (0, 0, 255),      # RED
        (2, 255, 250),    # YELLOW
        (247, 44, 200),   # PURPLE
        (42, 42, 165),    # BROWN
        (0, 255, 0),      # GREEN
        (44, 162, 247),   # ORANGE
        (255, 153, 204),  # LIGHTPURPLE
        (204, 204, 255),  # LIGHTRED
        (128, 128, 128),  # GRAY
    ],
    dtype=np.float32,
) / 255.0


def track_color(track_id) -> jnp.ndarray:
    """Deterministic pseudo-random color in [50,255]/255 per track id.

    Works for both jnp (device) and np (host) inputs — same bits.
    """
    is_np = isinstance(track_id, np.ndarray)
    xp = np if is_np else jnp
    x = xp.asarray(track_id).astype(np.uint32 if is_np else jnp.uint32)
    colors = []
    for salt in (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35):
        h = (x + np.uint32(salt)) * np.uint32(0x27D4EB2F)
        h = h ^ (h >> 15)
        h = h * np.uint32(0x165667B1)
        h = h ^ (h >> 13)
        colors.append(50.0 + (h % 206).astype(np.float32 if is_np else jnp.float32))
    # reference flips channel order for track colors (REVERT_CHANNEL_F)
    return xp.stack(colors[::-1], axis=-1) / 255.0


def project_boxes_3d_np(
    location: np.ndarray,
    dimensions: np.ndarray,
    rotation_y: np.ndarray,
    cam_to_img: np.ndarray,
) -> np.ndarray:
    """Numpy twin of project_boxes_3d for host-side dataset code —
    avoids per-object device dispatches in __getitem__."""
    h, w, l = dimensions[:, 0], dimensions[:, 1], dimensions[:, 2]
    cx, cy, cz = location[:, 0], location[:, 1], location[:, 2]
    ry = rotation_y
    corners = []
    for i in (1.0, -1.0):
        for j in (1.0, -1.0):
            for k in (0.0, 1.0):
                px = cx + i * w / 2 * np.cos(-ry + np.pi / 2) + (j * i) * l / 2 * np.cos(-ry)
                pz = cz + i * w / 2 * np.sin(-ry + np.pi / 2) + (j * i) * l / 2 * np.sin(-ry)
                py = cy - k * h
                corners.append(np.stack([px, py, pz], axis=-1))
    pts = np.stack(corners, axis=1)
    if cam_to_img.shape[-1] == 4:
        pts = np.concatenate([pts, np.ones(pts.shape[:-1] + (1,), pts.dtype)], -1)
    proj = np.einsum("rc,nkc->nkr", cam_to_img, pts)
    z = proj[..., 2]
    safe_z = np.where(np.abs(z) > 1e-4, z, 1e-4)
    return np.floor(proj[..., :2] / safe_z[..., None]).astype(np.float32)


def project_boxes_3d(
    location: jnp.ndarray,  # (N, 3) camera-space box bottom-center
    dimensions: jnp.ndarray,  # (N, 3) (h, w, l)
    rotation_y: jnp.ndarray,  # (N,)
    cam_to_img: jnp.ndarray,  # (3, 4) or (3, 3)
) -> jnp.ndarray:
    """KITTI-convention 3D box corners -> (N, 8, 2) image points.

    Corner enumeration order matches the reference's i/j/k loops
    (plotting.py:81-95) so edge indices line up.
    """
    h, w, l = dimensions[:, 0], dimensions[:, 1], dimensions[:, 2]
    cx, cy, cz = location[:, 0], location[:, 1], location[:, 2]
    ry = rotation_y

    corners = []
    for i in (1.0, -1.0):
        for j in (1.0, -1.0):
            for k in (0.0, 1.0):
                px = cx + i * w / 2 * jnp.cos(-ry + jnp.pi / 2) + (j * i) * l / 2 * jnp.cos(-ry)
                pz = cz + i * w / 2 * jnp.sin(-ry + jnp.pi / 2) + (j * i) * l / 2 * jnp.sin(-ry)
                py = cy - k * h
                corners.append(jnp.stack([px, py, pz], axis=-1))
    pts = jnp.stack(corners, axis=1)  # (N, 8, 3)

    if cam_to_img.shape[-1] == 4:
        ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
        pts_h = jnp.concatenate([pts, ones], axis=-1)
    else:
        pts_h = pts
    proj = jnp.einsum("rc,nkc->nkr", cam_to_img, pts_h)  # (N, 8, 3)
    z = proj[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-4, z, 1e-4)
    xy = proj[..., :2] / safe_z[..., None]
    # reference casts to int16 before drawing
    return jnp.floor(xy).astype(jnp.float32)


# Wireframe edge index pairs over the 8 corners (plotting.py:96-109):
# 4 "(2i,2i+1)" edges + 8 ring edges + 2 back-X diagonals (thickness 1).
_EDGES = tuple((2 * i, 2 * i + 1) for i in range(4)) + tuple(
    (i, (i + 2) % 8) for i in range(8)
)
_X_EDGES = ((2, 5), (3, 4))

# Distance-to-segment half-widths matching cv2's drawn pixel sets,
# fitted empirically over random segments (tests/test_rasterize_cv2_parity):
# cv2 thickness=2 actually lights a ~3 px band with ~1 px end caps —
# hw=1.4 scores mask-IoU 0.91/segment vs 0.70 at the naive hw=1.0;
# thickness=1 (the back-X diagonals) is Bresenham, hw=0.5 (IoU 0.885).
_HW_THICK2 = 1.4
_HW_THICK1 = 0.5


def _segment_coverage(px, py, p0, p1, half_width):
    """Distance-to-segment test for all pixels: (H,W) bool per segment."""
    d = p1 - p0  # (2,)
    len2 = jnp.maximum(d[0] ** 2 + d[1] ** 2, 1e-8)
    tx = ((px - p0[0]) * d[0] + (py - p0[1]) * d[1]) / len2
    t = jnp.clip(tx, 0.0, 1.0)
    qx = p0[0] + t * d[0]
    qy = p0[1] + t * d[1]
    dist2 = (px - qx) ** 2 + (py - qy) ** 2
    return dist2 <= half_width**2


@functools.partial(jax.jit, static_argnames=("height", "width", "plot_2d_bbox"))
def rasterize_frame(
    corners: jnp.ndarray,  # (N, 8, 2) projected 3D corners
    bbox2d: jnp.ndarray,  # (N, 4) xyxy
    valid: jnp.ndarray,  # (N,) bool
    type_color: jnp.ndarray,  # (N, 3)
    trk_color: jnp.ndarray,  # (N, 3)
    background: Optional[jnp.ndarray] = None,  # (H, W, 3) in [0,1]
    height: int = 320,
    width: int = 512,
    plot_2d_bbox: bool = True,
    alpha_2dbbox: float = 0.75,
) -> jnp.ndarray:
    """Render one bbox conditioning frame, (H, W, 3) in [0,1]."""
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = jnp.broadcast_to(ys, (height, width))
    px = jnp.broadcast_to(xs, (height, width))

    n = corners.shape[0]

    # ---- 3D wireframe canvas ------------------------------------------
    def object_line_cover(c8):  # c8: (8, 2)
        cover = jnp.zeros((height, width), bool)
        for a, b in _EDGES:
            cover |= _segment_coverage(px, py, c8[a], c8[b], _HW_THICK2)
        for a, b in _X_EDGES:
            cover |= _segment_coverage(px, py, c8[a], c8[b], _HW_THICK1)
        return cover

    line_cover = jax.vmap(object_line_cover)(corners)  # (N, H, W)
    line_cover &= valid[:, None, None]

    # ---- filled 2D rect canvas ----------------------------------------
    x1, y1, x2, y2 = (jnp.floor(bbox2d[:, i])[:, None, None] for i in range(4))
    rect_cover = (px[None] >= x1) & (px[None] <= x2) & (py[None] >= y1) & (py[None] <= y2)
    rect_cover &= valid[:, None, None]

    # "last object wins" like sequential cv2 draws
    obj_rank = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]

    def select_color(cover, colors):
        ranked = jnp.where(cover, obj_rank, 0)
        winner = jnp.argmax(ranked, axis=0)  # (H, W)
        any_cover = jnp.any(cover, axis=0)
        color = colors[winner]  # (H, W, 3)
        return any_cover, color

    base = (
        background
        if background is not None
        else jnp.zeros((height, width, 3), jnp.float32)
    )
    out = base

    if plot_2d_bbox:
        rect_any, rect_color = select_color(rect_cover, trk_color)
        blended = alpha_2dbbox * rect_color + (1.0 - alpha_2dbbox) * base
        out = jnp.where(rect_any[..., None], blended, out)

    line_any, line_color = select_color(line_cover, type_color)
    out = jnp.where(line_any[..., None], line_color, out)
    return out


@functools.partial(jax.jit, static_argnames=("height", "width"))
def rasterize_trajectory_frame(
    centers: jnp.ndarray,  # (N, 2) box centers
    valid: jnp.ndarray,  # (N,)
    type_color: jnp.ndarray,  # (N, 3)
    trk_color: jnp.ndarray,  # (N, 3)
    background: Optional[jnp.ndarray] = None,
    height: int = 320,
    width: int = 512,
    outer_radius: float = 20.0,
    inner_radius: float = 10.0,
) -> jnp.ndarray:
    """Trajectory frame: concentric dots at box centers (plotting.py:33-51)."""
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    d2 = (xs[None] - centers[:, 0, None, None]) ** 2 + (
        ys[None] - centers[:, 1, None, None]
    ) ** 2  # (N, H, W)
    outer = (d2 <= outer_radius**2) & valid[:, None, None]
    inner = (d2 <= inner_radius**2) & valid[:, None, None]

    n = centers.shape[0]
    obj_rank = jnp.arange(1, n + 1, dtype=jnp.int32)[:, None, None]
    base = (
        background
        if background is not None
        else jnp.zeros((height, width, 3), jnp.float32)
    )

    def paint(cover, colors, img):
        ranked = jnp.where(cover, obj_rank, 0)
        winner = jnp.argmax(ranked, axis=0)
        any_cover = jnp.any(cover, axis=0)
        return jnp.where(any_cover[..., None], colors[winner], img)

    out = paint(outer, trk_color, base)
    out = paint(inner, type_color, out)
    return out


def rasterize_clip(
    location,  # (F, N, 3)
    dimensions,  # (F, N, 3)
    rotation_y,  # (F, N)
    bbox2d,  # (F, N, 4)
    id_type,  # (F, N) int
    track_id,  # (F, N) int
    num_objects,  # (F,) int
    cam_to_img,  # (3,4)
    height: int,
    width: int,
    plot_2d_bbox: bool = True,
) -> jnp.ndarray:
    """Render a whole clip of bbox conditioning frames, (F, H, W, 3) [0,1]."""
    type_colors = jnp.asarray(TYPE_COLORS)

    def frame(loc, dim, rot, box, types, tracks, nobj):
        corners = project_boxes_3d(loc, dim, rot, jnp.asarray(cam_to_img))
        valid = jnp.arange(loc.shape[0]) < nobj
        tcol = type_colors[jnp.clip(types, 0, len(TYPE_COLORS) - 1)]
        kcol = track_color(tracks)
        return rasterize_frame(
            corners, box, valid, tcol, kcol,
            height=height, width=width, plot_2d_bbox=plot_2d_bbox,
        )

    return jax.vmap(frame)(
        location, dimensions, rotation_y, bbox2d, id_type, track_id, num_objects
    )
