"""Misc utility parity helpers.

Counterparts of /root/reference/src/ctrlv/utils/util.py odds and ends that
don't warrant their own module: rand_log_normal (:172-175), caption
tokenization (:31-35), W&B media helpers (plotting.py:147-180, gated on
wandb availability).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def rand_log_normal(rng: jax.Array, shape, loc: float = 0.0, scale: float = 1.0):
    """Lognormal samples via inverse-CDF of uniform draws."""
    u = jax.random.uniform(rng, shape, minval=1e-7, maxval=1 - 1e-7)
    from jax.scipy.stats import norm

    return jnp.exp(norm.ppf(u) * scale + loc)


def tokenize_captions(batch_prompts: List[str], tokenizer):
    """HF tokenizer passthrough (max-length padded input ids)."""
    inputs = tokenizer(
        batch_prompts,
        max_length=tokenizer.model_max_length,
        padding="max_length",
        truncation=True,
        return_tensors="np",
    )
    return inputs.input_ids


def wandb_available() -> bool:
    try:
        import wandb  # noqa: F401

        return True
    except ImportError:
        return False


def tensor2wandbimage(frame, bbox_tensor=None, track_ids=None, caption=None):
    """wandb.Image with box overlays (no-op None when wandb is absent)."""
    if not wandb_available():
        return None
    import wandb

    if bbox_tensor is None:
        return wandb.Image(np.asarray(frame), caption=caption)
    box_data = [
        {
            "position": {
                "minX": float(b[0]), "minY": float(b[1]),
                "maxX": float(b[2]), "maxY": float(b[3]),
            },
            "class_id": int(t),
        }
        for b, t in zip(np.asarray(bbox_tensor), np.asarray(track_ids))
    ]
    return wandb.Image(
        np.asarray(frame),
        boxes={"ground__truth": {"box_data": box_data}},
        caption=caption,
    )


def wandb_frames_with_bbox(video, objects=None, image_size=(1242, 375)):
    """Per-frame wandb Images with normalized box overlays."""
    if not wandb_available():
        return []
    from .fourier import rescale_bbox

    video = np.asarray(video)  # (F, H, W, 3)
    frames = []
    for f in range(video.shape[0]):
        if objects is not None:
            boxes = np.asarray(
                rescale_bbox(objects["bbox"][0][f], image_size, (1, 1))
            )
            tracks = np.asarray(objects["track_id"][0][f])
            frames.append(
                tensor2wandbimage(video[f], boxes, tracks, caption=f"Frame {f}")
            )
        else:
            frames.append(tensor2wandbimage(video[f], caption=f"Frame {f}"))
    return frames


def render_gt_3d_bbox_plots(objects, cam_to_img, orig_h, orig_w, plot_2d_bbox=False):
    """Reference-style teaser plots: per-frame 3D-bbox wireframes on a white
    canvas, frame 0 in plum, later frames in gold.

    Transliterates /root/reference/tools/draw_teaser.py:229-240: canvas =
    white (orig_H, orig_W); box_color = Color('plum'|'gold').rgb passed
    channel-reversed (the (255*b, 255*g, 255*r) tuple applied to the RGB
    canvas); plot_2d_bbox only for bdd100k (2D rects, track colors).

    objects: dict of (F, N, ...) padded arrays for ONE sample (collate
    `objects` sliced at batch index); cam_to_img: (3,4)/(3,3) or None.
    Returns a list of (orig_h, orig_w, 3) float frames in [0,1].
    """
    import jax.numpy as jnp

    from ..ops.rasterize import (
        project_boxes_3d_np,
        rasterize_frame,
        track_color,
    )

    # css plum #DDA0DD, gold #FFD700, channel-reversed as the reference does
    plum = np.asarray([221, 160, 221], np.float32)[::-1] / 255.0
    gold = np.asarray([255, 215, 0], np.float32)[::-1] / 255.0

    f_total = objects["bbox"].shape[0]
    n = objects["bbox"].shape[1]
    white = jnp.ones((orig_h, orig_w, 3), jnp.float32)
    calib = None
    if cam_to_img is not None:
        calib = np.asarray(cam_to_img, np.float32)
        if calib.shape != (3, 4):
            calib = np.pad(calib, ((0, 0), (0, 1)))
    frames = []
    for f in range(f_total):
        color = plum if f == 0 else gold
        if calib is not None:
            corners = project_boxes_3d_np(
                objects["locations"][f], objects["dimensions"][f],
                objects["rotation_y"][f], calib,
            )
        else:
            corners = np.full((n, 8, 2), -1e4, np.float32)
        valid = np.arange(n) < objects["num_objects"][f]
        tcol = np.tile(color[None], (n, 1)).astype(np.float32)
        kcol = np.asarray(track_color(np.asarray(objects["track_id"][f])), np.float32)
        frame = rasterize_frame(
            jnp.asarray(corners), jnp.asarray(objects["bbox"][f], jnp.float32),
            jnp.asarray(valid), jnp.asarray(tcol), jnp.asarray(kcol),
            background=white, height=orig_h, width=orig_w,
            plot_2d_bbox=plot_2d_bbox,
        )
        frames.append(np.asarray(frame))
    return frames
