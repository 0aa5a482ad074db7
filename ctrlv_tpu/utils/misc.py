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
