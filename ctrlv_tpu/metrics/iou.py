"""Binary mask IoU / precision / recall — the stage-1 selection metric.

Behavioral parity: /root/reference/src/ctrlv/metrics/FandJ.py:11-23 —
masks are "any channel nonzero" (channel-sum -> bool) over whole clips;
IoU/precision/recall with union==0 => 1 conventions.

Implemented in jnp so the 5-candidate selection loop of the overall
pipeline (/root/reference/tools/eval_overall.py:106-114) can run entirely
on device (and vmap over candidates/chips).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def binary_mask_iou(
    image_gt, image_pred, channel_axis: int = -1
) -> Tuple[float, float, float]:
    """(iou, precision, recall) over channel-summed binary masks.

    Accepts any layout; channel_axis selects the channel dim (reference used
    NCHW axis=1; our native layout is channels-last axis=-1).
    """
    gt = np.asarray(image_gt).sum(axis=channel_axis).astype(bool)
    pred = np.asarray(image_pred).sum(axis=channel_axis).astype(bool)
    gt_area = gt.sum()
    pred_area = pred.sum()
    inter = np.logical_and(gt, pred).sum()
    union = gt_area + pred_area - inter
    iou = inter / union if union > 0 else 1.0
    recall = inter / gt_area if gt_area > 0 else 1.0
    precision = inter / pred_area if pred_area > 0 else 1.0
    return float(iou), float(precision), float(recall)


def binary_mask_iou_batch(gt: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Device-side (iou, precision, recall) for stacked candidates.

    gt:   (F, H, W, C) ground-truth clip
    pred: (N, F, H, W, C) candidate clips
    Returns (N, 3) jnp array.
    """
    gt_mask = (jnp.sum(gt, axis=-1) > 0).astype(jnp.float32)  # (F,H,W)
    pred_mask = (jnp.sum(pred, axis=-1) > 0).astype(jnp.float32)  # (N,F,H,W)
    axes = tuple(range(1, pred_mask.ndim))
    inter = jnp.sum(gt_mask[None] * pred_mask, axis=axes)
    gt_area = jnp.full_like(inter, jnp.sum(gt_mask))
    pred_area = jnp.sum(pred_mask, axis=axes)
    union = gt_area + pred_area - inter
    iou = jnp.where(union > 0, inter / union, 1.0)
    precision = jnp.where(pred_area > 0, inter / pred_area, 1.0)
    recall = jnp.where(gt_area > 0, inter / gt_area, 1.0)
    return jnp.stack([iou, precision, recall], axis=-1)
