"""Bit-parity of the overall-eval darkness cleanup + candidate scoring.

Transliterates the reference's numpy post-processing
(/root/reference/tools/eval_overall.py:96-114: float*255 channel-sum
thresholded against 50, interior-frame kill, THEN .astype(uint8) before
binary_mask_iou) and asserts our device-side `darkness_cleanup` +
floor-quantized `binary_mask_iou_batch` reproduce it exactly.
"""

import numpy as np
import jax.numpy as jnp

from ctrlv_tpu.metrics.iou import binary_mask_iou, binary_mask_iou_batch
from ctrlv_tpu.pipelines.overall import darkness_cleanup


def reference_cleanup(frames01: np.ndarray) -> np.ndarray:
    """Verbatim-in-spirit reference semantics on (F,H,W,3) [0,1] frames.

    Returns cleaned uint8 frames in NCHW like the reference holds them.
    """
    bbox_frames = frames01.transpose(0, 3, 1, 2).astype(np.float32) * 255
    tmp = bbox_frames.sum(axis=1) < 50
    bbox_frames[np.repeat(tmp[:, None, ::], 3, axis=1)] = 0
    for frame_i in range(1, bbox_frames.shape[0] - 1):
        if bbox_frames[frame_i].sum(axis=0).min() > 50:
            bbox_frames[frame_i] = np.zeros_like(bbox_frames[frame_i])
    return bbox_frames.astype(np.uint8)


def _adversarial_clip(rng, F=5, H=8, W=8):
    frames = rng.uniform(0.0, 1.0, size=(F, H, W, 3)).astype(np.float32)
    # dark pixels straddling the threshold: channel-sums of 49/255, 50/255, 51/255
    for j, s in enumerate((49.0, 50.0, 51.0)):
        frames[0, 0, j] = np.float32(s / 255.0 / 3.0)
    # a mostly-dark frame (most pixels zeroed, survives the interior kill)
    frames[2] = rng.uniform(0.0, 0.05, size=(H, W, 3)).astype(np.float32)
    frames[2, 0, 0] = 0.9  # a bright box pixel that must survive cleanup
    # an all-bright interior frame (triggers the frame kill)
    frames[3] = rng.uniform(0.5, 1.0, size=(H, W, 3)).astype(np.float32)
    return frames


def test_darkness_cleanup_bit_parity():
    rng = np.random.default_rng(0)
    frames = _adversarial_clip(rng)
    ref_u8 = reference_cleanup(frames)  # (F,C,H,W) uint8

    ours = darkness_cleanup(jnp.asarray(frames)[None])[0]
    ours_u8 = np.floor(np.asarray(ours) * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(ours_u8.transpose(0, 3, 1, 2), ref_u8)
    # frame 3 (bright interior) must have been killed, frame 2 must survive
    assert ref_u8[3].sum() == 0 and ref_u8[2].sum() > 0


def test_candidate_scores_match_reference_pipeline():
    rng = np.random.default_rng(1)
    gt = (rng.uniform(0, 1, size=(5, 8, 8, 3)) > 0.7).astype(np.uint8) * 255
    cands = np.stack([_adversarial_clip(np.random.default_rng(s)) for s in range(5)])

    # reference path: cleanup -> uint8 -> binary_mask_iou (NCHW, axis=1)
    ref_scores = []
    for c in cands:
        c_u8 = reference_cleanup(c)
        ref_scores.append(binary_mask_iou(gt.transpose(0, 3, 1, 2), c_u8, channel_axis=1))
    ref_scores = np.asarray(ref_scores)

    # our device path: darkness_cleanup -> floor*255 -> batch IoU
    cleaned = darkness_cleanup(jnp.asarray(cands))
    cand_u8 = jnp.floor(cleaned * 255.0)
    ours = np.asarray(binary_mask_iou_batch(jnp.asarray(gt, jnp.float32), cand_u8))
    np.testing.assert_allclose(ours, ref_scores, rtol=0, atol=1e-6)

    # reference tie-break: later equal score wins (max + == update)
    best_ref = 0
    best_score = -1.0
    for i, (iou, _, _) in enumerate(ref_scores):
        best_score = max(best_score, iou)
        if best_score == iou:
            best_ref = i
    best_ours = len(cands) - 1 - int(jnp.argmax(jnp.asarray(ours)[::-1, 0]))
    assert best_ours == best_ref
