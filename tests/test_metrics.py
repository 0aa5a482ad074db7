"""Metric parity tests: mask-IoU conventions, J&F, SSIM/PSNR sanity."""

import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.metrics import (
    binary_mask_iou,
    binary_mask_iou_batch,
    db_eval_boundary,
    db_eval_iou,
    f_measure,
    psnr,
    ssim,
)


def test_mask_iou_identity():
    clip = np.zeros((2, 8, 8, 3), np.uint8)
    clip[:, 2:5, 2:5, :] = 255
    iou, p, r = binary_mask_iou(clip, clip)
    assert iou == 1.0 and p == 1.0 and r == 1.0


def test_mask_iou_half_overlap():
    gt = np.zeros((1, 4, 4, 3), np.uint8)
    pred = np.zeros((1, 4, 4, 3), np.uint8)
    gt[0, :2, :, 0] = 1  # 8 px
    pred[0, 1:3, :, 0] = 1  # 8 px, 4 overlapping
    iou, p, r = binary_mask_iou(gt, pred)
    assert np.isclose(iou, 4 / 12)
    assert np.isclose(p, 0.5) and np.isclose(r, 0.5)


def test_mask_iou_empty_conventions():
    empty = np.zeros((1, 4, 4, 3))
    iou, p, r = binary_mask_iou(empty, empty)
    assert iou == 1.0 and p == 1.0 and r == 1.0


def test_mask_iou_batch_matches_scalar():
    rng = np.random.default_rng(0)
    gt = (rng.random((2, 8, 8, 3)) > 0.7).astype(np.float32)
    preds = (rng.random((3, 2, 8, 8, 3)) > 0.7).astype(np.float32)
    batch = np.asarray(binary_mask_iou_batch(jnp.asarray(gt), jnp.asarray(preds)))
    for i in range(3):
        iou, p, r = binary_mask_iou(gt, preds[i])
        np.testing.assert_allclose(batch[i], [iou, p, r], atol=1e-6)


def test_db_eval_iou():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    a[:4] = True
    b[2:6] = True
    assert np.isclose(db_eval_iou(a, b), 16 / 48)
    assert db_eval_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_f_measure_identical_masks():
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    assert f_measure(m, m) == 1.0


def test_f_measure_disjoint():
    a = np.zeros((64, 64), bool)
    b = np.zeros((64, 64), bool)
    a[2:6, 2:6] = True
    b[50:60, 50:60] = True
    assert f_measure(a, b) == 0.0


def test_db_eval_boundary_stack():
    m = np.zeros((3, 16, 16), bool)
    m[:, 4:10, 4:10] = True
    out = db_eval_boundary(m, m)
    assert out.shape == (3,)
    assert np.allclose(out, 1.0)


def test_psnr_ssim():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((32, 32, 3)).astype(np.float32))
    assert float(ssim(a, a)) > 0.999
    assert float(psnr(a, a)) > 80
    noisy = a + 0.1 * jnp.asarray(rng.standard_normal((32, 32, 3)).astype(np.float32))
    assert float(ssim(a, noisy)) < 0.95
    assert 15 < float(psnr(a, jnp.clip(noisy, 0, 1))) < 30
