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


def test_pil_luma_bit_exact():
    """pil_luma_uint8 == PIL Image.convert('L') on random uint8 images."""
    from PIL import Image

    from ctrlv_tpu.metrics import pil_luma_uint8

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    ours = pil_luma_uint8(rgb)
    theirs = np.asarray(Image.fromarray(rgb).convert("L"))
    np.testing.assert_array_equal(ours, theirs)


def test_stage1_f_measure_matches_reference_transliteration():
    """stage1_frame_f_measure == the reference protocol transliterated with
    torch.where + to_pil_image semantics + PIL grayscale + DAVIS f_measure
    on the nonzero support (/root/reference/tools/
    eval_video_bbox_prediction.py:85-96). No invented thresholds."""
    import torch
    from PIL import Image

    from ctrlv_tpu.metrics import f_measure, stage1_frame_f_measure

    rng = np.random.default_rng(1)
    # sparse boxes on black background, some dark-noise pixels under 5/255
    gen = np.zeros((64, 96, 3), np.float32)
    gen[10:30, 20:50] = rng.random((20, 30, 3)) * 0.9 + 0.1
    gen += (rng.random(gen.shape) < 0.1) * rng.random(gen.shape) * (4.9 / 255.0)
    gen = np.clip(gen, 0.0, 1.0)
    gt = np.zeros((64, 96, 3), np.uint8)
    gt[12:34, 24:52] = rng.integers(30, 255, (22, 28, 3), dtype=np.uint8)

    # --- reference transliteration ---
    frames_cp = torch.where(torch.from_numpy(gen) < float(5 / 255), 0.0,
                            torch.from_numpy(gen))
    # to_pil_image(CHW float) == mul(255).byte() then PIL RGB
    u8 = (frames_cp * 255).byte().numpy()
    frame_l = np.asarray(Image.fromarray(u8).convert("L"))
    gt_l = np.asarray(Image.fromarray(gt).convert("L"))
    expected = f_measure(frame_l, gt_l)

    got = stage1_frame_f_measure(gen, gt)
    assert got == expected


def test_offline_eval_cli_smoke(tmp_path):
    """python -m ctrlv_tpu.metrics.offline_eval <dir> (reference fvd.py
    __main__ parity surface) runs end-to-end and prints a JSON result."""
    import json
    import os
    import subprocess
    import sys

    from ctrlv_tpu.utils.video_io import export_to_video

    rng = np.random.default_rng(0)
    for i in range(2):
        for kind in ("generated_videos", "gt_videos"):
            v = (rng.random((6, 32, 32, 3)) * 255).astype(np.uint8)
            export_to_video(v, str(tmp_path / f"{kind}_{i}.gif"))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-m", "ctrlv_tpu.metrics.offline_eval", str(tmp_path),
         "--samples", "2", "--num_frames", "3", "--width", "32", "--height", "32"],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.splitlines()[1])
    assert payload["num_pairs"] == 2
    assert {"fvd", "ssim", "psnr"} <= set(payload)
