"""Native LPIPS tests: strict converter coverage + numerical parity vs a
torch transliteration of the `lpips` package forward (the package itself is
not installed; the transliteration below is the reference math from
lpips/lpips.py + lpips/pretrained_networks.py — ScalingLayer, AlexNet
relu1..relu5 slices, channel-L2 normalize, 1x1 lin convs, spatial mean)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ctrlv_tpu.metrics.lpips import (
    _ALEX_CONVS,
    lpips_distance,
    lpips_init_params,
    lpips_torch_to_flax,
)


def _synthetic_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {
        "scaling_layer.shift": torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1),
        "scaling_layer.scale": torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1),
    }
    slice_ids = ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10))
    in_ch = 3
    for (s, i), (out_ch, k, _, _) in zip(slice_ids, _ALEX_CONVS):
        sd[f"net.slice{s}.{i}.weight"] = torch.randn(out_ch, in_ch, k, k, generator=g) * 0.05
        sd[f"net.slice{s}.{i}.bias"] = torch.randn(out_ch, generator=g) * 0.05
        in_ch = out_ch
    for k, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{k}.model.1.weight"] = torch.rand(1, c, 1, 1, generator=g) * 0.1
    return sd


def _torch_lpips(sd, x0, x1):
    """Transliteration of lpips.LPIPS(net='alex').forward (normalize=False)."""
    shift, scale = sd["scaling_layer.shift"], sd["scaling_layer.scale"]

    def feats(x):
        x = (x - shift) / scale
        out = []
        convs = [
            (sd["net.slice1.0.weight"], sd["net.slice1.0.bias"], 4, 2),
            (sd["net.slice2.3.weight"], sd["net.slice2.3.bias"], 1, 2),
            (sd["net.slice3.6.weight"], sd["net.slice3.6.bias"], 1, 1),
            (sd["net.slice4.8.weight"], sd["net.slice4.8.bias"], 1, 1),
            (sd["net.slice5.10.weight"], sd["net.slice5.10.bias"], 1, 1),
        ]
        for i, (w, b, stride, pad) in enumerate(convs):
            if i in (1, 2):
                x = F.max_pool2d(x, 3, 2)
            x = F.relu(F.conv2d(x, w, b, stride=stride, padding=pad))
            out.append(x)
        return out

    f0, f1 = feats(x0), feats(x1)
    val = 0.0
    for k in range(5):
        n0 = f0[k] / (f0[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        n1 = f1[k] / (f1[k].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (n0 - n1) ** 2
        val = val + F.conv2d(d, sd[f"lin{k}.model.1.weight"]).mean([2, 3])
    return val[:, 0]


def test_lpips_matches_torch_transliteration():
    sd = _synthetic_state_dict()
    params = lpips_torch_to_flax({k: v.numpy() for k, v in sd.items()})
    rng = np.random.default_rng(0)
    a = rng.standard_normal((2, 64, 96, 3)).astype(np.float32).clip(-1, 1)
    b = rng.standard_normal((2, 64, 96, 3)).astype(np.float32).clip(-1, 1)
    ours = np.asarray(lpips_distance(params, jnp.asarray(a), jnp.asarray(b)))
    with torch.no_grad():
        theirs = _torch_lpips(
            sd,
            torch.from_numpy(a.transpose(0, 3, 1, 2)),
            torch.from_numpy(b.transpose(0, 3, 1, 2)),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)


def test_lpips_identity_is_zero():
    params = lpips_init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (1, 64, 64, 3)), jnp.float32)
    d = np.asarray(lpips_distance(params, x, x))
    np.testing.assert_allclose(d, 0.0, atol=1e-7)


def test_lpips_converter_is_strict():
    sd = {k: v.numpy() for k, v in _synthetic_state_dict().items()}
    # missing key
    broken = dict(sd)
    del broken["lin3.model.1.weight"]
    with pytest.raises(ValueError, match="missing"):
        lpips_torch_to_flax(broken)
    # extra key
    broken = dict(sd)
    broken["net.slice1.0.weight_extra"] = sd["net.slice1.0.weight"]
    with pytest.raises(ValueError, match="extra"):
        lpips_torch_to_flax(broken)
    # shape drift
    broken = dict(sd)
    broken["lin0.model.1.weight"] = np.zeros((1, 65, 1, 1), np.float32)
    with pytest.raises(ValueError, match="shape drift"):
        lpips_torch_to_flax(broken)


def test_lpips_manifest_covers_all_params():
    """Every converted leaf lands in the flax tree the model actually uses
    (name+shape coverage, the I3D manifest recipe)."""
    sd = _synthetic_state_dict()
    converted = lpips_torch_to_flax({k: v.numpy() for k, v in sd.items()})
    expected = lpips_init_params(jax.random.PRNGKey(0))
    conv_flat = jax.tree_util.tree_leaves_with_path(converted)
    exp_flat = jax.tree_util.tree_leaves_with_path(expected)
    conv_map = {jax.tree_util.keystr(p): v.shape for p, v in conv_flat}
    exp_map = {jax.tree_util.keystr(p): v.shape for p, v in exp_flat}
    assert conv_map == exp_map


def test_offline_eval_reports_lpips_with_params(tmp_path):
    """evaluate_media_dir computes native LPIPS when params are provided."""
    from ctrlv_tpu.metrics.offline_eval import evaluate_media_dir
    from ctrlv_tpu.utils.video_io import export_to_video

    rng = np.random.default_rng(0)
    for i in range(2):
        gen = (rng.random((4, 32, 40, 3)) * 255).astype(np.uint8)
        gt = (rng.random((4, 32, 40, 3)) * 255).astype(np.uint8)
        export_to_video(gen, str(tmp_path / f"generated_videos_{i}.gif"), fps=5)
        export_to_video(gt, str(tmp_path / f"gt_videos_{i}.gif"), fps=5)
    params = lpips_init_params(jax.random.PRNGKey(0))
    out = evaluate_media_dir(
        str(tmp_path), samples=2, num_frames=2, downsample=False,
        size=(40, 32), lpips_params=params,
    )
    assert "lpips" in out and np.isfinite(out["lpips"])
    assert np.isfinite(out["fvd"]) and 0 <= out["ssim"] <= 1
