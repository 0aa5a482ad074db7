"""Generate golden activation fixtures for the three converter paths
(VERDICT r3 next #7): LPIPS and CLIP goldens are computed by the TORCH
reference implementations (the lpips-package transliteration in
tests/test_lpips.py and transformers' CLIPVisionModelWithProjection) over
deterministic synthetic weights; the I3D golden freezes the current
converted-flax forward (no torch I3D exists in-tree — the golden guards
the converter + model against regressions until real Kinetics weights are
obtainable, /root/reference/src/ctrlv/metrics/fvd.py:116).

Synthetic weights for LPIPS/I3D are NOT stored: they regenerate
deterministically from numpy seeds + the in-tree manifests (52 MB of
random weights stay out of git); the tiny CLIP state dict (184 KB) is
vendored verbatim because it comes from torch's own module init.

Run from the repo root to (re)generate:
    JAX_PLATFORMS=cpu python tests/fixtures/make_goldens.py

tests/test_golden_fixtures.py consumes the .npz files; LPIPS/I3D checks
run WITHOUT torch, so converter/model regressions are caught even where
torch is absent.
"""

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

OUT = Path(__file__).resolve().parent


def lpips_synthetic_sd(seed=0):
    """Deterministic numpy-generated LPIPS state dict (torch-free)."""
    from ctrlv_tpu.metrics.lpips import _ALEX_CONVS

    rng = np.random.default_rng(seed)
    sd = {
        "scaling_layer.shift": np.asarray(
            [-0.030, -0.088, -0.188], np.float32
        ).reshape(1, 3, 1, 1),
        "scaling_layer.scale": np.asarray(
            [0.458, 0.448, 0.450], np.float32
        ).reshape(1, 3, 1, 1),
    }
    slice_ids = ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10))
    in_ch = 3
    for (s, i), (out_ch, k, _, _) in zip(slice_ids, _ALEX_CONVS):
        sd[f"net.slice{s}.{i}.weight"] = (
            rng.standard_normal((out_ch, in_ch, k, k)).astype(np.float32) * 0.05
        )
        sd[f"net.slice{s}.{i}.bias"] = (
            rng.standard_normal((out_ch,)).astype(np.float32) * 0.05
        )
        in_ch = out_ch
    for k, c in enumerate((64, 192, 384, 256, 256)):
        sd[f"lin{k}.model.1.weight"] = (
            rng.uniform(0, 0.1, (1, c, 1, 1)).astype(np.float32)
        )
    return sd


def lpips_golden_inputs(seed=42):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-1, 1, (2, 3, 37, 53)).astype(np.float32)
    x1 = rng.uniform(-1, 1, (2, 3, 37, 53)).astype(np.float32)
    return x0, x1


def i3d_synthetic_sd(seed=0):
    """Deterministic numpy-generated I3D state dict (torch-free)."""
    from svd_manifests import i3d_manifest

    rng = np.random.default_rng(seed)
    return {
        k: (
            np.abs(rng.standard_normal(s).astype(np.float32)) + 1.0
            if k.endswith("running_var")
            else rng.standard_normal(s).astype(np.float32) * 0.05
        )
        for k, s in i3d_manifest().items()
    }


def i3d_golden_input(seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (1, 16, 64, 64, 3)).astype(np.float32)


def make_lpips():
    import torch

    from test_lpips import _torch_lpips

    sd = {k: torch.from_numpy(v) for k, v in lpips_synthetic_sd().items()}
    x0, x1 = lpips_golden_inputs()
    with torch.no_grad():
        ref = _torch_lpips(sd, torch.from_numpy(x0), torch.from_numpy(x1)).numpy()
    np.savez(OUT / "golden_lpips.npz", expected=ref)
    print("lpips golden:", ref)


def make_clip():
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection as HFModel

    cfg = HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=48, hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = HFModel(cfg).eval()
    rng = np.random.default_rng(7)
    img = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.from_numpy(img)).image_embeds.numpy()
    np.savez(
        OUT / "golden_clip.npz",
        img=img, expected=ref,
        **{f"sd::{k}": v.detach().numpy() for k, v in model.state_dict().items()},
    )
    print("clip golden:", ref[:, :4])


def make_i3d():
    import jax

    from ctrlv_tpu.metrics.fvd import InceptionI3d, i3d_torch_to_flax

    sd = i3d_synthetic_sd()
    model = InceptionI3d()
    x = i3d_golden_input()
    shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    params = i3d_torch_to_flax(sd, expected=template)
    feats = np.asarray(jax.jit(model.apply)(params, x))
    np.savez(OUT / "golden_i3d.npz", expected=feats)
    print("i3d golden:", feats.shape, feats.ravel()[:4])


if __name__ == "__main__":
    make_lpips()
    make_clip()
    make_i3d()
