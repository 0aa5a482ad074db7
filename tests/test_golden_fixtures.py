"""Golden activation fixtures for the three converter paths (VERDICT r3
next #7): LPIPS and CLIP goldens were computed by the TORCH reference
implementations over deterministic synthetic weights (see
fixtures/make_goldens.py); the I3D golden freezes the converted-flax
forward. These tests run torch-FREE (except the CLIP one, whose vendored
state dict came from torch init but is replayed from the npz), so a
regression in any converter or model forward is caught without real
weights or a torch install."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent / "fixtures"))

from make_goldens import (  # noqa: E402
    i3d_golden_input,
    i3d_synthetic_sd,
    lpips_golden_inputs,
    lpips_synthetic_sd,
)

FIX = Path(__file__).parent / "fixtures"


def test_lpips_golden():
    """flax LPIPS + converter reproduce the torch-transliteration golden."""
    from ctrlv_tpu.metrics.lpips import lpips_distance, lpips_torch_to_flax

    golden = np.load(FIX / "golden_lpips.npz")
    params = lpips_torch_to_flax(lpips_synthetic_sd())
    x0, x1 = lpips_golden_inputs()  # NCHW, as the torch reference consumed
    ours = np.asarray(
        lpips_distance(
            params,
            jnp.asarray(x0.transpose(0, 2, 3, 1)),
            jnp.asarray(x1.transpose(0, 2, 3, 1)),
        )
    )
    np.testing.assert_allclose(ours, golden["expected"], rtol=2e-4, atol=2e-5)


def test_clip_golden():
    """flax CLIP + converter reproduce transformers' image_embeds golden."""
    from ctrlv_tpu.models import CLIPVisionConfig, CLIPVisionModelWithProjection
    from ctrlv_tpu.train import torch_state_dict_to_flax

    golden = np.load(FIX / "golden_clip.npz")
    sd = {
        k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")
    }
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModelWithProjection(config=cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size, 3))
    template = jax.jit(lambda k: model.init(k, x))(jax.random.PRNGKey(0))
    params = {"params": torch_state_dict_to_flax(sd, expected=template["params"])}
    img = golden["img"]
    ours = np.asarray(
        jax.jit(model.apply)(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(ours, golden["expected"], atol=2e-4, rtol=2e-3)


def test_unet_downblock_golden():
    """Full-channel-size (320->640, 10 heads) CrossAttnDownBlockSpatioTemporal:
    a real tensor flows through the converter's full-size name-mapping and
    the flax block forward, checked against an independent torch
    transliteration's frozen output (VERDICT r4 #8 — the last converter
    blind spot attemptable without real SVD-XT weights). Weights regenerate
    deterministically from the manifest + seed (make_unet_goldens.py)."""
    from make_unet_goldens import (
        synthetic_sd,
        unet_downblock1_manifest,
        unet_golden_inputs,
    )

    from ctrlv_tpu.models.blocks_st import CrossAttnDownBlockSpatioTemporal
    from ctrlv_tpu.train import torch_state_dict_to_flax

    golden = np.load(FIX / "golden_unet_downblock.npz")
    sd = synthetic_sd(unet_downblock1_manifest(), seed=7)
    x, temb, enc = unet_golden_inputs()
    indicator = jnp.zeros((1, 3))

    block = CrossAttnDownBlockSpatioTemporal(
        in_channels=320, out_channels=640, num_layers=2,
        num_attention_heads=10, cross_attention_dim=1024, add_downsample=True,
    )
    template = jax.eval_shape(
        lambda k: block.init(k, jnp.asarray(x), jnp.asarray(temb), jnp.asarray(enc), indicator),
        jax.random.PRNGKey(0),
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), template)
    params = {"params": torch_state_dict_to_flax(sd, expected=template["params"])}
    out, skips = jax.jit(block.apply)(
        params, jnp.asarray(x), jnp.asarray(temb), jnp.asarray(enc), indicator
    )
    np.testing.assert_allclose(
        np.asarray(out), golden["expected"], atol=5e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(skips[0]), golden["expected_skip0"], atol=5e-4, rtol=2e-3
    )


def test_vae_upblock_golden():
    """Full-channel-size (512->256) VAE TemporalDecoder up-block golden:
    learned-merge ST resblocks + upsampler through the converter
    name-mapping vs the torch transliteration's frozen output."""
    from make_unet_goldens import (
        synthetic_sd,
        vae_golden_inputs,
        vae_upblock2_manifest,
    )

    from ctrlv_tpu.models.vae import UpBlockTemporalDecoder
    from ctrlv_tpu.train import torch_state_dict_to_flax

    golden = np.load(FIX / "golden_vae_upblock.npz")
    sd = synthetic_sd(vae_upblock2_manifest(), seed=11)
    (x,) = vae_golden_inputs()
    indicator = jnp.zeros((1, 3))

    block = UpBlockTemporalDecoder(
        in_channels=512, out_channels=256, num_layers=3, add_upsample=True
    )
    template = jax.eval_shape(
        lambda k: block.init(k, jnp.asarray(x), indicator), jax.random.PRNGKey(0)
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), template)
    params = {"params": torch_state_dict_to_flax(sd, expected=template["params"])}
    out = jax.jit(block.apply)(params, jnp.asarray(x), indicator)
    np.testing.assert_allclose(
        np.asarray(out), golden["expected"], atol=5e-4, rtol=2e-3
    )


def test_i3d_golden():
    """I3D converter + flax forward reproduce the frozen feature golden."""
    from ctrlv_tpu.metrics.fvd import InceptionI3d, i3d_torch_to_flax

    golden = np.load(FIX / "golden_i3d.npz")
    model = InceptionI3d()
    x = i3d_golden_input()
    shapes = jax.eval_shape(lambda k: model.init(k, x), jax.random.PRNGKey(0))
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    params = i3d_torch_to_flax(i3d_synthetic_sd(), expected=template)
    feats = np.asarray(jax.jit(model.apply)(params, x))
    np.testing.assert_allclose(feats, golden["expected"], atol=1e-4, rtol=1e-3)
