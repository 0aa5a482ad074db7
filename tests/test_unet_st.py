"""Shape/semantic tests for the spatio-temporal UNet (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.models.unet_st import UNetSTConfig
from helpers import build_tiny_models

CFG = UNetSTConfig.tiny(num_frames=3)

# 16x16 latents: matches the shared helpers.build_tiny_models init shapes so
# the module-init compile dedupes across test files via the persistent cache.
B, F, H, W = 1, 3, 16, 16


@pytest.fixture(scope="module")
def unet_and_params():
    models = build_tiny_models(num_frames=F, image_hw=(32, 32), components=("unet",))
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (B, F, H, W, CFG.in_channels), jnp.float32)
    enc = jax.random.normal(rng, (B, 1, CFG.cross_attention_dim), jnp.float32)
    tids = jnp.asarray([[6.0, 127.0, 0.02]])
    apply = jax.jit(models["unet"].apply)
    return apply, models["unet_params"], (sample, enc, tids)


def test_forward_shape(unet_and_params):
    apply, params, (sample, enc, tids) = unet_and_params
    out = apply(params, sample, jnp.asarray(0.5), enc, tids)
    assert out.shape == (B, F, H, W, CFG.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_timestep_sensitivity(unet_and_params):
    apply, params, (sample, enc, tids) = unet_and_params
    out1 = apply(params, sample, jnp.asarray(0.5), enc, tids)
    out2 = apply(params, sample, jnp.asarray(-1.0), enc, tids)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_controlnet_residual_injection(unet_and_params):
    """Zero residuals must be a no-op; nonzero mid residual must change output."""
    apply, params, (sample, enc, tids) = unet_and_params
    base = apply(params, sample, jnp.asarray(0.5), enc, tids)

    B, F, H, W = sample.shape[:4]
    shapes = [(B * F, H, W, CFG.block_out_channels[0])]
    h, w = H, W
    for i, _ in enumerate(CFG.down_block_types):
        ch = CFG.block_out_channels[i]
        shapes += [(B * F, h, w, ch)] * CFG.layers_per_block
        if i != len(CFG.block_out_channels) - 1:
            h, w = h // 2, w // 2
            shapes += [(B * F, h, w, ch)]
    down_res = tuple(jnp.zeros(s, jnp.float32) for s in shapes)
    mid_res = jnp.zeros((B * F, h, w, CFG.block_out_channels[-1]), jnp.float32)

    out_zero = apply(
        params, sample, jnp.asarray(0.5), enc, tids,
        down_block_additional_residuals=down_res,
        mid_block_additional_residuals=mid_res,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_zero), atol=1e-5)

    out_mid = apply(
        params, sample, jnp.asarray(0.5), enc, tids,
        down_block_additional_residuals=down_res,
        mid_block_additional_residuals=mid_res + 1.0,
    )
    assert not np.allclose(np.asarray(base), np.asarray(out_mid))


def test_temporal_mixing_couples_frames(unet_and_params):
    """Perturbing frame 0 must change outputs of other frames (temporal paths)."""
    apply, params, (sample, enc, tids) = unet_and_params
    out1 = apply(params, sample, jnp.asarray(0.5), enc, tids)
    sample2 = sample.at[:, 0].add(1.0)
    out2 = apply(params, sample2, jnp.asarray(0.5), enc, tids)
    # frame 2 output must differ even though only frame 0 input changed
    assert not np.allclose(np.asarray(out1[:, 2]), np.asarray(out2[:, 2]))
