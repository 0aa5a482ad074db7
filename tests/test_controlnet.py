"""Tests: ControlNet zero-init no-op property, from_unet weight transfer,
end-to-end UNet+ControlNet injection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.models import UNetSTConfig, controlnet_params_from_unet
from helpers import build_tiny_models

CFG = UNetSTConfig.tiny(num_frames=3)


@pytest.fixture(scope="module")
def setup():
    # shared tiny builder: the unet/ctrl init compiles dedupe with the rest
    # of the suite via the persistent compile cache (identical programs)
    models = build_tiny_models(
        num_frames=3, image_hw=(32, 32), components=("unet", "ctrl")
    )
    rng = jax.random.PRNGKey(0)
    B, F, H, W = 1, 3, 16, 16
    sample = jax.random.normal(rng, (B, F, H, W, CFG.in_channels))
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, F, H, W, CFG.in_channels // 2))
    enc = jax.random.normal(rng, (B, 1, CFG.cross_attention_dim))
    tids = jnp.asarray([[6.0, 127.0, 0.02]])
    return (
        jax.jit(models["unet"].apply),
        jax.jit(models["ctrl"].apply),
        models["unet_params"],
        models["ctrl_params"],
        (sample, cond, enc, tids),
    )


def test_zero_init_residuals(setup):
    """At init every controlnet projection is zero -> all residuals zero."""
    _, ctrl_apply, _, ctrl_params, (sample, cond, enc, tids) = setup
    down_res, mid_res = ctrl_apply(ctrl_params, sample, jnp.asarray(0.5), enc, tids, cond)
    for r in down_res:
        assert np.allclose(np.asarray(r), 0.0)
    assert np.allclose(np.asarray(mid_res), 0.0)


def test_residual_count_matches_unet_skips(setup):
    """#down residuals == conv_in + layers_per_block per block + downsamplers."""
    _, ctrl_apply, _, ctrl_params, (sample, cond, enc, tids) = setup
    down_res, _ = ctrl_apply(ctrl_params, sample, jnp.asarray(0.5), enc, tids, cond)
    expected = 1 + len(CFG.down_block_types) * CFG.layers_per_block + (
        len(CFG.down_block_types) - 1
    )
    assert len(down_res) == expected


def test_from_unet_copies_shared_weights(setup):
    _, _, unet_params, ctrl_params, _ = setup
    merged = controlnet_params_from_unet(unet_params["params"], ctrl_params["params"])
    np.testing.assert_array_equal(
        np.asarray(merged["conv_in"]["kernel"]),
        np.asarray(unet_params["params"]["conv_in"]["kernel"]),
    )
    # control_conv_in is ControlNet-only: untouched
    np.testing.assert_array_equal(
        np.asarray(merged["control_conv_in"]["kernel"]),
        np.asarray(ctrl_params["params"]["control_conv_in"]["kernel"]),
    )


@pytest.mark.heavy
def test_unet_with_controlnet_injection(setup):
    """Full two-model forward: zero-init ControlNet must not change the UNet
    output; a scaled ControlNet with perturbed zero-convs must."""
    unet_apply, ctrl_apply, unet_params, ctrl_params, (sample, cond, enc, tids) = setup
    t = jnp.asarray(0.5)
    base = unet_apply(unet_params, sample, t, enc, tids)
    down_res, mid_res = ctrl_apply(ctrl_params, sample, t, enc, tids, cond)
    out = unet_apply(
        unet_params, sample, t, enc, tids,
        down_block_additional_residuals=down_res,
        mid_block_additional_residuals=mid_res,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-5)

    import flax

    flat = flax.traverse_util.flatten_dict(ctrl_params["params"])
    for key in flat:
        if "controlnet_mid_block" in key and key[-1] == "kernel":
            flat[key] = jnp.ones_like(flat[key]) * 0.1
    perturbed = {"params": flax.traverse_util.unflatten_dict(flat)}
    down_res2, mid_res2 = ctrl_apply(perturbed, sample, t, enc, tids, cond)
    out2 = unet_apply(
        unet_params, sample, t, enc, tids,
        down_block_additional_residuals=down_res2,
        mid_block_additional_residuals=mid_res2,
    )
    assert not np.allclose(np.asarray(base), np.asarray(out2))
