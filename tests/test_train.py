"""Training-path tests: EDM loss math, one optimizer step per regime,
temporal-only masking, LoRA, EMA."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.train import (
    EMAState,
    apply_lora,
    edm_denoising_loss,
    ema_init,
    ema_update,
    lora_init,
    make_controlnet_train_step,
    make_optimizer,
    make_svd_train_step,
    make_vae_decoder_train_step,
    trainable_mask,
)
from ctrlv_tpu.train.state import (
    init_train_state,
    temporal_blocks_predicate,
    vae_decoder_predicate,
)
from helpers import build_tiny_models

pytestmark = pytest.mark.mesh

F, H, W = 3, 32, 32


@pytest.fixture(scope="module")
def models():
    return build_tiny_models(
        num_frames=F, image_hw=(H, W), components=("unet", "vae", "clip", "ctrl")
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.uniform(-1, 1, (2, F, H, W, 3)).astype(np.float32))
    bbox = jnp.asarray(rng.uniform(-1, 1, (2, F, H, W, 3)).astype(np.float32))
    return clips, bbox


def test_edm_loss_perfect_prediction_zero():
    """If model output equals the ideal v, loss is ~0."""
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(2, 3, 4, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    sigma = jnp.asarray([0.5, 2.0])
    s5 = sigma[:, None, None, None, None]
    noisy = x0 + noise * s5
    c_skip = 1 / (s5**2 + 1)
    c_out = -s5 / jnp.sqrt(s5**2 + 1)
    v_ideal = (x0 - c_skip * noisy) / c_out
    loss = edm_denoising_loss(v_ideal, noisy, x0, sigma)
    assert float(loss) < 1e-8


def test_svd_train_step_full(models, batch):
    clips, bbox = batch
    tx = make_optimizer(learning_rate=1e-4)
    state = init_train_state(models["unet_params"], tx)
    step = jax.jit(
        make_svd_train_step(
            models["unet"], models["vae"], models["clip"], tx,
            num_cond_bbox_frames=1,
        )
    )
    new_state, metrics = step(
        state, models["vae_params"], models["clip_params"], clips, bbox,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    before = flax.traverse_util.flatten_dict(state.params)
    after = flax.traverse_util.flatten_dict(new_state.params)
    moved = sum(
        not np.allclose(np.asarray(before[k]), np.asarray(after[k])) for k in before
    )
    assert moved > len(before) * 0.5


def test_svd_train_step_predict_bbox(models, batch):
    clips, bbox = batch
    tx = make_optimizer(learning_rate=1e-4)
    state = init_train_state(models["unet_params"], tx)
    step = jax.jit(
        make_svd_train_step(
            models["unet"], models["vae"], models["clip"], tx,
            predict_bbox=True, num_cond_bbox_frames=1,
        )
    )
    _, metrics = step(
        state, models["vae_params"], models["clip_params"], clips, bbox,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["loss"]))


def test_temporal_only_mask(models, batch):
    """With the temporal-blocks mask only temporal params update."""
    clips, bbox = batch
    mask = trainable_mask(models["unet_params"], temporal_blocks_predicate)
    n_trainable = sum(flax.traverse_util.flatten_dict(mask).values())
    assert n_trainable > 0
    tx = make_optimizer(learning_rate=1e-3, mask=mask)
    state = init_train_state(models["unet_params"], tx)
    step = jax.jit(
        make_svd_train_step(models["unet"], models["vae"], models["clip"], tx)
    )
    new_state, _ = step(
        state, models["vae_params"], models["clip_params"], clips, bbox,
        jax.random.PRNGKey(0),
    )
    before = flax.traverse_util.flatten_dict(state.params)
    after = flax.traverse_util.flatten_dict(new_state.params)
    mask_flat = flax.traverse_util.flatten_dict(mask)
    for k in before:
        changed = not np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        if not mask_flat[k]:
            assert not changed, f"frozen param {k} moved"


def test_controlnet_train_step(models, batch):
    clips, bbox = batch
    tx = make_optimizer(learning_rate=1e-4)
    state = init_train_state(models["ctrl_params"], tx)
    step = jax.jit(
        make_controlnet_train_step(
            models["unet"], models["ctrl"], models["vae"], models["clip"], tx
        )
    )
    new_state, metrics = step(
        state, models["unet_params"], models["vae_params"], models["clip_params"],
        clips, bbox, jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["loss"]))
    # zero convs must start receiving gradient signal through the UNet
    before = flax.traverse_util.flatten_dict(state.params)
    after = flax.traverse_util.flatten_dict(new_state.params)
    changed = [
        k for k in before
        if not np.allclose(np.asarray(before[k]), np.asarray(after[k]))
    ]
    assert changed


def test_vae_decoder_train_step(models, batch):
    clips, _ = batch
    mask = trainable_mask(models["vae_params"], vae_decoder_predicate)
    tx = make_optimizer(learning_rate=1e-4, mask=mask)
    state = init_train_state(models["vae_params"], tx)
    step = jax.jit(make_vae_decoder_train_step(models["vae"], tx))
    new_state, metrics = step(state, clips, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    before = flax.traverse_util.flatten_dict(state.params)
    after = flax.traverse_util.flatten_dict(new_state.params)
    for k in before:
        changed = not np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        is_decoder = k[1] == "decoder"
        if changed:
            assert is_decoder, f"non-decoder param {k} moved"


def test_lora_zero_init_and_apply(models):
    params = models["unet_params"]["params"]
    lora = lora_init(jax.random.PRNGKey(0), params, rank=2)
    assert len(lora) > 0
    merged = apply_lora(params, lora)
    # B=0 at init => no-op
    f0 = flax.traverse_util.flatten_dict(params)
    f1 = flax.traverse_util.flatten_dict(merged)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f0[k]), np.asarray(f1[k]))
    # nonzero B changes the adapted kernels only
    lora2 = jax.tree.map(lambda x: x + 0.1, lora)
    merged2 = flax.traverse_util.flatten_dict(apply_lora(params, lora2))
    changed = [k for k in f0 if not np.allclose(np.asarray(f0[k]), np.asarray(merged2[k]))]
    assert changed and all(k[-2] in ("to_q", "to_k", "to_v", "to_out_0") for k in changed)


def test_ema():
    params = {"w": jnp.ones((3,))}
    state = ema_init(params)
    state = ema_update(state, {"w": jnp.zeros((3,))})
    # step 1: decay = 2/11
    expected = 1.0 * (2 / 11)
    np.testing.assert_allclose(np.asarray(state.params["w"]), expected, rtol=1e-5)
