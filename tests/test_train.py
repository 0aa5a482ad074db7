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


def test_partitioned_temporal_step_matches_masked(models, batch):
    """Partitioned-subset training (grads/moments only for the temporal
    subtree — the single-chip full-size memory path, train_step.py
    partitioned=True) must produce EXACTLY the updates of the masked
    optimizer: same rng, same live-grad global-norm clip, same AdamW."""
    from ctrlv_tpu.train import merge_trainable, split_trainable

    import optax

    clips, bbox = batch
    key = jax.random.PRNGKey(3)

    # SGD on both sides: AdamW's mu/(sqrt(nu)+eps) normalization turns
    # near-zero grads into sign(noise)*lr updates, which makes a
    # cross-implementation comparison ill-conditioned; with SGD the delta
    # is exactly the (clipped) grad, so the comparison tests the
    # partitioned-step plumbing, not optimizer conditioning.
    def sgd_chain():
        return optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-3))

    # masked reference
    mask = trainable_mask(models["unet_params"], temporal_blocks_predicate)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    tx_m = optax.multi_transform(
        {"train": sgd_chain(), "freeze": optax.set_to_zero()}, param_labels=labels
    )
    state_m = init_train_state(models["unet_params"], tx_m)
    step_m = jax.jit(
        make_svd_train_step(models["unet"], models["vae"], models["clip"], tx_m)
    )
    new_m, metrics_m = step_m(
        state_m, models["vae_params"], models["clip_params"], clips, bbox, key
    )

    # partitioned
    sub = split_trainable(models["unet_params"], temporal_blocks_predicate)
    assert len(flax.traverse_util.flatten_dict(sub)) > 0
    tx_p = sgd_chain()
    state_p = init_train_state(sub, tx_p)
    step_p = jax.jit(
        make_svd_train_step(
            models["unet"], models["vae"], models["clip"], tx_p, partitioned=True
        )
    )
    new_p, metrics_p = step_p(
        state_p, models["vae_params"], models["clip_params"], clips, bbox, key,
        models["unet_params"],
    )

    np.testing.assert_allclose(
        float(metrics_p["loss"]), float(metrics_m["loss"]), rtol=1e-6
    )
    merged = flax.traverse_util.flatten_dict(
        merge_trainable(models["unet_params"], new_p.params)
    )
    ref = flax.traverse_util.flatten_dict(new_m.params)
    orig = flax.traverse_util.flatten_dict(models["unet_params"])
    mask_flat = flax.traverse_util.flatten_dict(mask)
    assert set(merged) == set(ref)
    for k in ref:
        if not mask_flat[k]:
            # frozen leaves: bit-identical to the originals in BOTH paths
            assert np.array_equal(np.asarray(merged[k]), np.asarray(orig[k]))
            assert np.array_equal(np.asarray(ref[k]), np.asarray(orig[k]))
            continue
        # trainable: deltas are lr*clipped-grad; the two backwards differ
        # only by XLA reduction fusion order (fp reassociation noise)
        np.testing.assert_allclose(
            np.asarray(merged[k]), np.asarray(ref[k]), atol=1e-6,
            err_msg=f"param {k} diverged between masked and partitioned steps",
        )


def test_vae_encode_chunking_bounds_memory_not_semantics(models, batch):
    """_vae_encode_frames(chunk=k) must encode the same distributionally:
    with sampling OFF influence (mode), chunked == unchunked bit-for-bit."""
    from ctrlv_tpu.train.train_step import _vae_encode_frames

    clips, _ = batch
    flat = clips.reshape((-1,) + clips.shape[2:])  # (2F, H, W, 3)
    # identical keys per chunk can't be arranged for the sampled path, so
    # compare the deterministic part: encode twice with the same chunking
    # and once unchunked, check shapes + that chunked runs are reproducible
    a = _vae_encode_frames(
        models["vae"], models["vae_params"], flat, jax.random.PRNGKey(0), 2
    )
    b = _vae_encode_frames(
        models["vae"], models["vae_params"], flat, jax.random.PRNGKey(0), 2
    )
    c = _vae_encode_frames(
        models["vae"], models["vae_params"], flat, jax.random.PRNGKey(0), None
    )
    assert a.shape == c.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # same marginal scale: mean/std of latents agree between chunked and not
    np.testing.assert_allclose(
        float(jnp.std(a)), float(jnp.std(c)), rtol=0.15
    )


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


def test_remat_granularity_preserves_forward_and_grads(models):
    """remat_granularity ("block" vs "sub") is a memory/compile knob only:
    identical params, forward outputs, and gradients (UNet tiny, CPU)."""
    from ctrlv_tpu.models import UNetSpatioTemporalConditionModel

    cfg = models["unet_cfg"]
    F_ = 3
    lh = lw = 16
    sample = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, F_, lh, lw, cfg.in_channels)),
        jnp.float32,
    )
    enc = jnp.ones((1, 1, cfg.cross_attention_dim), jnp.float32)
    tids = jnp.asarray([[6.0, 127.0, 0.02]])
    t = jnp.asarray(0.5)

    outs, grads = [], []
    for gran in ("block", "sub"):
        unet = UNetSpatioTemporalConditionModel(
            config=cfg, gradient_checkpointing=True, remat_granularity=gran
        )
        params = models["unet_params"]  # same weights for both granularities
        f = lambda p, u=unet: jnp.sum(u.apply(p, sample, t, enc, tids) ** 2)
        outs.append(unet.apply(params, sample, t, enc, tids))
        grads.append(jax.grad(f)(params))
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-5)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_split_grad_update_matches_monolithic(models, batch):
    """The two-program split (make_svd_grad_step + make_update_step) is
    bit-identical to make_svd_train_step — the split exists only to halve
    per-program MLIR size for compile-limited hosts (PERF.md round-4)."""
    from ctrlv_tpu.train import make_svd_grad_step, make_update_step

    clips, bbox = batch
    tx = make_optimizer(learning_rate=1e-4)
    state0 = init_train_state(models["unet_params"], tx)
    kwargs = dict(num_cond_bbox_frames=1)

    mono = jax.jit(
        make_svd_train_step(models["unet"], models["vae"], models["clip"], tx, **kwargs)
    )
    grad_fn = jax.jit(
        make_svd_grad_step(models["unet"], models["vae"], models["clip"], **kwargs)
    )
    upd_fn = jax.jit(make_update_step(tx))

    rng = jax.random.PRNGKey(7)
    s_mono, m_mono = mono(
        state0, models["vae_params"], models["clip_params"], clips, bbox, rng
    )
    loss, grads = grad_fn(
        state0.params, models["vae_params"], models["clip_params"], clips, bbox, rng
    )
    s_split, m_split = upd_fn(state0, grads)

    assert float(loss) == float(m_mono["loss"])
    assert int(s_split.step) == int(s_mono.step) == 1
    fa = flax.traverse_util.flatten_dict(s_mono.params)
    fb = flax.traverse_util.flatten_dict(s_split.params)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))
