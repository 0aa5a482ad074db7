"""Tests for the legacy model family: BBOXFrameAttention, KittiObjectNet,
LayoutNet, UNet2DConditionModel, UNet-ST bbox-cond variant, FVD harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.models import (
    BBOXFrameAttention,
    KittiObjectNet,
    LayoutNet,
    LayoutNetConfig,
    UNet2DConditionModel,
    UNet2DConfig,
    UNetSpatioTemporalConditionModelWithBBoxCond,
    UNetSTConfig,
)


def test_bbox_frame_attention_rezero():
    """At init (rz_weight=0) the output is exactly the channel-repeat of
    the input — rezero parity with the reference (:attention.py:560)."""
    F = 3
    model = BBOXFrameAttention(
        num_frames=F, in_channels=4, out_channels=4 * F, num_layers=1,
        norm_num_groups=4,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    params = jax.jit(lambda k: model.init(k, x))(rng)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 8, 8, 4 * F)
    np.testing.assert_allclose(np.asarray(out), np.tile(np.asarray(x), (1, 1, 1, F)), atol=1e-6)

    # nonzero rezero scalar must activate the transformer path
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    flat[("rz_weight",)] = jnp.ones((1,))
    params2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    out2 = jax.jit(model.apply)(params2, x)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_unet_st_bbox_cond_encode_frame():
    cfg = UNetSTConfig.tiny(num_frames=3)
    model = UNetSpatioTemporalConditionModelWithBBoxCond(
        config=cfg, num_bbox_attn_layers=1
    )
    rng = jax.random.PRNGKey(0)
    frame_latent = jax.random.normal(rng, (1, 8, 8, cfg.out_channels))
    objects = jax.random.normal(rng, (1, cfg.num_frames, 5, 16))
    params = jax.jit(
        lambda k: model.init(k, frame_latent, objects, method=model.encode_bbox_frame)
    )(rng)
    out = model.apply(params, frame_latent, objects, method=model.encode_bbox_frame)
    assert out.shape == (1, cfg.num_frames, 8, 8, cfg.out_channels)
    # rezero init: every frame's conditioning latent == the input latent
    for f in range(cfg.num_frames):
        np.testing.assert_allclose(
            np.asarray(out[:, f]), np.asarray(frame_latent), atol=1e-6
        )


def test_kitti_object_net():
    model = KittiObjectNet(out_dim=24, mid_dim=32)
    B, N = 2, 5
    rng = np.random.default_rng(0)
    objects = dict(
        truncated=jnp.asarray(rng.random((B, N)), jnp.float32),
        occluded=jnp.asarray(rng.integers(0, 4, (B, N))),
        alpha=jnp.asarray(rng.random((B, N)), jnp.float32),
        bbox=jnp.asarray(rng.random((B, N, 4)), jnp.float32),
        dimensions=jnp.asarray(rng.random((B, N, 3)), jnp.float32),
        locations=jnp.asarray(rng.random((B, N, 3)), jnp.float32),
        rotation_y=jnp.asarray(rng.random((B, N)), jnp.float32),
        id_type=jnp.asarray(rng.integers(0, 9, (B, N))),
    )
    params = jax.jit(lambda k: model.init(k, objects))(jax.random.PRNGKey(0))
    out = jax.jit(model.apply)(params, objects)
    assert out.shape == (B, N, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_layout_net_loss_and_causality():
    cfg = LayoutNetConfig.tiny()
    model = LayoutNet(config=cfg)
    rng = jax.random.PRNGKey(0)
    B, S = 2, 6
    x = jax.random.normal(rng, (B, S, cfg.n_layout + cfg.n_cond))
    labels = jax.random.normal(rng, (B, S, cfg.n_layout))
    params = jax.jit(lambda k: model.init(k, x, labels))(rng)
    pred, loss = jax.jit(model.apply)(params, x, labels)
    assert pred.shape == (B, S, cfg.n_layout)
    assert np.isfinite(float(loss))
    # causality: changing a later input must not affect earlier predictions
    x2 = x.at[:, -1].add(10.0)
    pred2, _ = jax.jit(model.apply)(params, x2, labels)
    np.testing.assert_allclose(
        np.asarray(pred[:, :-1]), np.asarray(pred2[:, :-1]), atol=1e-5
    )
    assert not np.allclose(np.asarray(pred[:, -1]), np.asarray(pred2[:, -1]))


@pytest.mark.heavy
def test_unet2d_object_conditioning():
    cfg = UNet2DConfig.tiny(
        addition_embed_type="object", encoder_hid_dim_type="text_object_proj"
    )
    model = UNet2DConditionModel(config=cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 16, 16, cfg.in_channels))
    text = jax.random.normal(rng, (1, 7, cfg.cross_attention_dim))
    objects = jax.random.normal(rng, (1, 4, cfg.object_dim))
    params = jax.jit(lambda k: model.init(k, x, jnp.asarray(10.0), text, objects))(rng)
    out = jax.jit(model.apply)(params, x, jnp.asarray(10.0), text, objects)
    assert out.shape == (1, 16, 16, cfg.out_channels)
    # object conditioning must matter
    out2 = jax.jit(model.apply)(params, x, jnp.asarray(10.0), text, objects + 1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_fvd_math():
    from ctrlv_tpu.metrics.fvd import frechet_distance, preprocess_fvd

    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 8))
    assert frechet_distance(a, a.copy()) < 1e-6
    b = a + 5.0
    assert frechet_distance(a, b) > 20.0

    vids = jnp.asarray(rng.random((1, 2, 30, 40, 3)), jnp.float32)
    out = preprocess_fvd(vids, target=24)
    assert out.shape == (1, 2, 24, 24, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0


def test_fvd_small_sample_singular_covariance():
    """N < D makes cov singular; the eps*I retry must keep FD finite and
    warning-free (reference small-N evals hit exactly this: fvd.py:179-185
    with SAMPLES below the 400-d feature dim)."""
    import warnings

    from ctrlv_tpu.metrics.fvd import frechet_distance

    rng = np.random.default_rng(1)
    a = rng.standard_normal((6, 32))  # rank 5 << 32 dims
    b = rng.standard_normal((6, 32)) + 2.0
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        d_same = frechet_distance(a, a.copy())
        d_diff = frechet_distance(a, b)
    assert np.isfinite(d_same) and np.isfinite(d_diff)
    assert d_diff > d_same


@pytest.mark.slow
@pytest.mark.heavy
def test_fvd_i3d_forward():
    from ctrlv_tpu.metrics.fvd import FVD

    rng = np.random.default_rng(0)
    fvd = FVD(batch_size=2, target_size=32)
    real = rng.random((2, 3, 32, 32, 3)).astype(np.float32)
    fake = rng.random((2, 3, 32, 32, 3)).astype(np.float32)
    fvd.update(real, fake)
    score = fvd.compute()
    assert np.isfinite(score)
