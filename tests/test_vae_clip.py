"""Tests: temporal VAE roundtrip shapes, CLIP vision encoder, preprocessing.

All init/apply calls are jitted: eager dispatch is too slow on the 1-CPU
test host, and jit exercises the real XLA path anyway.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.models import (
    AutoencoderKLTemporalDecoder,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    VAEConfig,
    clip_preprocess,
)

F, H, W = 3, 16, 16


@pytest.fixture(scope="module")
def vae_setup():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKLTemporalDecoder(config=cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (F, H, W, 3), jnp.float32, -1, 1)
    params = jax.jit(lambda k: vae.init(k, x, num_frames=F))(rng)
    encode = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))
    encode_sample = jax.jit(
        lambda p, x, k: vae.apply(p, x, k, True, method=vae.encode)
    )
    decode = jax.jit(
        lambda p, z: vae.apply(p, z, F, method=vae.decode)
    )
    return cfg, vae, params, x, encode, encode_sample, decode


def test_vae_roundtrip_shapes(vae_setup):
    cfg, vae, params, x, encode, _, decode = vae_setup
    z = encode(params, x)
    assert z.shape == (F, H // cfg.spatial_scale, W // cfg.spatial_scale, 4)
    recon = decode(params, z)
    assert recon.shape == (F, H, W, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_vae_sample_vs_mode(vae_setup):
    _, _, params, x, encode, encode_sample, _ = vae_setup
    mode = encode(params, x)
    samp = encode_sample(params, x, jax.random.PRNGKey(1))
    assert mode.shape == samp.shape
    assert not np.allclose(np.asarray(mode), np.asarray(samp))


def test_vae_temporal_decoder_couples_frames(vae_setup):
    """The temporal conv + ST resblocks must mix information across frames."""
    cfg, _, params, _, _, _, decode = vae_setup
    rng = jax.random.PRNGKey(2)
    z = jax.random.normal(rng, (F, H // cfg.spatial_scale, W // cfg.spatial_scale, 4))
    out1 = decode(params, z)
    out2 = decode(params, z.at[0].add(1.0))
    # frame 1's reconstruction must change when frame 0's latent changes
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out2[1]))


def test_clip_vision_shapes():
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModelWithProjection(config=cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x))(rng)
    emb = jax.jit(model.apply)(params, x)
    assert emb.shape == (2, cfg.projection_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_clip_preprocess_range():
    x = jnp.ones((1, 32, 48, 3)) * 1.0  # white frame in [-1,1]
    out = clip_preprocess(x, image_size=28)
    assert out.shape == (1, 28, 28, 3)
    # white -> (1 - mean)/std
    expected = (1.0 - 0.48145466) / 0.26862954
    assert np.isclose(float(out[0, 14, 14, 0]), expected, atol=1e-3)
