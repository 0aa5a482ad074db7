"""End-to-end pipeline tests (tiny models): the minimum-slice gate.

BASELINE.json configs[2,3,4]-shaped coverage on CPU: full 25-step-style
sampling through CLIP encode -> VAE encodes -> lax.scan denoise -> decode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.pipelines import (
    OverallPipeline,
    StableVideoControlPipeline,
    VideoDiffusionPipeline,
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
def bbox_pipe(models):
    return VideoDiffusionPipeline(
        models["unet"], models["unet_params"],
        models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )


@pytest.fixture(scope="module")
def ctrl_pipe(models):
    return StableVideoControlPipeline(
        models["unet"], models["unet_params"],
        models["ctrl"], models["ctrl_params"],
        models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )


def test_video_diffusion_pipeline(bbox_pipe):
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), minval=-1, maxval=1)
    bbox = jax.random.uniform(jax.random.PRNGKey(2), (1, F, H, W, 3), minval=-1, maxval=1)
    frames = bbox_pipe(
        image,
        bbox_images=bbox,
        rng=jax.random.PRNGKey(3),
        num_frames=F,
        num_inference_steps=4,
        decode_chunk_size=2,
    )
    assert frames.shape == (1, F, H, W, 3)
    out = np.asarray(frames)
    assert np.isfinite(out).all() and out.min() >= 0.0 and out.max() <= 1.0


def test_video_diffusion_seed_determinism(bbox_pipe):
    image = jnp.zeros((1, H, W, 3))
    a = bbox_pipe(image, rng=jax.random.PRNGKey(7), num_frames=F, num_inference_steps=2)
    b = bbox_pipe(image, rng=jax.random.PRNGKey(7), num_frames=F, num_inference_steps=2)
    c = bbox_pipe(image, rng=jax.random.PRNGKey(8), num_frames=F, num_inference_steps=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_control_pipeline_frames_and_latents(ctrl_pipe, models):
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), minval=-1, maxval=1)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, F, H, W, 3), minval=-1, maxval=1)
    frames = ctrl_pipe(
        image, cond, rng=jax.random.PRNGKey(3), num_frames=F, num_inference_steps=2
    )
    assert frames.shape == (1, F, H, W, 3)
    assert np.isfinite(np.asarray(frames)).all()

    # 4-channel pre-computed latents path
    scale = models["vae_cfg"].spatial_scale
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, F, H // scale, W // scale, 4))
    frames2 = ctrl_pipe(
        image, lat, rng=jax.random.PRNGKey(3), num_frames=F, num_inference_steps=2
    )
    assert frames2.shape == (1, F, H, W, 3)


def test_overall_pipeline(bbox_pipe, ctrl_pipe):
    overall = OverallPipeline(bbox_pipe, ctrl_pipe)
    image = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3), minval=-1, maxval=1)
    bbox = jax.random.uniform(jax.random.PRNGKey(2), (F, H, W, 3), minval=-1, maxval=1)
    result = overall(
        image,
        bbox,
        rng=jax.random.PRNGKey(5),
        num_frames=F,
        stage1_steps=2,
        stage2_steps=2,
        decode_chunk_size=F,
    )
    assert result["video"].shape == (F, H, W, 3)
    assert result["bbox_video"].shape == (F, H, W, 3)
    assert 0.0 <= result["miou"] <= 1.0
    assert len(result["best_guidance"]) == 2


def test_guidance_sweep_reuses_compiled_sampler(bbox_pipe, ctrl_pipe):
    """Guidance (min,max) pairs are runtime values: sweeping them must not
    recompile the sampler (only do_cfg is static), and the per-pair results
    must match what an explicit guidance_minmax array produces."""
    image = jnp.zeros((1, H, W, 3))
    a = bbox_pipe(image, rng=jax.random.PRNGKey(1), num_frames=F,
                  num_inference_steps=2, min_guidance_scale=1.0,
                  max_guidance_scale=3.0)
    n1 = len(bbox_pipe._jitted)
    b = bbox_pipe(image, rng=jax.random.PRNGKey(1), num_frames=F,
                  num_inference_steps=2, min_guidance_scale=2.0,
                  max_guidance_scale=5.0)
    assert len(bbox_pipe._jitted) == n1  # no new entry for a new pair
    via_array = bbox_pipe(
        image, rng=jax.random.PRNGKey(1), num_frames=F, num_inference_steps=2,
        guidance_minmax=jnp.asarray([[2.0, 5.0]], jnp.float32),
        min_guidance_scale=1.0, max_guidance_scale=3.0,
    )
    np.testing.assert_array_equal(np.asarray(b), np.asarray(via_array))
    assert not np.allclose(np.asarray(a), np.asarray(b))

    cond = jnp.zeros((1, F, H, W, 3))
    ctrl_pipe(image, cond, rng=jax.random.PRNGKey(2), num_frames=F,
              num_inference_steps=2, min_guidance_scale=1.0,
              max_guidance_scale=3.0)
    m1 = len(ctrl_pipe._jitted)
    ctrl_pipe(image, cond, rng=jax.random.PRNGKey(2), num_frames=F,
              num_inference_steps=2, min_guidance_scale=1.5,
              max_guidance_scale=4.0)
    assert len(ctrl_pipe._jitted) == m1  # no new entry for a new pair


def test_packed_params_pipelines_match_tree_params(models, bbox_pipe, ctrl_pipe):
    """PackedParams (flat-buffer params, unpacked inside the sampler trace —
    the bench.py init path since round 5) must match plain param trees
    through both pipelines. Values entering the models are bit-identical
    (pack/unpack roundtrip is exact — test_packed_params.py); the full
    samplers are compared at float tolerance because weights-as-slices
    change XLA's fusion/reduction order (measured ~2e-5 max abs over a
    2-step rollout on CPU), not the math."""
    from ctrlv_tpu.utils.packed_params import PackedParams

    image = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), minval=-1, maxval=1)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (1, F, H, W, 3), minval=-1, maxval=1)

    packed_bbox = VideoDiffusionPipeline(
        models["unet"], PackedParams.pack(models["unet_params"]),
        models["vae"], PackedParams.pack(models["vae_params"]),
        models["clip"], PackedParams.pack(models["clip_params"]),
    )
    a = bbox_pipe(image, bbox_images=cond, rng=jax.random.PRNGKey(3),
                  num_frames=F, num_inference_steps=2)
    b = packed_bbox(image, bbox_images=cond, rng=jax.random.PRNGKey(3),
                    num_frames=F, num_inference_steps=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    packed_ctrl = StableVideoControlPipeline(
        models["unet"], PackedParams.pack(models["unet_params"]),
        models["ctrl"], PackedParams.pack(models["ctrl_params"]),
        models["vae"], PackedParams.pack(models["vae_params"]),
        models["clip"], PackedParams.pack(models["clip_params"]),
    )
    c = ctrl_pipe(image, cond, rng=jax.random.PRNGKey(3), num_frames=F,
                  num_inference_steps=2)
    d = packed_ctrl(image, cond, rng=jax.random.PRNGKey(3), num_frames=F,
                    num_inference_steps=2)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), atol=2e-4)
