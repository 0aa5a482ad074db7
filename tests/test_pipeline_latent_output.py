"""output_type="latent" path: raw final latents, decodable to the same frames."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.pipelines import VideoDiffusionPipeline
from ctrlv_tpu.pipelines.common import decode_latents, postprocess_frames
from helpers import build_tiny_models

F, H, W = 3, 32, 32


@pytest.mark.heavy
def test_latent_output_matches_decoded(models=None):
    models = models or build_tiny_models(num_frames=F, image_hw=(H, W))
    pipe = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), minval=-1, maxval=1)
    kwargs = dict(rng=jax.random.PRNGKey(3), num_frames=F, num_inference_steps=2,
                  decode_chunk_size=F)
    latents = pipe(image, output_type="latent", **kwargs)
    scale = models["vae_cfg"].spatial_scale
    assert latents.shape == (1, F, H // scale, W // scale, 4)

    frames = pipe(image, output_type="np", **kwargs)
    decoded = postprocess_frames(
        jnp.clip(
            decode_latents(
                models["vae"], models["vae_params"], latents,
                models["vae_cfg"].scaling_factor, F,
            ),
            -1.0, 1.0,
        )
    )
    np.testing.assert_allclose(np.asarray(decoded), np.asarray(frames), atol=1e-5)
