"""Shared tiny-model builders for tests."""

import jax
import jax.numpy as jnp

from ctrlv_tpu.models import (
    AutoencoderKLTemporalDecoder,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    ControlNetSpatioTemporal,
    UNetSpatioTemporalConditionModel,
    UNetSTConfig,
    VAEConfig,
)


def build_tiny_models(
    rng=None,
    num_frames=3,
    image_hw=(32, 32),
    components=("unet", "vae", "clip"),
):
    """Tiny UNet + VAE + CLIP (+ControlNet) with initialized params.

    VAE tiny has spatial scale 2, so a 32x32 image -> 16x16 latents.

    `components` controls which params get initialized — each init is a
    ~30-60 s cold compile on the 1-core test host, so tests should request
    only what they use ("ctrl" is opt-in; baseline tests want vae+clip
    only). Module objects are always returned; params only on request.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    h, w = image_hw

    unet_cfg = UNetSTConfig.tiny(num_frames=num_frames)
    vae_cfg = VAEConfig.tiny()
    clip_cfg = CLIPVisionConfig.tiny()
    # projection dim must equal unet cross_attention_dim
    assert clip_cfg.projection_dim == unet_cfg.cross_attention_dim

    unet = UNetSpatioTemporalConditionModel(config=unet_cfg)
    vae = AutoencoderKLTemporalDecoder(config=vae_cfg)
    clip = CLIPVisionModelWithProjection(config=clip_cfg)
    ctrl = ControlNetSpatioTemporal(config=unet_cfg)

    lh, lw = h // vae_cfg.spatial_scale, w // vae_cfg.spatial_scale
    sample = jnp.zeros((1, num_frames, lh, lw, unet_cfg.in_channels))
    enc = jnp.zeros((1, 1, unet_cfg.cross_attention_dim))
    tids = jnp.asarray([[6.0, 127.0, 0.02]])
    cond = jnp.zeros((1, num_frames, lh, lw, unet_cfg.in_channels // 2))

    k1, k2, k3, k4 = jax.random.split(rng, 4)
    # jit the inits: eager op-by-op dispatch is pathologically slow on the
    # single-CPU test host; jit+persistent-cache makes these near-instant
    # on warm runs (identical configs/shapes across files share entries).
    out = dict(
        unet=unet, vae=vae, clip=clip, ctrl=ctrl,
        unet_cfg=unet_cfg, vae_cfg=vae_cfg, clip_cfg=clip_cfg,
    )
    if "unet" in components:
        out["unet_params"] = jax.jit(
            lambda k: unet.init(k, sample, jnp.asarray(0.5), enc, tids)
        )(k1)
    if "vae" in components:
        out["vae_params"] = jax.jit(lambda k: vae.init(k, jnp.zeros((1, h, w, 3))))(k2)
    if "clip" in components:
        out["clip_params"] = jax.jit(
            lambda k: clip.init(
                k, jnp.zeros((1, clip_cfg.image_size, clip_cfg.image_size, 3))
            )
        )(k3)
    if "ctrl" in components:
        out["ctrl_params"] = jax.jit(
            lambda k: ctrl.init(k, sample, jnp.asarray(0.5), enc, tids, cond)
        )(k4)
    return out
