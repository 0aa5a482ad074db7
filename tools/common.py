"""Shared driver plumbing: model construction, weight loading, batching.

Replaces the reference drivers' diffusers `from_pretrained` + accelerate
setup (SURVEY.md §3.1 call stack, steps 1-4) with flax module construction
plus the HF-safetensors importer; falls back to seeded random init when no
checkpoint directory is given (e.g. smoke runs without SVD weights).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: repeat driver invocations skip the
# multi-minute SVD-size compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ctrlv_tpu.models import (
    AutoencoderKLTemporalDecoder,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
    ControlNetSpatioTemporal,
    UNetSpatioTemporalConditionModel,
    UNetSTConfig,
    VAEConfig,
)
from ctrlv_tpu.utils.config import Config


def build_models(cfg: Config, tiny: bool = False, with_controlnet: bool = False):
    """Construct UNet/VAE/CLIP (+ControlNet) and load or init params."""
    dtype = cfg.compute_dtype
    if tiny:
        ucfg = UNetSTConfig.tiny(num_frames=cfg.clip_length)
        vcfg = VAEConfig.tiny()
        ccfg = CLIPVisionConfig.tiny()
    else:
        ucfg = UNetSTConfig(num_frames=cfg.clip_length)
        vcfg = VAEConfig()
        ccfg = CLIPVisionConfig()

    unet = UNetSpatioTemporalConditionModel(
        config=ucfg, dtype=dtype,
        gradient_checkpointing=cfg.enable_gradient_checkpointing,
    )
    vae = AutoencoderKLTemporalDecoder(config=vcfg, dtype=dtype)
    clip = CLIPVisionModelWithProjection(config=ccfg, dtype=dtype)

    rng = jax.random.PRNGKey(cfg.seed)
    h = cfg.train_H // vcfg.spatial_scale
    w = cfg.train_W // vcfg.spatial_scale
    sample = jnp.zeros((1, cfg.clip_length, h, w, ucfg.in_channels))
    enc = jnp.zeros((1, 1, ucfg.cross_attention_dim))
    tids = jnp.asarray([[6.0, 127.0, 0.02]])

    unet_params = jax.jit(lambda k: unet.init(k, sample, jnp.asarray(0.5), enc, tids))(rng)
    vae_params = jax.jit(lambda k: vae.init(k, jnp.zeros((1, cfg.train_H, cfg.train_W, 3))))(rng)
    clip_params = jax.jit(
        lambda k: clip.init(k, jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3)))
    )(rng)

    # HF checkpoint import when a local diffusers-layout directory exists
    model_dir = cfg.pretrained_model_name_or_path
    if os.path.isdir(model_dir):
        from ctrlv_tpu.train import load_hf_component

        for sub, params, label in (
            ("unet", unet_params, "unet"),
            ("vae", vae_params, "vae"),
            ("image_encoder", clip_params, "image_encoder"),
        ):
            comp_dir = os.path.join(model_dir, sub)
            if os.path.isdir(comp_dir):
                loaded = load_hf_component(comp_dir, expected=params["params"])
                params["params"] = loaded
                print(f"loaded HF weights: {label}")

    models = dict(
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        clip=clip, clip_params=clip_params,
        unet_cfg=ucfg, vae_cfg=vcfg, clip_cfg=ccfg,
    )
    if with_controlnet:
        ctrl = ControlNetSpatioTemporal(
            config=ucfg, dtype=dtype,
            gradient_checkpointing=cfg.enable_gradient_checkpointing,
        )
        cond = jnp.zeros((1, cfg.clip_length, h, w, ucfg.in_channels // 2))
        ctrl_params = jax.jit(
            lambda k: ctrl.init(k, sample, jnp.asarray(0.5), enc, tids, cond)
        )(rng)
        from ctrlv_tpu.models import controlnet_params_from_unet

        ctrl_params = {
            "params": controlnet_params_from_unet(
                unet_params["params"], ctrl_params["params"]
            )
        }
        models.update(ctrl=ctrl, ctrl_params=ctrl_params)
    return models


def batch_to_device(batch, dtype=jnp.float32):
    clips = jnp.asarray(batch["clips"], dtype)
    bbox = jnp.asarray(batch.get("bbox_images", batch["clips"]), dtype)
    return clips, bbox
