"""Stage-2 pipeline: Box2Video (ControlNet-conditioned SVD generation).

Behavioral parity target: StableVideoControlPipeline
(/root/reference/src/ctrlv/pipelines/pipeline_video_control.py:103-360):
  - cond_images: 3-ch bbox frames (VAE-encoded per frame, .mode()) or
    pre-computed 4-ch latents (:71-101),
  - every denoise step runs ControlNet then UNet with the down/mid
    residuals (:297-343), control_condition_scale applied inside,
  - CFG with zeroed negative conditioning for CLIP/VAE/control latents.

TPU-native: one jitted program; denoise loop = lax.scan; the
ControlNet+UNet pair is a single fused XLA computation per step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..diffusion import EulerDiscreteScheduler, euler_step, scale_model_input
from .common import (
    SamplingConfig,
    decode_latents,
    maybe_shard_frames,
    encode_clip_image,
    encode_vae_image,
    encode_vae_video,
    get_add_time_ids,
    guidance_linspace,
    postprocess_frames,
    prepare_latents,
    resolve_params,
    split_packed,
)


class StableVideoControlPipeline:
    def __init__(
        self,
        unet,
        unet_params,
        controlnet,
        controlnet_params,
        vae,
        vae_params,
        image_encoder,
        clip_params,
        scheduler: Optional[EulerDiscreteScheduler] = None,
        mesh=None,
    ):
        self.unet = unet
        self.unet_params = unet_params
        self.controlnet = controlnet
        self.controlnet_params = controlnet_params
        self.vae = vae
        self.vae_params = vae_params
        self.image_encoder = image_encoder
        self.clip_params = clip_params
        self.scheduler = scheduler or EulerDiscreteScheduler()
        self.mesh = mesh
        self._jitted = {}

    def _sample_fn(
        self,
        cfg: SamplingConfig,
        cond_is_latent: bool,
        output_latents: bool = False,
        param_specs=(None, None, None, None),
    ):
        sched_state = self.scheduler.set_timesteps(cfg.num_inference_steps)

        def sample(
            unet_params,
            ctrl_params,
            vae_params,
            clip_params,
            image,
            cond_images,
            rng,
            guidance_minmax,
        ):
            # Packed params (utils/packed_params.py) cross the jit boundary
            # as flat per-dtype buffers and unpack here, inside the trace —
            # the ~2800-leaf tree never exists as separate device arrays.
            unet_params = resolve_params(unet_params, param_specs[0])
            ctrl_params = resolve_params(ctrl_params, param_specs[1])
            vae_params = resolve_params(vae_params, param_specs[2])
            clip_params = resolve_params(clip_params, param_specs[3])
            batch = image.shape[0]
            do_cfg = cfg.do_cfg
            rng_noise, rng_lat = jax.random.split(rng)

            clip_emb = encode_clip_image(self.image_encoder, clip_params, image, do_cfg)
            noise = jax.random.normal(rng_noise, image.shape, image.dtype)
            img_latent = encode_vae_image(
                self.vae, vae_params, image, noise, cfg.noise_aug_strength, do_cfg
            )
            image_latents = jnp.repeat(img_latent[:, None], cfg.num_frames, axis=1)

            if cond_is_latent:
                cond_em = cond_images
                if do_cfg:
                    cond_em = jnp.concatenate([jnp.zeros_like(cond_em), cond_em], axis=0)
            else:
                cond_em = encode_vae_video(self.vae, vae_params, cond_images, do_cfg)

            add_time_ids = get_add_time_ids(cfg, batch, do_cfg)
            h, w = image_latents.shape[2], image_latents.shape[3]
            latents = prepare_latents(
                rng_lat,
                batch,
                cfg.num_frames,
                h,
                w,
                self.unet.config.out_channels,
                sched_state.init_noise_sigma,
                jnp.float32,
            )
            latents = maybe_shard_frames(latents, self.mesh)
            image_latents = maybe_shard_frames(image_latents, self.mesh)
            cond_em = maybe_shard_frames(cond_em, self.mesh)
            guidance = guidance_linspace(cfg, batch, cfg.num_frames, guidance_minmax)

            def step(latents, i):
                sigma = sched_state.sigmas[i]
                sigma_next = sched_state.sigmas[i + 1]
                t = sched_state.timesteps[i]
                lat_in = jnp.concatenate([latents] * 2) if do_cfg else latents
                lat_in = scale_model_input(lat_in, sigma)
                lat_in = jnp.concatenate([lat_in, image_latents], axis=-1)
                down_res, mid_res = self.controlnet.apply(
                    ctrl_params,
                    lat_in,
                    t,
                    clip_emb,
                    add_time_ids,
                    cond_em,
                    conditioning_scale=cfg.control_condition_scale,
                )
                pred = self.unet.apply(
                    unet_params,
                    lat_in,
                    t,
                    clip_emb,
                    add_time_ids,
                    down_block_additional_residuals=down_res,
                    mid_block_additional_residuals=mid_res,
                )
                pred = pred.astype(jnp.float32)
                if do_cfg:
                    uncond, cond = jnp.split(pred, 2, axis=0)
                    pred = uncond + guidance * (cond - uncond)
                nxt = euler_step(pred, latents, sigma, sigma_next)
                return maybe_shard_frames(nxt, self.mesh), None

            latents, _ = jax.lax.scan(step, latents, jnp.arange(cfg.num_inference_steps))
            if output_latents:
                return latents
            frames = decode_latents(
                self.vae,
                vae_params,
                latents,
                self.vae.config.scaling_factor,
                cfg.decode_chunk_size,
                max_frames_per_call=cfg.max_decode_frames,
            )
            return postprocess_frames(frames)

        return sample

    def __call__(
        self,
        image: jnp.ndarray,  # (B,H,W,3) in [-1,1]
        cond_images: jnp.ndarray,  # (B,F,H,W,3) frames or (B,F,h,w,4) latents
        rng: Optional[jax.Array] = None,
        guidance_minmax: Optional[jnp.ndarray] = None,
        output_type: str = "np",
        **kwargs,
    ) -> jnp.ndarray:
        cfg = SamplingConfig(**kwargs)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        cond_is_latent = cond_images.shape[-1] == 4
        latent_out = output_type == "latent"
        if guidance_minmax is None:
            guidance_minmax = jnp.tile(
                jnp.asarray(
                    [[cfg.min_guidance_scale, cfg.max_guidance_scale]], jnp.float32
                ),
                (image.shape[0], 1),
            )
        # Guidance values flow through the runtime (B,2) array; only do_cfg
        # is genuinely static. Canonicalize the floats so sweeping guidance
        # pairs reuses one compiled sampler instead of recompiling per pair.
        cfg = dataclasses.replace(
            cfg,
            min_guidance_scale=0.0,
            max_guidance_scale=2.0 if cfg.do_cfg else 1.0,
        )
        param_args, param_specs = split_packed(
            (self.unet_params, self.controlnet_params, self.vae_params, self.clip_params)
        )
        spec_tag = tuple(s.digest() if s is not None else None for s in param_specs)
        key = (cfg, cond_is_latent, latent_out, image.shape, cond_images.shape, spec_tag)
        args = param_args + (image, cond_images, rng, guidance_minmax)
        if key not in self._jitted:
            from ..utils.compile_options import get_compiler_options

            copts = get_compiler_options()
            fn = self._sample_fn(
                cfg, cond_is_latent, output_latents=latent_out, param_specs=param_specs
            )
            if self.mesh is not None:
                base = jax.jit(fn, compiler_options=copts)
                def fn_meshed(*args, _base=base):
                    with jax.set_mesh(self.mesh):
                        return _base(*args)
                self._jitted[key] = fn_meshed
            else:
                # Cross-process executable cache: the axon TPU helper
                # bypasses jax's persistent compile cache, so warm starts
                # would otherwise pay the full 100-300 s pipeline compile
                # every process (utils/exec_cache.py).
                from ..utils.exec_cache import compile_cached

                self._jitted[key] = compile_cached(
                    fn, args, tag="svc_sample", compiler_options=copts,
                    key_extra=repr(key),
                )
        return self._jitted[key](*args)
