"""Stage-1 pipeline: SVD finetune inference / bounding-box predictor.

Behavioral parity target: VideoDiffusionPipeline
(/root/reference/src/ctrlv/pipelines/pipeline_video_diffusion.py:56-315):
  - CLIP image embedding + VAE initial-frame latent repeated across frames,
  - optional bbox conditioning by *latent substitution*: conditioning-frame
    latents replace image latents at frames [0:num_cond_bbox_frames] and
    [-1] (:199-206),
  - channel-concat conditioning, per-frame guidance linspace, Euler loop,
  - decode + clamp.

TPU-native design: the entire sampler (CLIP encode, VAE encodes, the
denoise loop as `lax.scan`, VAE decode) is ONE jitted program per static
(shape, steps) signature; latents are donated so the 25-step loop stays
resident on device. CFG runs as a doubled batch through the same UNet call.
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


class VideoDiffusionPipeline:
    """Functional pipeline: models + params in, jitted sampler cached."""

    def __init__(
        self,
        unet,
        unet_params,
        vae,
        vae_params,
        image_encoder,
        clip_params,
        scheduler: Optional[EulerDiscreteScheduler] = None,
        mesh=None,
    ):
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.image_encoder = image_encoder
        self.clip_params = clip_params
        self.scheduler = scheduler or EulerDiscreteScheduler()
        self.mesh = mesh
        self._jitted = {}

    # ------------------------------------------------------------------
    def _sample_fn(
        self,
        cfg: SamplingConfig,
        with_bbox: bool,
        output_latents: bool = False,
        param_specs=(None, None, None),
    ):
        sched_state = self.scheduler.set_timesteps(cfg.num_inference_steps)

        def sample(
            unet_params, vae_params, clip_params, image, bbox_images, rng, guidance_minmax
        ):
            # Packed params unpack inside the trace (utils/packed_params.py).
            unet_params = resolve_params(unet_params, param_specs[0])
            vae_params = resolve_params(vae_params, param_specs[1])
            clip_params = resolve_params(clip_params, param_specs[2])
            batch = image.shape[0]
            do_cfg = cfg.do_cfg
            rng_noise, rng_lat = jax.random.split(rng)

            # conditioning
            clip_emb = encode_clip_image(
                self.image_encoder, clip_params, image, do_cfg
            )
            noise = jax.random.normal(rng_noise, image.shape, image.dtype)
            img_latent = encode_vae_image(
                self.vae, vae_params, image, noise, cfg.noise_aug_strength, do_cfg
            )
            image_latents = jnp.repeat(img_latent[:, None], cfg.num_frames, axis=1)

            if with_bbox:
                cond_latents = encode_vae_video(
                    self.vae, vae_params, bbox_images, do_cfg
                )
                # latent substitution: first K frames + last frame. Expressed
                # as an elementwise select instead of .at[].set — the XLA CPU
                # SPMD partitioner miscompiles sliced scatters on a sharded
                # frame axis (verified: values change under a pure layout
                # constraint), and where() partitions trivially.
                k = cfg.num_cond_bbox_frames
                fidx = jnp.arange(cfg.num_frames)[None, :, None, None, None]
                use_cond = (fidx < k) | (fidx == cfg.num_frames - 1)
                image_latents = jnp.where(use_cond, cond_latents, image_latents)

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
            guidance = guidance_linspace(cfg, batch, cfg.num_frames, guidance_minmax)

            def step(latents, i):
                sigma = sched_state.sigmas[i]
                sigma_next = sched_state.sigmas[i + 1]
                t = sched_state.timesteps[i]
                lat_in = jnp.concatenate([latents] * 2) if do_cfg else latents
                lat_in = scale_model_input(lat_in, sigma)
                lat_in = jnp.concatenate([lat_in, image_latents], axis=-1)
                pred = self.unet.apply(unet_params, lat_in, t, clip_emb, add_time_ids)
                pred = pred.astype(jnp.float32)
                if do_cfg:
                    uncond, cond = jnp.split(pred, 2, axis=0)
                    pred = uncond + guidance * (cond - uncond)
                nxt = euler_step(pred, latents, sigma, sigma_next)
                return maybe_shard_frames(nxt, self.mesh), None

            latents, _ = jax.lax.scan(
                step, latents, jnp.arange(cfg.num_inference_steps)
            )
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
            frames = jnp.clip(frames, -1.0, 1.0)
            return postprocess_frames(frames)

        return sample

    # ------------------------------------------------------------------
    def __call__(
        self,
        image: jnp.ndarray,  # (B,H,W,3) in [-1,1]
        bbox_images: Optional[jnp.ndarray] = None,  # (B,F,H,W,3) in [-1,1]
        rng: Optional[jax.Array] = None,
        guidance_minmax: Optional[jnp.ndarray] = None,  # (B,2) per-sample ramp
        output_type: str = "np",  # "np" frames in [0,1] | "latent"
        **kwargs,
    ) -> jnp.ndarray:
        """Generate a video; returns (B, F, H, W, 3) frames in [0,1]
        (or raw final latents with output_type="latent")."""
        cfg = SamplingConfig(**kwargs)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        with_bbox = bbox_images is not None
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
        if bbox_images is None:
            # placeholder, never read by the with_bbox=False trace — avoids
            # materializing a (B,F,H,W,3) zeros array per call
            bbox_images = jnp.zeros((1,), jnp.float32)
        param_args, param_specs = split_packed(
            (self.unet_params, self.vae_params, self.clip_params)
        )
        spec_tag = tuple(s.digest() if s is not None else None for s in param_specs)
        key = (cfg, with_bbox, latent_out, image.shape,
               None if not with_bbox else bbox_images.shape, spec_tag)
        args = param_args + (image, bbox_images, rng, guidance_minmax)
        if key not in self._jitted:
            from ..utils.compile_options import get_compiler_options

            copts = get_compiler_options()
            fn = self._sample_fn(
                cfg, with_bbox, output_latents=latent_out, param_specs=param_specs
            )
            if self.mesh is not None:
                base = jax.jit(fn, compiler_options=copts)
                def fn_meshed(*args, _base=base):
                    with jax.set_mesh(self.mesh):
                        return _base(*args)
                self._jitted[key] = fn_meshed
            else:
                # Cross-process executable cache (utils/exec_cache.py):
                # the axon TPU helper bypasses jax's persistent compile
                # cache; this restores warm starts across processes.
                from ..utils.exec_cache import compile_cached

                self._jitted[key] = compile_cached(
                    fn, args, tag="svd_sample", compiler_options=copts,
                    key_extra=repr(key),
                )
        return self._jitted[key](*args)
