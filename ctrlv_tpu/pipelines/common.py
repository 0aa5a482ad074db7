"""Shared pipeline machinery: conditioning encoders, latent prep, CFG.

Behavioral spec: the diffusers StableVideoDiffusionPipeline internals the
reference inherits (SURVEY.md §2.2 'Inherited-from-diffusers behavior'):
_encode_image (CLIP, zero negative for CFG), _encode_vae_image (zero
negative), prepare_latents (*init_noise_sigma), _get_add_time_ids,
decode_latents (chunked, /scaling_factor), per-frame guidance linspace
(/root/reference/src/ctrlv/pipelines/pipeline_video_control.py:287-292).

All functions are pure/jit-friendly; the pipeline classes wire them into a
single jitted program per (shape, steps) signature.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.clip_vision import clip_preprocess
from ..utils.packed_params import PackedParams, unpack_tree


def split_packed(params_tuple):
    """(args, specs) for a tuple of param trees, any of which may be a
    PackedParams. args hold what crosses the jit boundary (flat buffers
    for packed entries — the point: the consumer program instantiates a
    handful of outputs/inputs instead of ~2800; PERF.md round-5); specs
    are the static unpack recipes (None for plain trees)."""
    args = tuple(
        p.buffers if isinstance(p, PackedParams) else p for p in params_tuple
    )
    specs = tuple(
        p.spec if isinstance(p, PackedParams) else None for p in params_tuple
    )
    return args, specs


def resolve_params(p, spec):
    """Inside a traced program: rebuild the tree from packed buffers."""
    return unpack_tree(p, spec) if spec is not None else p


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static sampling knobs (part of the jit cache key)."""

    num_frames: int = 25
    num_inference_steps: int = 25
    min_guidance_scale: float = 1.0
    max_guidance_scale: float = 3.0
    fps: int = 7
    motion_bucket_id: int = 127
    noise_aug_strength: float = 0.02
    decode_chunk_size: Optional[int] = 8
    # Memory bound for the batched VAE decode (frames per vae.apply call);
    # None = decode all full chunks in one batched call (fastest).
    max_decode_frames: Optional[int] = None
    num_cond_bbox_frames: int = 3  # stage-1 latent substitution
    control_condition_scale: float = 1.0  # stage-2 ControlNet scale

    @property
    def do_cfg(self) -> bool:
        return self.max_guidance_scale > 1.0


def encode_clip_image(image_encoder, clip_params, image, do_cfg: bool):
    """[-1,1] (B,H,W,3) -> (2B or B, 1, proj_dim) CLIP embeddings.

    CFG negative = zeros (diffusers `_encode_image` semantics).
    """
    pixel = clip_preprocess(image, image_size=image_encoder.config.image_size)
    emb = image_encoder.apply(clip_params, pixel)[:, None, :]  # (B,1,D)
    if do_cfg:
        emb = jnp.concatenate([jnp.zeros_like(emb), emb], axis=0)
    return emb


def encode_vae_image(vae, vae_params, image, noise, noise_aug_strength, do_cfg):
    """Initial frame -> VAE mode latent (no scaling_factor, SVD convention),
    with noise augmentation; CFG negative = zeros."""
    image = image + noise_aug_strength * noise
    latent = vae.apply(vae_params, image, method=vae.encode)
    if do_cfg:
        latent = jnp.concatenate([jnp.zeros_like(latent), latent], axis=0)
    return latent


def encode_vae_video(vae, vae_params, frames, do_cfg):
    """(B,F,H,W,3) conditioning frames -> (2B|B,F,h,w,4) mode latents.

    Mirrors `_encode_vae_condition` (pipeline_video_control.py:71-101):
    per-frame encode, `.mode()` (deterministic), zero negative for CFG.
    """
    b, f = frames.shape[:2]
    flat = frames.reshape((b * f,) + frames.shape[2:])
    lat = vae.apply(vae_params, flat, method=vae.encode)
    lat = lat.reshape((b, f) + lat.shape[1:])
    if do_cfg:
        lat = jnp.concatenate([jnp.zeros_like(lat), lat], axis=0)
    return lat


def get_add_time_ids(cfg: SamplingConfig, batch_size: int, do_cfg: bool):
    """(fps-1, motion_bucket_id, noise_aug) micro-conditioning rows."""
    row = jnp.asarray(
        [[cfg.fps - 1, cfg.motion_bucket_id, cfg.noise_aug_strength]], jnp.float32
    )
    ids = jnp.tile(row, (batch_size, 1))
    if do_cfg:
        ids = jnp.concatenate([ids, ids], axis=0)
    return ids


def prepare_latents(rng, batch, num_frames, h, w, channels, init_noise_sigma, dtype):
    noise = jax.random.normal(rng, (batch, num_frames, h, w, channels), dtype)
    return noise * init_noise_sigma


def guidance_linspace(cfg: SamplingConfig, batch: int, num_frames: int, minmax=None):
    """Per-frame CFG weight, (B, F, 1, 1, 1).

    `minmax` (B, 2) overrides the static config ramp per sample — this is
    how the overall pipeline batches its 5 guidance pairs into one call.
    """
    if minmax is None:
        g = jnp.linspace(cfg.min_guidance_scale, cfg.max_guidance_scale, num_frames)
        g = jnp.tile(g[None], (batch, 1))
    else:
        ramp = jnp.linspace(0.0, 1.0, num_frames)
        g = minmax[:, 0:1] + (minmax[:, 1:2] - minmax[:, 0:1]) * ramp[None]
    return g[..., None, None, None]


def decode_latents(
    vae, vae_params, latents, scaling_factor, decode_chunk_size=None,
    max_frames_per_call=None,
):
    """(B,F,h,w,4) -> (B,F,H,W,3) in [-1,1], chunked like the reference.

    The temporal decoder's frame conv sees `chunk` frames at a time, so
    decode_chunk_size is *behavioral* (reference always uses 8:
    tools/eval_overall.py:88), not just a memory knob.

    Memory: by default all full-size chunks decode as ONE batched call (the
    temporal decoder derives its clip count from bf // num_frames, so
    stacking chunks on the batch axis matches sequential decoding up to fp
    reassociation) — better MXU utilization than the reference's Python
    chunk loop. This means peak decode activation memory scales with total
    frames, NOT decode_chunk_size. `max_frames_per_call` restores a bound:
    full chunks are decoded in serial groups of at most that many frames
    (rounded down to whole chunks, min one chunk per call).
    """
    b, f = latents.shape[:2]
    latents = latents / scaling_factor
    chunk = decode_chunk_size or f
    n_full, rem = divmod(f, chunk)
    outs = []
    if n_full:
        # chunks per batched call (all of them unless a memory cap is set)
        per_call = n_full
        if max_frames_per_call:
            per_call = max(1, min(n_full, max_frames_per_call // chunk))
        for start in range(0, n_full, per_call):
            n = min(per_call, n_full - start)
            piece = latents[:, start * chunk : (start + n) * chunk]
            flat = piece.reshape((b * n * chunk,) + piece.shape[2:])
            dec = vae.apply(vae_params, flat, chunk, method=vae.decode)
            outs.append(dec.reshape((b, n * chunk) + dec.shape[1:]))
    if rem:
        piece = latents[:, n_full * chunk :]
        flat = piece.reshape((b * rem,) + piece.shape[2:])
        dec = vae.apply(vae_params, flat, rem, method=vae.decode)
        outs.append(dec.reshape((b, rem) + dec.shape[1:]))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def postprocess_frames(frames):
    """[-1,1] -> [0,1] clamp (tensor2vid 'pt' output parity)."""
    return jnp.clip(frames / 2.0 + 0.5, 0.0, 1.0)


def maybe_shard_frames(x, mesh):
    """Constrain (B, F, ...) video latents to the mesh layout.

    Under a (data, frame) mesh this keeps the scan carry resident with the
    batch (CFG*B / eval candidates) axis split across "data" and the frame
    axis split across "frame": spatial convs/attention are frame-local, and
    XLA inserts the ICI all-gather only inside the 25-token temporal
    attention (SURVEY.md §5 long-context row).

    Neither axis has to divide its mesh axis: the SPMD partitioner pads
    uneven partitions (the flagship F=25 over n_frame=2/4, and the overall
    eval's 5-candidate batch over any data axis, both hit this path —
    validated in tests/test_sharded_pipeline.py).
    """
    if mesh is None:
        return x
    from jax.sharding import PartitionSpec as P

    data = "data" if mesh.shape.get("data", 1) > 1 and x.shape[0] > 1 else None
    frame = "frame" if mesh.shape.get("frame", 1) > 1 else None
    if data is None and frame is None:
        return x
    return jax.lax.with_sharding_constraint(x, P(data, frame))
