"""Bisect the sampler's cold-compile time (VERDICT r2 weak #2).

BENCH_r01 cold compile_s=128 -> BENCH_r02 compile_s=305 for the same
full-size Box2Video program. Suspects: the Pallas MHA kernels' Mosaic
custom-call lowering (routed on in r2), the batched chunk decode, head
pipelining. This tool compiles the full sampler with each feature toggled
and a DISABLED persistent cache, printing per-config lower+compile seconds.

Usage: python tools/compile_bisect.py [--configs auto,xla,seqdecode]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# NO persistent cache: measure true cold compile each time.

H, W = 320, 512
STEPS = 25


def build(max_decode_frames=None):
    from ctrlv_tpu.models import (
        AutoencoderKLTemporalDecoder,
        CLIPVisionConfig,
        CLIPVisionModelWithProjection,
        ControlNetSpatioTemporal,
        UNetSpatioTemporalConditionModel,
        UNetSTConfig,
        VAEConfig,
    )
    from ctrlv_tpu.pipelines import StableVideoControlPipeline

    dtype = jnp.bfloat16
    ucfg = UNetSTConfig()
    unet = UNetSpatioTemporalConditionModel(config=ucfg, dtype=dtype)
    ctrl = ControlNetSpatioTemporal(config=ucfg, dtype=dtype)
    vae = AutoencoderKLTemporalDecoder(config=VAEConfig(), dtype=dtype)
    clip = CLIPVisionModelWithProjection(config=CLIPVisionConfig(), dtype=dtype)

    # eval_shape params: compile doesn't need real weights
    F = ucfg.num_frames
    h, w = H // 8, W // 8
    sample = jnp.zeros((2, F, h, w, ucfg.in_channels), dtype)
    cond = jnp.zeros((2, F, h, w, ucfg.in_channels // 2), dtype)
    enc = jnp.zeros((2, 1, ucfg.cross_attention_dim), dtype)
    tids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, dtype)
    t = jnp.asarray(1.0, jnp.float32)
    rng = jax.random.PRNGKey(0)

    up = jax.eval_shape(lambda k: unet.init(k, sample, t, enc, tids), rng)
    cp = jax.eval_shape(lambda k: ctrl.init(k, sample, t, enc, tids, cond), rng)
    vp = jax.eval_shape(lambda k: vae.init(k, jnp.zeros((1, H, W, 3), dtype)), rng)
    clp = jax.eval_shape(lambda k: clip.init(k, jnp.zeros((1, 224, 224, 3), dtype)), rng)

    pipe = StableVideoControlPipeline(unet, None, ctrl, None, vae, None, clip, None)
    cfgkw = dict(
        num_frames=F, num_inference_steps=STEPS,
        min_guidance_scale=1.0, max_guidance_scale=3.0, decode_chunk_size=8,
        max_decode_frames=max_decode_frames,
    )
    from ctrlv_tpu.pipelines.common import SamplingConfig

    scfg = SamplingConfig(**cfgkw)
    fn = pipe._sample_fn(scfg, cond_is_latent=False)
    image = jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32)
    cond_images = jax.ShapeDtypeStruct((1, F, H, W, 3), jnp.float32)
    rngs = jax.ShapeDtypeStruct((2,), jnp.uint32)
    gmm = jax.ShapeDtypeStruct((1, 2), jnp.float32)
    return fn, (up, cp, vp, clp, image, cond_images, rngs, gmm)


def timed_compile(label, max_decode=None):
    from ctrlv_tpu.ops import get_attention_impl

    fn, args = build(max_decode_frames=max_decode)
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    lower_s = time.time() - t0
    t0 = time.time()
    lowered.compile()
    compile_s = time.time() - t0
    print(
        json.dumps(
            {
                "config": label,
                "attention_impl": get_attention_impl(),
                "lower_s": round(lower_s, 1),
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="auto", choices=["auto", "xla", "seqdecode"])
    args = ap.parse_args()

    if args.config == "xla":
        # "xla" turns OFF all Pallas MHA kernels (models/layers.py:226-236)
        from ctrlv_tpu.ops import set_attention_impl

        set_attention_impl("xla")
        timed_compile("xla-attention")
    elif args.config == "seqdecode":
        # batched decode off: max_decode_frames=8 forces per-chunk calls
        timed_compile("sequential-decode", max_decode=8)
    else:
        timed_compile("auto (shipping config)")


if __name__ == "__main__":
    main()
