"""Headline benchmark: 25-frame 512x320 Box2Video clip generation, one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Protocol mirrors the reference's metric workload (SURVEY.md §3.3 /
BASELINE.md): StableVideoControlPipeline with CFG (guidance 1->3), 25
Euler steps, ControlNet+UNet per step, chunked VAE decode (8). Weights are
random (generation quality is irrelevant to wall-clock; the compute graph
is identical). vs_baseline compares against an estimated A100 fp16
wall-clock for the same workload (~18 s/clip: SVD-XT 25-step 25-frame at
320x512 with a ControlNet branch); >1.0 means faster than the estimate.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_EST_SEC_PER_CLIP = 18.0
STEPS = 25
H, W = 320, 512


def main():
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
    vcfg = VAEConfig()
    ccfg = CLIPVisionConfig()
    unet = UNetSpatioTemporalConditionModel(config=ucfg, dtype=dtype)
    ctrl = ControlNetSpatioTemporal(config=ucfg, dtype=dtype)
    vae = AutoencoderKLTemporalDecoder(config=vcfg, dtype=dtype)
    clip = CLIPVisionModelWithProjection(config=ccfg, dtype=dtype)

    rng = jax.random.PRNGKey(0)
    F = ucfg.num_frames
    h, w = H // vcfg.spatial_scale, W // vcfg.spatial_scale
    sample = jnp.zeros((2, F, h, w, ucfg.in_channels), dtype)
    cond = jnp.zeros((2, F, h, w, ucfg.in_channels // 2), dtype)
    enc = jnp.zeros((2, 1, ucfg.cross_attention_dim), dtype)
    tids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, dtype)
    t = jnp.asarray(1.0, jnp.float32)

    t0 = time.time()
    def cast_bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
        )

    # init in bf16 storage: fp32 params for these four models are ~11.3 GB
    # and blow the 16 GB HBM together with the program workspace. ONE merged
    # init program through the cross-process executable cache
    # (utils/exec_cache.py): four separate jits cost four driver-visible
    # cold compiles on this 1-core host (init_s 35.3 s in BENCH_r03).
    # PACKED outputs (utils/packed_params.py): the init returns one flat
    # bf16 buffer per model instead of ~2800 param tensors — a cached
    # executable's remote instantiation scales with output count
    # (~120-150 s on a hit for the 2800-output form; PERF.md round-5) —
    # and the sampler unpacks the tree inside its own traced program.
    from ctrlv_tpu.utils.packed_params import packed_init

    def init_all(k):
        return cast_bf16(
            (
                unet.init(k, sample, t, enc, tids),
                ctrl.init(k, sample, t, enc, tids, cond),
                vae.init(k, jnp.zeros((1, H, W, 3), dtype)),
                clip.init(k, jnp.zeros((1, 224, 224, 3), dtype)),
            )
        )

    unet_params, ctrl_params, vae_params, clip_params = packed_init(
        init_all, (rng,), tag="bench_init_packed"
    )
    # Materialize ONE scalar to force the init program: under the axon
    # tunnel, block_until_ready returns early while deferred compile /
    # executable upload is still queued (measured: a "blocked" cold jit
    # returned in 0.00 s while the real work ran 208 s at host transfer —
    # PERF.md round-4). A host transfer is the only honest fence; all
    # outputs of one executable complete together, so one leaf suffices.
    np.asarray(jnp.sum(unet_params.buffers["bfloat16"][:8].astype(jnp.float32)))
    init_s = time.time() - t0
    pipe = StableVideoControlPipeline(
        unet, unet_params, ctrl, ctrl_params, vae, vae_params, clip, clip_params
    )
    image = jnp.zeros((1, H, W, 3), jnp.float32)
    cond_images = jnp.zeros((1, F, H, W, 3), jnp.float32)

    def run(seed):
        return pipe(
            image,
            cond_images,
            rng=jax.random.PRNGKey(seed),
            num_frames=F,
            num_inference_steps=STEPS,
            min_guidance_scale=1.0,
            max_guidance_scale=3.0,
            decode_chunk_size=8,
        )

    def run_fenced(seed):
        # Time against a host-materialized scalar, not block_until_ready:
        # axon's block returns early on freshly (de)serialized executables
        # (see init comment). The 4-byte transfer + one eager-sum dispatch
        # cost ~26 ms — noise against an 11 s clip — and the checksum
        # doubles as a finiteness check that the clip really was computed.
        checksum = float(np.asarray(jnp.sum(run(seed))))
        if not (checksum == checksum):  # NaN guard
            raise RuntimeError(f"non-finite clip checksum at seed {seed}")
        return checksum

    t0 = time.time()
    run_fenced(0)  # compile (or cache-load) + first run
    compile_s = time.time() - t0

    times = []
    for i in range(1, 3):
        t0 = time.time()
        run_fenced(i)
        times.append(time.time() - t0)
    sec_per_clip = min(times)

    print(
        json.dumps(
            {
                "metric": "box2video_25f_512x320_sec_per_clip",
                "value": round(sec_per_clip, 3),
                "unit": "s/clip",
                "vs_baseline": round(A100_EST_SEC_PER_CLIP / sec_per_clip, 3),
                "detail": {
                    "steps": STEPS,
                    "init_s": round(init_s, 1),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
