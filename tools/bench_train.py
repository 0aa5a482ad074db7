"""Training-throughput benchmark at full SVD-XT size on one real chip.

VERDICT r2 missing #3: the reference's primary workload is *training*
(batch 1 x grad-accum 5, 25 frames, 512x320 —
/root/reference/scripts/train_scripts/demo_train_video_box2video.sh), but
bench.py measures inference only. This tool measures s/step + MFU for the
training regimes on the real TPU and emits one JSON line per regime:

  controlnet    — ControlNet trainable, UNet/VAE/CLIP frozen (§3.2), AdamW
  controlnet-af — same with adafactor (factored nu: the 16 GB-chip point)
  temporal      — SVD UNet, temporal-transformer-blocks-only subset (§3.1)
  lora          — rank-4 LoRA on to_q/k/v/out_0 (reference LoRA workload)
  full          — SVD UNet full finetune, AdamW mu_dtype=bf16 (feasibility)
  full-split    — full finetune via the TWO-program split step (the regime
                  that actually runs on this host; PERF.md round-5)
  temporal-split — temporal regime via the split (isolates the split cost)
  full-af       — SVD UNet full finetune, adafactor (memory-lean fallback)

Numbers land in PERF.md + BENCH_TRAIN.json. Random weights: wall-clock is
independent of weight values; the compute graph is identical.

Usage: python tools/bench_train.py [--regime all|controlnet|temporal|full|full-af]
       [--accum 5] [--measure_steps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 320, 512
V5E_PEAK_BF16 = 197e12


def _cast_bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def _count_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


# remat granularity of the last build_models call — part of the training
# exec-cache key (the step closure bakes it in; avals don't see it)
_REMAT_TAG = ["block"]


def build_models(remat_granularity="block"):
    _REMAT_TAG[0] = remat_granularity
    from ctrlv_tpu.models import (
        AutoencoderKLTemporalDecoder,
        CLIPVisionConfig,
        CLIPVisionModelWithProjection,
        ControlNetSpatioTemporal,
        UNetSpatioTemporalConditionModel,
        UNetSTConfig,
        VAEConfig,
    )

    dtype = jnp.bfloat16
    ucfg = UNetSTConfig()
    unet = UNetSpatioTemporalConditionModel(
        config=ucfg, dtype=dtype, gradient_checkpointing=True,
        remat_granularity=remat_granularity,
    )
    ctrl = ControlNetSpatioTemporal(
        config=ucfg, dtype=dtype, gradient_checkpointing=True,
        remat_granularity=remat_granularity,
    )
    vae = AutoencoderKLTemporalDecoder(config=VAEConfig(), dtype=dtype)
    clip = CLIPVisionModelWithProjection(config=CLIPVisionConfig(), dtype=dtype)

    F = ucfg.num_frames
    h, w = H // 8, W // 8
    sample = jnp.zeros((1, F, h, w, ucfg.in_channels), dtype)
    cond = jnp.zeros((1, F, h, w, ucfg.in_channels // 2), dtype)
    enc = jnp.zeros((1, 1, ucfg.cross_attention_dim), dtype)
    tids = jnp.asarray([[6.0, 127.0, 0.02]], dtype)
    t = jnp.asarray(1.0, jnp.float32)
    rng = jax.random.PRNGKey(0)

    unet_params = jax.jit(lambda k: _cast_bf16(unet.init(k, sample, t, enc, tids)))(rng)
    ctrl_params = jax.jit(
        lambda k: _cast_bf16(ctrl.init(k, sample, t, enc, tids, cond))
    )(rng)
    vae_params = jax.jit(
        lambda k: _cast_bf16(vae.init(k, jnp.zeros((1, H, W, 3), dtype)))
    )(rng)
    clip_params = jax.jit(
        lambda k: _cast_bf16(clip.init(k, jnp.zeros((1, 224, 224, 3), dtype)))
    )(rng)
    jax.block_until_ready((unet_params, ctrl_params, vae_params, clip_params))
    try:
        ms = jax.local_devices()[0].memory_stats()
        print(
            json.dumps(
                {
                    "hbm_after_init_gb": round(ms.get("bytes_in_use", 0) / 2**30, 2),
                    "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 2**30, 2),
                }
            ),
            flush=True,
        )
    except Exception:
        pass
    return dict(
        unet=unet, ctrl=ctrl, vae=vae, clip=clip, F=F,
        unet_params=unet_params, ctrl_params=ctrl_params,
        vae_params=vae_params, clip_params=clip_params,
    )


def make_batch(F, seed=7):
    clips = jax.random.uniform(
        jax.random.PRNGKey(seed), (1, F, H, W, 3), jnp.float32, -1, 1
    )
    bbox = jax.random.uniform(
        jax.random.PRNGKey(seed + 1), (1, F, H, W, 3), jnp.float32, -1, 1
    )
    return clips, bbox


def profile_steps(run_one, n_steps=3, trace_dir="/tmp/prof_train"):
    """xplane device trace of a training step (VERDICT r4 #4: nothing
    previously profiled the backward). `run_one(i)` executes one step and
    returns a scalar-able metric to fence on. Reuses profile_denoise's
    pool aggregation; prints the top pools and returns them."""
    from profile_denoise import aggregate_xplane

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            metric = run_one(i)
        # fence inside the trace so queued device work lands in it
        float(metric)
    pools, inst = aggregate_xplane(trace_dir, n_steps)
    total = sum(pools.values())
    print(f"train-step device total: {total:.1f} ms", flush=True)
    for k, v in sorted(pools.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{v:8.2f} ms  {k}")
    with open(os.path.join(trace_dir, "pools.json"), "w") as f:
        json.dump({"pools": pools, "instances": inst}, f, indent=1)
    return pools


def bench_regime(m, regime, accum, measure_steps, analyze_only=False, enc_chunk=5,
                 profile_dir=None):
    import optax

    from ctrlv_tpu.train import (
        make_controlnet_train_step,
        make_optimizer,
        make_svd_train_step,
        split_trainable,
        temporal_blocks_predicate,
    )
    from ctrlv_tpu.train.state import init_train_state

    clips, bbox = make_batch(m["F"])

    # Encoder chunking bounds the VAE full-res activation spike (the 25x
    # 320x512 encode otherwise holds >1 GB per conv output alongside the
    # UNet fwd+bwd) — see train_step._vae_encode_frames.
    ENC_CHUNK = enc_chunk
    opt_kwargs = dict(learning_rate=1e-5, nan_guard_steps=0)
    tail = ()
    if regime == "controlnet":
        # fp32 AdamW nu on the 0.7B ControlNet is 2.7 GB and the MultiSteps
        # accumulator another 1.4 — with the frozen UNet resident this
        # regime is the tightest; bf16 first moment claws half of mu back.
        tx = make_optimizer(mu_dtype="bfloat16", **opt_kwargs)
        trainable = m["ctrl_params"]
    elif regime == "controlnet-af":
        # adafactor feasibility point: factored second moment ~= params/row
        tx = make_optimizer(optimizer="adafactor", **opt_kwargs)
        trainable = m["ctrl_params"]
    elif regime == "temporal":
        # partitioned subset: grads + moments only for the temporal blocks
        tx = make_optimizer(mu_dtype="bfloat16", **opt_kwargs)
        trainable = split_trainable(m["unet_params"], temporal_blocks_predicate)
        tail = (m["unet_params"],)
    elif regime == "lora":
        # reference LoRA workload: rank-4 on to_q/k/v/out_0
        # (/root/reference/tools/train_video_diffusion.py:127-137); trainable
        # tree is tiny so f32 moments are free
        from ctrlv_tpu.train import lora_init

        tx = make_optimizer(**opt_kwargs)
        trainable = lora_init(jax.random.PRNGKey(42), m["unet_params"]["params"])
        tail = (m["unet_params"],)
    elif regime == "full":
        tx = make_optimizer(mu_dtype="bfloat16", **opt_kwargs)
        trainable = m["unet_params"]
    elif regime == "full-af":
        tx = make_optimizer(optimizer="adafactor", **opt_kwargs)
        trainable = m["unet_params"]
    else:
        raise ValueError(regime)

    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)

    if regime.startswith("controlnet"):
        step_fn = make_controlnet_train_step(
            m["unet"], m["ctrl"], m["vae"], m["clip"], tx,
            conditioning_dropout_prob=0.1, encode_chunk=ENC_CHUNK,
        )
        extra = (m["unet_params"], m["vae_params"], m["clip_params"])
        batch_argnums = (4, 5)  # clips, bbox are consumed — donate the HBM
    else:
        step_fn = make_svd_train_step(
            m["unet"], m["vae"], m["clip"], tx, conditioning_dropout_prob=0.1,
            partitioned=(regime == "temporal"), lora=(regime == "lora"),
            encode_chunk=ENC_CHUNK,
        )
        extra = (m["vae_params"], m["clip_params"])
        batch_argnums = (3, 4)

    state = init_train_state(trainable, tx)
    jit_step = jax.jit(step_fn, donate_argnums=(0,) + batch_argnums)
    # Cross-process executable cache (VERDICT r4 #7): training programs
    # paid 202-862 s compile per regime per process, making training
    # benches un-rerunnable inside a round budget. Key on the regime +
    # bench knobs (qualname/avals alone would collide full vs full-af —
    # same step shape, different optimizer baked into the closure).
    from ctrlv_tpu.ops import get_attention_impl
    from ctrlv_tpu.utils.exec_cache import compile_cached

    cache_key = (
        f"{regime}|accum{accum}|attn={get_attention_impl()}"
        f"|enc{enc_chunk}|{_REMAT_TAG[0]}"
    )

    def compile_step():
        return compile_cached(
            step_fn,
            (state, *extra, clips, bbox, jax.random.PRNGKey(1), *tail),
            tag=f"train_{regime}",
            key_extra=cache_key,
            donate_argnums=(0,) + batch_argnums,
        )

    if analyze_only:
        t0 = time.time()
        compiled = jit_step.lower(
            state, *extra, clips, bbox, jax.random.PRNGKey(1), *tail
        ).compile()
        ma = compiled.memory_analysis()
        out = {"regime": regime, "compile_s": round(time.time() - t0, 1)}
        for k in (
            "temp_size_in_bytes",
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "generated_code_size_in_bytes",
            "alias_size_in_bytes",
        ):
            try:
                out[k.replace("_in_bytes", "_gb")] = round(
                    getattr(ma, k) / 2**30, 2
                )
            except Exception:
                pass
        return out

    # AOT-compile once (through the exec cache); execute the same
    # executable for the timed calls.
    t0 = time.time()
    compiled = compile_step()
    compile_s = time.time() - t0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")

    state, metrics = compiled(state, *extra, clips, bbox, jax.random.PRNGKey(1), *tail)
    loss0 = float(metrics["loss"])  # host transfer: flushes the axon queue

    times = []
    for i in range(measure_steps):
        clips, bbox = make_batch(m["F"], seed=11 + i)  # fresh (donated) batch
        t0 = time.time()
        state, metrics = compiled(
            state, *extra, clips, bbox, jax.random.PRNGKey(2 + i), *tail
        )
        # fence on a host transfer, not block_until_ready (axon returns
        # early from block on AOT executables — PERF.md round-4)
        float(metrics["loss"])
        times.append(time.time() - t0)
    micro_s = min(times)
    mfu = flops / micro_s / V5E_PEAK_BF16 if flops == flops else float("nan")

    if profile_dir:
        def run_one(i):
            nonlocal state
            c, b = make_batch(m["F"], seed=50 + i)
            state, mets = compiled(
                state, *extra, c, b, jax.random.PRNGKey(70 + i), *tail
            )
            return mets["loss"]

        profile_steps(run_one, trace_dir=profile_dir)

    n_train = _count_params(state.params)
    return {
        "regime": regime,
        "attention_impl": get_attention_impl(),
        "sec_per_micro_step": round(micro_s, 3),
        "sec_per_opt_step": round(micro_s * accum, 3),
        "accum": accum,
        "mfu": round(mfu, 3) if mfu == mfu else None,
        "tflop_per_micro_step": round(flops / 1e12, 1) if flops == flops else None,
        "compile_s": round(compile_s, 1),
        "trainable_params_m": round(n_train / 1e6, 1),
        "loss_first_step": round(loss0, 4),
        "device": str(jax.devices()[0]),
    }


def bench_full_split(m, measure_steps, enc_chunk=5, analyze_only=False, regime="full-split"):
    """Training via the TWO-program split step (VERDICT r3 #5).

    full-split: the axon compile helper crashes on the monolithic
    full-finetune fwd+bwd+optimizer program (PERF.md round-3, environment
    limit); the split compiles fwd+bwd and the optimizer update as
    separate programs (~half the MLIR each — see PERF.md round-4) at the
    cost of one extra dispatch and a grads round-trip through HBM.
    Optimizer is adafactor: with AdamW the 9 GB mu+nu would sit resident
    in HBM during the grad program alongside its ~14 GB peak and overflow
    the 15.75 GB chip.

    temporal-split: the same split on the temporal regime, which ALSO
    compiles monolithically — measuring both isolates the split's
    grads-round-trip + extra-dispatch cost (VERDICT r4 #4).
    """
    from ctrlv_tpu.train import (
        make_optimizer,
        make_svd_grad_step,
        make_update_step,
        split_trainable,
        temporal_blocks_predicate,
    )
    from ctrlv_tpu.train.state import init_train_state

    clips, bbox = make_batch(m["F"])
    tail = ()
    if regime == "temporal-split":
        tx = make_optimizer(
            mu_dtype="bfloat16", learning_rate=1e-5, nan_guard_steps=0
        )
        trainable = split_trainable(m["unet_params"], temporal_blocks_predicate)
        tail = (m["unet_params"],)
        grad_fn = make_svd_grad_step(
            m["unet"], m["vae"], m["clip"], partitioned=True,
            conditioning_dropout_prob=0.1, encode_chunk=enc_chunk,
        )
    else:
        tx = make_optimizer(
            optimizer="adafactor", learning_rate=1e-5, nan_guard_steps=0
        )
        trainable = m["unet_params"]
        grad_fn = make_svd_grad_step(
            m["unet"], m["vae"], m["clip"],
            conditioning_dropout_prob=0.1, encode_chunk=enc_chunk,
        )
    upd_fn = make_update_step(tx)
    state = init_train_state(trainable, tx)

    from ctrlv_tpu.utils.exec_cache import compile_cached

    jit_upd = jax.jit(upd_fn, donate_argnums=(0, 1))
    # attention impl is process-global state the closure hash can't see —
    # omit it here and an --attention_impl run silently cache-HITs an
    # executable compiled for the OTHER impl (bench_regime's key already
    # includes it)
    from ctrlv_tpu.ops import get_attention_impl

    split_key = f"{regime}|enc{enc_chunk}|{_REMAT_TAG[0]}|attn={get_attention_impl()}"

    t0 = time.time()
    compiled_g = compile_cached(
        grad_fn,
        (state.params, m["vae_params"], m["clip_params"], clips, bbox,
         jax.random.PRNGKey(0), *tail),
        tag=f"train_{regime}_grad",
        key_extra=split_key,
        donate_argnums=(3, 4),
    )
    compile_s = time.time() - t0

    if analyze_only:
        compiled_u = jit_upd.lower(
            state, jax.tree.map(lambda x: x, state.params)
        ).compile()
        out = {"regime": regime,
               "compile_s": round(time.time() - t0, 1)}
        for tag, c in (("grad", compiled_g), ("update", compiled_u)):
            ma = c.memory_analysis()
            out[f"{tag}_temp_gb"] = round(ma.temp_size_in_bytes / 2**30, 2)
            out[f"{tag}_arg_gb"] = round(ma.argument_size_in_bytes / 2**30, 2)
        return out

    try:
        ca = compiled_g.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        flops = float("nan")

    # Sequence the warmups: run the grad program ONCE (and fence on the
    # loss transfer) before even compiling the update program. The grad
    # program's 6.25 GB temp peak + ~2.8 GB grads output + 4 GB resident
    # args leave <3 GB of the 15.75 GB chip free; instantiating BOTH
    # executables' on-device workspaces before the first grad exec is a
    # measured deterministic RESOURCE_EXHAUSTED, while this ordering fits
    # (probe, PERF.md round-5 full-finetune section).
    loss, grads = compiled_g(
        state.params, m["vae_params"], m["clip_params"], clips, bbox,
        jax.random.PRNGKey(1), *tail,
    )
    loss0_fence = float(loss)
    t0 = time.time()
    compiled_u = compile_cached(
        upd_fn,
        (state, jax.tree.map(lambda x: x, state.params)),
        tag=f"train_{regime}_upd",
        key_extra=split_key,
        donate_argnums=(0, 1),
    )
    compile_s += time.time() - t0
    state, metrics = compiled_u(state, grads)
    # Fence on a host transfer, not block_until_ready: axon's block returns
    # early on freshly AOT-compiled executables while deferred work is
    # queued (PERF.md round-4 exec-cache section). grad_norm depends on the
    # whole grad program; state.step transfers fence the update program.
    loss0 = loss0_fence
    float(metrics["grad_norm"]); int(state.step)
    # Drop the grads binding between micro-steps: holding the previous
    # iteration's 2.8 GB grad tree across the next grad exec is a measured
    # deterministic OOM on the 15.75 GB chip (the update does not get to
    # donate it — metrics has no grads-shaped output to alias).
    del grads
    out = {"regime": regime, "compile_s": round(compile_s, 1)}

    times = []
    for i in range(measure_steps):
        clips, bbox = make_batch(m["F"], seed=11 + i)
        t0 = time.time()
        loss, grads = compiled_g(
            state.params, m["vae_params"], m["clip_params"], clips, bbox,
            jax.random.PRNGKey(2 + i), *tail,
        )
        state, metrics = compiled_u(state, grads)
        del grads
        float(metrics["grad_norm"]); int(state.step)
        times.append(time.time() - t0)
    micro_s = min(times)
    mfu = flops / micro_s / V5E_PEAK_BF16 if flops == flops else float("nan")
    out.update(
        sec_per_micro_step=round(micro_s, 3),
        mfu=round(mfu, 3) if mfu == mfu else None,
        tflop_per_micro_step=round(flops / 1e12, 1) if flops == flops else None,
        trainable_params_m=round(_count_params(state.params) / 1e6, 1),
        loss_first_step=round(loss0, 4),
        grad_norm=round(float(metrics["grad_norm"]), 3),
        device=str(jax.devices()[0]),
    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regime", default="all")
    ap.add_argument("--accum", type=int, default=5)
    ap.add_argument("--measure_steps", type=int, default=3)
    ap.add_argument("--out", default=None)
    # VERDICT r2 #10: keep kernels honest under training — the MHA custom_vjp
    # recomputes the forward via XLA in the backward; measure auto vs xla.
    ap.add_argument("--attention_impl", default="auto", choices=["auto", "xla", "pallas"])
    # compile-only: print XLA's memory analysis (temp/arg/output GB) and exit
    ap.add_argument("--analyze", action="store_true")
    ap.add_argument("--enc_chunk", type=int, default=5)
    # xplane device trace of the measured step (single-regime runs only);
    # pools print + land in <dir>/pools.json
    ap.add_argument("--profile", default=None, metavar="TRACE_DIR")
    # "sub" remats each ResBlock/transformer individually: lower bwd peak
    # memory (the single-chip full-size knob) at more recompute
    ap.add_argument("--remat", default="block", choices=["block", "sub"])
    args = ap.parse_args()

    if args.attention_impl != "auto":
        from ctrlv_tpu.ops import set_attention_impl

        set_attention_impl(args.attention_impl)

    regimes = (
        ["controlnet", "controlnet-af", "temporal", "lora", "full", "full-af"]
        if args.regime == "all"
        else [args.regime]
    )
    m = build_models(remat_granularity=args.remat)
    results = []
    if args.profile and (len(regimes) != 1 or regimes[0].endswith("-split")):
        print(
            "WARNING: --profile only traces a SINGLE non-split regime "
            "(the -split path runs two separate executables whose "
            "interleaving the single-step tracer would misattribute); "
            "no trace will be written",
            file=sys.stderr, flush=True,
        )
    for regime in regimes:
        try:
            if regime.endswith("-split"):
                r = bench_full_split(
                    m, args.measure_steps,
                    enc_chunk=args.enc_chunk, analyze_only=args.analyze,
                    regime=regime,
                )
            else:
                r = bench_regime(
                    m, regime, args.accum, args.measure_steps,
                    analyze_only=args.analyze, enc_chunk=args.enc_chunk,
                    profile_dir=args.profile if len(regimes) == 1 else None,
                )
        except Exception as e:  # OOM etc: record, keep going
            r = {"regime": regime, "error": f"{type(e).__name__}: {str(e)[:2000]}"}
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
