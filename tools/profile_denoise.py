"""Per-fusion profile of the jitted ControlNet+UNet denoise step.

Makes the PERF.md trace methodology a first-class tool (it previously
lived as /tmp scripts): capture a jax.profiler device trace of N denoise
steps at the flagship shape (2x25x40x64, bf16, CFG batch), parse the
xplane proto, and aggregate device time by fusion kind+shape. This is the
measurement that drives kernel routing decisions — per-op micro-benches
are dispatch-overhead-dominated on this setup (PERF.md "methodology").

Pools are labeled by the leading op of each fusion ("fusion bf16[50,2560,320]"
etc.); the step total matches wall-clock minus the fixed tunnel dispatch.

Usage:
  python tools/profile_denoise.py [--steps 3] [--out /tmp/pools.json]
      [--attention_impl auto|xla|pallas] [--fused_resblock]
      [--resblock_sites spatial,temporal]
"""

import argparse
import collections
import functools
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 320, 512

_BUILD_CACHE = {}


def build_step():
    """Jitted ControlNet+UNet denoise step + args at the flagship shape.

    Cached per process: the un-jitted flax init dispatches thousands of
    eager ops through the 26 ms/dispatch tunnel (~minutes), so callers
    that sweep variants (sweep_compiler_options.py) must not re-init."""
    if "step" not in _BUILD_CACHE:
        _BUILD_CACHE["step"] = _build_step_uncached()
    return _BUILD_CACHE["step"]


def _build_step_uncached():
    from ctrlv_tpu.models import (
        ControlNetSpatioTemporal,
        UNetSpatioTemporalConditionModel,
        UNetSTConfig,
    )

    dtype = jnp.bfloat16
    ucfg = UNetSTConfig()
    unet = UNetSpatioTemporalConditionModel(config=ucfg, dtype=dtype)
    ctrl = ControlNetSpatioTemporal(config=ucfg, dtype=dtype)

    F = ucfg.num_frames
    h, w = H // 8, W // 8
    lat_in = jnp.zeros((2, F, h, w, ucfg.in_channels), dtype)
    cond = jnp.zeros((2, F, h, w, ucfg.in_channels // 2), dtype)
    enc = jnp.zeros((2, 1, ucfg.cross_attention_dim), dtype)
    tids = jnp.asarray([[6.0, 127.0, 0.02]] * 2, dtype)
    t = jnp.asarray(1.0, jnp.float32)

    rng = jax.random.PRNGKey(0)
    cast = lambda tr: jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tr
    )

    # ONE jitted init through the exec cache: un-jitted flax init dispatches
    # thousands of eager ops through the tunnel (measured: the r5 sweep sat
    # >25 min in init when the tunnel degraded to ~13 s/dispatch). Its own
    # entry (tag prof_init, UNPACKED outputs — the profiled step must take
    # plain param trees, not packed buffers, to keep pool baselines
    # comparable across rounds): the first profiler run per source state
    # pays one cold init compile; reruns and sweep variants hit.
    from ctrlv_tpu.utils.exec_cache import compile_cached

    def init_models(k):
        return cast(
            (unet.init(k, lat_in, t, enc, tids), ctrl.init(k, lat_in, t, enc, tids, cond))
        )

    up, cp = compile_cached(init_models, (rng,), tag="prof_init")(rng)

    # Profile under the SHIPPED sampler compiler options (vmem32 +
    # fusion-cost-model on v5e) so pool readings describe the program the
    # pipelines actually run; the sweep tool unwraps and passes its own.
    from ctrlv_tpu.utils.compile_options import get_compiler_options

    @functools.partial(jax.jit, compiler_options=get_compiler_options())
    def step(up, cp, lat_in, t, enc, tids, cond):
        down_res, mid_res = ctrl.apply(
            cp, lat_in, t, enc, tids, cond, conditioning_scale=1.0
        )
        return unet.apply(
            up,
            lat_in,
            t,
            enc,
            tids,
            down_block_additional_residuals=down_res,
            mid_block_additional_residuals=mid_res,
        )

    args = (up, cp, lat_in, t, enc, tids, cond)
    return step, args


def aggregate_xplane(trace_dir, n_steps):
    """Returns (pools_ms, instances_ms): device ms/step aggregated by
    op-kind+shape pool and by individual op instance (full HLO text)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = collections.Counter()
    inst = collections.Counter()
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                m = re.match(r"%([a-zA-Z_\-]+)[\.\d]* = (\S+?\[[\d,]*\])", name)
                key = (m.group(1) + " " + m.group(2)) if m else name[:60]
                ms = ev.duration_ps / 1e9 / n_steps
                agg[key] += ms
                inst[name] += ms
    return dict(agg), dict(inst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/pools.json")
    ap.add_argument("--trace_dir", default="/tmp/prof_denoise")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--raw", type=int, default=0, help="also print top-N op instances")
    ap.add_argument(
        "--attention_impl", default="auto", choices=["auto", "xla", "pallas"]
    )
    ap.add_argument("--fused_resblock", action="store_true")
    ap.add_argument(
        "--fused_ff", action="store_true",
        help="route FeedForward through the fused GEGLU-MLP Pallas kernel",
    )
    ap.add_argument(
        "--ff_max_cin", type=int, default=640,
        help="only route FF sites with c_in <= this (the HBM-bound shapes)",
    )
    ap.add_argument(
        "--mha_sched", default="", choices=["", "pipe3", "pipe2"],
        help="spatial-attn kernel head-pipeline schedule (ops/mha.py)",
    )
    ap.add_argument(
        "--mha_block_q", type=int, default=0,
        help="spatial-attn kernel q-tile override (0 = auto)",
    )
    args = ap.parse_args()

    if args.mha_sched or args.mha_block_q:
        from ctrlv_tpu.ops.mha import set_mha_tuning

        set_mha_tuning(args.mha_sched or "pipe3", args.mha_block_q)

    if args.attention_impl != "auto":
        from ctrlv_tpu.ops import set_attention_impl

        set_attention_impl(args.attention_impl)
    if args.fused_resblock:
        from ctrlv_tpu.ops.resblock import set_fused_resblock

        set_fused_resblock(True)
    if args.fused_ff:
        from ctrlv_tpu.ops.geglu_ff import set_fused_geglu_ff

        set_fused_geglu_ff(True, max_cin=args.ff_max_cin)

    step, sargs = build_step()
    t0 = time.time()
    np.asarray(step(*sargs))
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    np.asarray(step(*sargs))  # materialize once (tunnel semantics)

    t0 = time.time()
    for _ in range(5):
        out = step(*sargs)
    jax.block_until_ready(out)
    wall_ms = (time.time() - t0) / 5 * 1e3
    print(f"wall per step: {wall_ms:.1f} ms", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            out = step(*sargs)
        jax.block_until_ready(out)

    pools, inst = aggregate_xplane(args.trace_dir, args.steps)
    total = sum(pools.values())
    print(f"device total per step: {total:.1f} ms")
    for k, v in sorted(pools.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v:8.2f} ms  {k}")
    if args.raw:
        print("---- top instances (full HLO text) ----")
        for k, v in sorted(inst.items(), key=lambda kv: -kv[1])[: args.raw]:
            print(f"{v:8.2f} ms  {k[:400]}")
    with open(args.out, "w") as f:
        json.dump({"pools": pools, "instances": inst}, f, indent=1)
    print(f"pools -> {args.out}")


if __name__ == "__main__":
    main()
