"""Sweep XLA compiler options on the jitted ControlNet+UNet denoise step.

PERF.md round-3 candidate #3: per-compile `compiler_options` (jax 0.9
`jax.jit(..., compiler_options=...)`) let us A/B XLA:TPU backend flags
without restarting the process or touching XLA_FLAGS — the axon remote
compile helper forwards them with the HLO. Each variant pays one full
tunnel compile (~1-3 min); the baseline is measured first AND last so
run-to-run drift brackets every reading.

Reference role: the hand-tuned cuDNN/xformers environment knobs of the
torch stack (/root/reference/tools/train_video_diffusion.py:142-153) —
here the equivalent lever is the XLA backend configuration.

Usage:
  python tools/sweep_compiler_options.py [--steps 5] [--out /tmp/sweep.json]
      [--only name1,name2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from profile_denoise import build_step

# Candidate sets, expected-value ordered. Values are strings (the PJRT
# compile-options env format). Unknown-flag failures are recorded, not
# fatal.
VARIANTS = [
    ("base", {}),
    ("vmem32", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem96", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "True"}),
    ("fusion_cost", {"xla_tpu_enable_experimental_fusion_cost_model": "True"}),
    (
        "licm15",
        {"xla_tpu_licm_size_inflation_ratio": "1.5"},
    ),
    # combined variants: each candidate ON TOP of the shipped vmem32
    # default (utils/compile_options.py) — the question that matters now
    # is whether they stack with it, not whether they beat XLA defaults
    ("lhs+vmem32", {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_enable_latency_hiding_scheduler": "True",
    }),
    ("fusion_cost+vmem32", {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_enable_experimental_fusion_cost_model": "True",
    }),
    ("licm15+vmem32", {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_licm_size_inflation_ratio": "1.5",
    }),
    # if lhs and fusion_cost each stack with vmem32, ask whether they
    # stack with each other before shipping a new default
    ("lhs+fc+vmem32", {
        "xla_tpu_scoped_vmem_limit_kib": "32768",
        "xla_tpu_enable_latency_hiding_scheduler": "True",
        "xla_tpu_enable_experimental_fusion_cost_model": "True",
    }),
    ("base_end", {}),
]


def time_variant(name, opts, steps):
    step, sargs = build_step()
    fn = jax.jit(getattr(step, "__wrapped__", step), compiler_options=opts or None)
    t0 = time.time()
    np.asarray(fn(*sargs))
    compile_s = time.time() - t0
    np.asarray(fn(*sargs))  # settle tunnel queueing
    t0 = time.time()
    for _ in range(steps):
        out = fn(*sargs)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / steps * 1e3
    return {"name": name, "opts": opts, "ms_per_step": round(ms, 1), "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/sweep.json")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    only = set(filter(None, args.only.split(",")))
    results = []
    for name, opts in VARIANTS:
        if only and name not in only:
            continue
        try:
            r = time_variant(name, opts, args.steps)
        except Exception as e:  # record unknown-flag/compile failures
            r = {"name": name, "opts": opts, "error": f"{type(e).__name__}: {e}"[:300]}
        results.append(r)
        print(json.dumps(r), flush=True)
        # incremental write: a timeout must not lose completed variants
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
