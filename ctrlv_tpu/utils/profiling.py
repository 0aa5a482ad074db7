"""Tracing / profiling utilities (SURVEY.md §5: absent in the reference —
tqdm bars only; table stakes for the TPU rebuild).

- `trace(dir)`: context manager around jax.profiler for TensorBoard traces.
- `StepTimer`: wall-clock per-step timing with warmup exclusion and
  percentile summaries (device sync included via block_until_ready hooks).
- `annotate(name)`: TraceAnnotation passthrough for profiler-visible spans.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace if log_dir is set, else no-op."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "min_s": float(arr.min()),
        }
