"""Process-wide XLA compiler options for the big jitted programs.

tools/sweep_compiler_options.py A/Bs XLA:TPU backend flags on the denoise
step (the reference's analog is the hand-tuned cuDNN/xformers env knobs,
/root/reference/tools/train_video_diffusion.py:142-153). Whatever the sweep
proves out lands here as the default for the sampler pipelines; callers can
override per-process with set_compiler_options() and restore the measured
defaults with reset_compiler_options().

Options apply only where they are measured to matter (the sampler jits in
pipelines/video_{control,diffusion}.py); small programs keep XLA defaults.
An empty dict means "XLA defaults" and is passed to jax.jit as None.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

# Proved out by tools/sweep_compiler_options.py on TPU v5e (see PERF.md
# round-3 sweep table): raising the scoped-VMEM budget to 32 MiB is worth
# ~2% on the denoise step (456.0 vs 465.2 ms/step; 64/96 MiB regress to
# 472/477). The round-5 sweep measured every remaining variant: the
# experimental fusion cost model stacks −8 ms on the ISOLATED denoise
# step (448.9 vs 456.8) but REGRESSES the full jitted sampler by
# +0.15-0.25 s/clip (same-hour bench A/B, PERF.md round-5) — different
# fusion choices inside the scan/decode context — so it is NOT shipped.
# lhs and licm15 measured neutral alone and stacked. The knob is
# sensitive and was measured single-chip on v5e ONLY, so it is gated on
# the measured device kind — other TPU generations (with different VMEM
# sizes) keep XLA defaults until a sweep proves them out.
# Explicit set_compiler_options() always wins.
_TPU_DEFAULTS: Dict[str, str] = {"xla_tpu_scoped_vmem_limit_kib": "32768"}
# device_kind substrings the default was measured on ("TPU v5 lite" is the
# v5e; axon reports device_kind "TPU v5 lite").
_MEASURED_DEVICE_KINDS = ("v5 lite", "v5e")

_OPTIONS: Dict[str, str] = {}
_EXPLICIT = False


def set_compiler_options(options: Optional[Dict[str, str]]) -> None:
    """Replace the sampler compiler options (None or {} -> XLA defaults).

    This latches an explicit choice: after set_compiler_options(None) the
    pipelines use plain XLA defaults even on a measured TPU. To restore the
    automatic measured-default behavior, call reset_compiler_options().
    """
    global _OPTIONS, _EXPLICIT
    _OPTIONS = dict(options or {})
    _EXPLICIT = True


def reset_compiler_options() -> None:
    """Clear any explicit override and restore the measured TPU defaults."""
    global _OPTIONS, _EXPLICIT
    _OPTIONS = {}
    _EXPLICIT = False


def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.lower()
    except Exception:  # pragma: no cover - backend init failure
        return ""


def get_compiler_options() -> Optional[Dict[str, str]]:
    """Options dict for jax.jit(..., compiler_options=...); None if unset.

    Without an explicit set_compiler_options() call, TPU backends whose
    device kind matches the sweep hardware (v5e) get the sweep-proven
    _TPU_DEFAULTS; other TPU generations and CPU/interpret runs keep XLA
    defaults (the flag is measured-sensitive: 64/96 MiB regress on v5e, and
    smaller-VMEM chips could regress harder or fail to compile).
    """
    if _EXPLICIT:
        return dict(_OPTIONS) if _OPTIONS else None
    if jax.default_backend() == "tpu":
        kind = _device_kind()
        if any(k in kind for k in _MEASURED_DEVICE_KINDS):
            return dict(_TPU_DEFAULTS)
    return None
