"""Process-wide XLA compiler options for the big jitted programs.

tools/sweep_compiler_options.py A/Bs XLA:TPU backend flags on the denoise
step (the reference's analog is the hand-tuned cuDNN/xformers env knobs,
/root/reference/tools/train_video_diffusion.py:142-153). Whatever the sweep
proves out lands here as the default for the sampler pipelines; callers can
override per-process with set_compiler_options().

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
# 472/477). Applied only on TPU backends; explicit set_compiler_options()
# always wins.
_TPU_DEFAULTS: Dict[str, str] = {"xla_tpu_scoped_vmem_limit_kib": "32768"}

_OPTIONS: Dict[str, str] = {}
_EXPLICIT = False


def set_compiler_options(options: Optional[Dict[str, str]]) -> None:
    """Replace the sampler compiler options (None or {} -> XLA defaults)."""
    global _OPTIONS, _EXPLICIT
    _OPTIONS = dict(options or {})
    _EXPLICIT = True


def get_compiler_options() -> Optional[Dict[str, str]]:
    """Options dict for jax.jit(..., compiler_options=...); None if unset.

    Without an explicit set_compiler_options() call, TPU backends get the
    sweep-proven _TPU_DEFAULTS; CPU/interpret runs keep XLA defaults (the
    TPU flags are meaningless there and some backends reject unknowns).
    """
    if _EXPLICIT:
        return dict(_OPTIONS) if _OPTIONS else None
    if jax.default_backend() == "tpu":
        return dict(_TPU_DEFAULTS)
    return None
