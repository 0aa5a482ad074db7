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

_OPTIONS: Dict[str, str] = {}


def set_compiler_options(options: Optional[Dict[str, str]]) -> None:
    """Replace the sampler compiler options (None or {} -> XLA defaults)."""
    global _OPTIONS
    _OPTIONS = dict(options or {})


def get_compiler_options() -> Optional[Dict[str, str]]:
    """Options dict for jax.jit(..., compiler_options=...); None if unset."""
    return dict(_OPTIONS) if _OPTIONS else None
