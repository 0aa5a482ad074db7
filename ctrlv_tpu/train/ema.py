"""EMA of model parameters.

Behavioral parity: diffusers EMAModel as used by the reference
(/root/reference/tools/train_video_diffusion.py:139-140,549-550): warmup
decay min((1+step)/(10+step), max_decay), store/copy/restore around
validation. Pure pytree ops — jit/donate friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EMAState:
    params: Any
    step: jnp.ndarray  # scalar int32


def ema_init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.array, params), step=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_params, max_decay: float = 0.9999) -> EMAState:
    step = state.step + 1
    decay = jnp.minimum((1.0 + step) / (10.0 + step), max_decay)
    ema = jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        state.params,
        new_params,
    )
    return EMAState(params=ema, step=step)
