"""Train state + optimizer factory with per-regime trainable masks.

Behavioral parity targets:
  - AdamW betas/eps/decay + max_grad_norm clip + lr schedules
    (/root/reference/tools/train_video_diffusion.py:214-250),
  - temporal-transformer-blocks-only finetuning regime (the reference's
    `enable_grad(temporal_transformer_block=True)`,
    unet_spatio_temporal_condition.py:15-23) — here an optax mask instead
    of requires_grad surgery,
  - controlnet-only / vae-decoder-only regimes (train_video_controlnet.py:
    119-124, train_vae_finetuning.py:85-90).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def trainable_mask(params: Any, predicate: Callable[[tuple], bool]) -> Any:
    """Pytree of bools: which leaves receive updates."""
    flat = flax.traverse_util.flatten_dict(params)
    mask = {path: bool(predicate(path)) for path in flat}
    return flax.traverse_util.unflatten_dict(mask)


def temporal_blocks_predicate(path: tuple) -> bool:
    """Reference's temporal-only finetune: any temporal transformer param."""
    return any("temporal_transformer_blocks" in p for p in path)


def vae_decoder_predicate(path: tuple) -> bool:
    return len(path) > 0 and path[0] == "decoder"


def make_optimizer(
    learning_rate: float = 1e-5,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_weight_decay: float = 1e-2,
    adam_epsilon: float = 1e-8,
    max_grad_norm: float = 1.0,
    lr_scheduler: str = "constant",
    lr_warmup_steps: int = 0,
    max_train_steps: Optional[int] = None,
    mask: Optional[Any] = None,
    nan_guard_steps: int = 100,
) -> optax.GradientTransformation:
    """Build the AdamW chain.

    nan_guard_steps > 0 wraps the whole transform in optax.apply_if_finite:
    a step with non-finite grads is skipped instead of corrupting the
    params (the reference had only print-based NaN checks — SURVEY.md §5
    race/sanitizer row); training errors out after that many consecutive
    non-finite steps.
    """
    if lr_scheduler == "constant" and lr_warmup_steps > 0:
        schedule = optax.linear_schedule(0.0, learning_rate, lr_warmup_steps)
    elif lr_scheduler == "constant":
        schedule = learning_rate
    elif lr_scheduler == "linear":
        total = max_train_steps or 100000
        schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, lr_warmup_steps),
                optax.linear_schedule(learning_rate, 0.0, total - lr_warmup_steps),
            ],
            [lr_warmup_steps],
        )
    elif lr_scheduler == "cosine":
        total = max_train_steps or 100000
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, lr_warmup_steps, total
        )
    else:
        raise ValueError(lr_scheduler)

    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            schedule,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_epsilon,
            weight_decay=adam_weight_decay,
        ),
    )
    if mask is not None:
        # optax.masked would pass raw grads through for frozen leaves;
        # multi_transform + set_to_zero actually freezes them.
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, param_labels=labels
        )
    if nan_guard_steps:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=nan_guard_steps)
    return tx


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
