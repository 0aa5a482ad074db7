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


def split_trainable(params: Any, predicate: Callable[[tuple], bool]) -> Any:
    """Extract the trainable SUBTREE (not a masked copy).

    Single-chip full-size memory: a masked optimizer still differentiates
    the whole tree (full-size grads = params-sized HBM), whereas a
    partitioned step holds grads + optimizer moments only for the subset.
    Use with make_svd_train_step(trainable_predicate=...) and pass the full
    tree via base_params.
    """
    flat = flax.traverse_util.flatten_dict(params)
    sub = {k: v for k, v in flat.items() if predicate(k)}
    return flax.traverse_util.unflatten_dict(sub)


def merge_trainable(full: Any, subset: Any) -> Any:
    """Overlay the trainable subtree onto the full param tree."""
    flat = dict(flax.traverse_util.flatten_dict(full))
    flat.update(flax.traverse_util.flatten_dict(subset))
    return flax.traverse_util.unflatten_dict(flat)


def vae_decoder_predicate(path: tuple) -> bool:
    return len(path) > 0 and path[0] == "decoder"


def scheduled_freeze(
    inner: optax.GradientTransformation, mask: Any, start_iter: int
) -> optax.GradientTransformation:
    """Full-param updates before `start_iter`, mask-only after.

    Parity: the reference switches from full finetune to temporal-only
    *mid-training* when global_step >= backprop_temporal_blocks_start_iter,
    clearing the optimizer state at the switch
    (/root/reference/tools/train_video_diffusion.py:375-387). TPU-native:
    the schedule lives inside the jitted transformation (a step counter +
    jnp.where), so there is no recompilation or pytree surgery at the
    switch.

    Frozen leaves receive *exactly zero* updates after the switch (their
    grads are zeroed before `inner`, so global-norm clipping sees only the
    live set, and the final output mask kills inner's weight-decay term).
    At the switch step inner's state is reset to freshly-initialized values
    (the reference's optimizer.state.clear()).
    """
    def _live(count):
        switched = count >= start_iter
        return jax.tree.map(lambda m: jnp.logical_or(~switched, m), mask)

    def init(params):
        return {"inner": inner.init(params), "count": jnp.zeros((), jnp.int32)}

    def update(updates, state, params=None):
        count = state["count"]
        live = _live(count)
        grads = jax.tree.map(
            lambda g, l: jnp.where(l, g, jnp.zeros_like(g)), updates, live
        )
        fresh = inner.init(params)
        inner_state = jax.tree.map(
            lambda f, c: jnp.where(count == start_iter, f, c),
            fresh,
            state["inner"],
        )
        out, new_inner = inner.update(grads, inner_state, params)
        out = jax.tree.map(
            lambda u, l: jnp.where(l, u, jnp.zeros_like(u)), out, live
        )
        return out, {"inner": new_inner, "count": count + 1}

    return optax.GradientTransformation(init, update)


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
    scheduled_mask: Optional[Any] = None,
    freeze_start_iter: int = -1,
    nan_guard_steps: int = 100,
    optimizer: str = "adamw",
    mu_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """Build the AdamW (or memory-lean adafactor) chain.

    nan_guard_steps > 0 wraps the whole transform in optax.apply_if_finite:
    a step with non-finite grads is skipped instead of corrupting the
    params (the reference had only print-based NaN checks — SURVEY.md §5
    race/sanitizer row); training errors out after that many consecutive
    non-finite steps.

    optimizer="adafactor" replaces AdamW's full second moment with a
    factored one (row/col stats), cutting optimizer memory from 2x to
    ~1x params — the single-v5e path for FULL-size full finetuning (fp32
    AdamW moments alone are ~12 GB for the 1.5B UNet). mu_dtype (e.g.
    "bfloat16") halves AdamW's first-moment storage.
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

    if optimizer == "adafactor":
        inner = optax.adafactor(
            learning_rate=schedule,
            multiply_by_parameter_scale=False,
            momentum=None,
            weight_decay_rate=adam_weight_decay,
            eps=adam_epsilon,
        )
    elif optimizer == "adamw":
        inner = optax.adamw(
            schedule,
            b1=adam_beta1,
            b2=adam_beta2,
            eps=adam_epsilon,
            weight_decay=adam_weight_decay,
            mu_dtype=mu_dtype,
        )
    else:
        raise ValueError(optimizer)
    tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), inner)
    if mask is not None:
        # optax.masked would pass raw grads through for frozen leaves;
        # multi_transform + set_to_zero actually freezes them.
        labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, param_labels=labels
        )
    elif scheduled_mask is not None:
        # full finetune until freeze_start_iter, mask-only after
        tx = scheduled_freeze(tx, scheduled_mask, freeze_start_iter)
    if nan_guard_steps:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=nan_guard_steps)
    return tx


def init_train_state(params: Any, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32)
    )
