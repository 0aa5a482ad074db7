"""Train the AR bbox-predictor baseline (trajeglish-style).

Behavioral parity: /root/reference/src/ctrlv/bbox_generator_baseline/
train.py — replaces PyTorch Lightning + Hydra with the unified config +
an optax loop (AdamW decay/no-decay split, warmup, grad clip, top-k-style
checkpointing via Orbax rotation, resume-latest).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ctrlv_tpu.baseline import BaselineConfig, BboxPredictorLM, process_data
from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.train import CheckpointManager


def decay_mask(params):
    """QCNet-style AdamW split: no decay for biases/norms/embeddings."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: not (
            k[-1] in ("bias", "scale")
            or any("embed" in p.lower() for p in k)
        )
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask)


def main(cfg: BaselineConfig = None, max_steps=None, dataset_name=None):
    cfg = cfg or BaselineConfig()
    if dataset_name is None:
        dataset_name = cfg.dataset
    max_steps = max_steps or cfg.max_steps

    dataset, loader = get_dataloader(
        cfg.data_root, dataset_name, if_train=True,
        batch_size=cfg.train_batch_size, clip_length=cfg.num_timesteps,
        train_H=cfg.train_H, train_W=cfg.train_W, seed=cfg.seed,
    )

    model = BboxPredictorLM(cfg=cfg)
    rng = jax.random.PRNGKey(cfg.seed)

    def first_processed():
        batch = next(iter(loader))
        return process_data(cfg, batch["objects"], (dataset.orig_W, dataset.orig_H))

    data0 = first_processed()
    params = jax.jit(lambda k: model.init(k, data0))(rng)

    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, cfg.lr, cfg.lr_warmup_steps),
            optax.constant_schedule(cfg.lr),
        ],
        [cfg.lr_warmup_steps],
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adamw(schedule, weight_decay=cfg.weight_decay, mask=decay_mask(params)),
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, data):
        def loss_fn(p):
            return BboxPredictorLM.loss(cfg, model.apply(p, data))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    ckpt = CheckpointManager(
        os.path.join("output", "baseline_checkpoints"), max_to_keep=7
    )
    global_step = 0
    t0 = time.time()
    while global_step < max_steps:
        for batch in loader:
            if global_step >= max_steps:
                break
            data = process_data(cfg, batch["objects"], (dataset.orig_W, dataset.orig_H))
            params, opt_state, loss = step(params, opt_state, data)
            global_step += 1
            if global_step % 20 == 0 or global_step == 1:
                print(
                    f"step {global_step} loss {float(loss):.4f} "
                    f"({(time.time() - t0) / global_step:.2f}s/step)"
                )
            if global_step % 500 == 0:
                ckpt.save(global_step, jax.device_get(params))
    ckpt.save(global_step, jax.device_get(params), wait=True)
    return params


if __name__ == "__main__":
    from ctrlv_tpu.baseline.config import config_from_overrides

    main(cfg=config_from_overrides())
