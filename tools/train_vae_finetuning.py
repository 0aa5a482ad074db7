"""Finetune the VAE decoder only (image MSE reconstruction).

Behavioral parity: /root/reference/tools/train_vae_finetuning.py:85-90,
303-314 — only decoder params receive updates, loss is per-pixel MSE of
the reconstructed frames.
"""

from __future__ import annotations

import os
import time

from common import batch_to_device, build_models

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.parallel import make_train_mesh, shard_train_state
from ctrlv_tpu.train import CheckpointManager, make_optimizer, make_vae_decoder_train_step, trainable_mask
from ctrlv_tpu.train.observability import Tracker, collect_demo_samples, run_vae_validation
from ctrlv_tpu.train.state import init_train_state, vae_decoder_predicate
from ctrlv_tpu.utils.config import parse_args


def main(cfg=None):
    cfg = cfg or parse_args()
    tiny = cfg.dataset_name == "synthetic"
    models = build_models(cfg, tiny=tiny)
    dataset, loader = get_dataloader(
        cfg.data_root, cfg.dataset_name, if_train=True,
        batch_size=cfg.train_batch_size, clip_length=cfg.clip_length,
        if_return_bbox_im=False, train_H=cfg.train_H, train_W=cfg.train_W,
        seed=cfg.seed,
    )

    mask = trainable_mask(models["vae_params"], vae_decoder_predicate)
    tx = make_optimizer(
        learning_rate=cfg.learning_rate,
        max_grad_norm=cfg.max_grad_norm,
        lr_scheduler=cfg.lr_scheduler,
        lr_warmup_steps=cfg.lr_warmup_steps,
        max_train_steps=cfg.max_train_steps,
        mask=mask,
    )
    state = init_train_state(models["vae_params"], tx)
    step_fn = jax.jit(make_vae_decoder_train_step(models["vae"], tx), donate_argnums=(0,))

    mesh = make_train_mesh(
        cfg.train_batch_size, n_data=cfg.mesh_data, n_frame=cfg.mesh_frame
    )
    zero1 = cfg.optimizer_sharding == "zero1" or (
        cfg.optimizer_sharding == "auto" and mesh.shape["data"] > 1
    )
    state = shard_train_state(state, mesh, zero1=zero1)
    batch_sharding = NamedSharding(mesh, P("data"))

    ckpt = CheckpointManager(
        os.path.join(cfg.output_dir, "checkpoints"),
        max_to_keep=cfg.checkpoints_total_limit,
    )
    # observability (reference train_vae_finetuning.py:282-301)
    tracker = Tracker(cfg)
    demo_samples = collect_demo_samples(loader, cfg.num_demo_samples)

    rng = jax.random.PRNGKey(cfg.seed)
    global_step = 0
    max_steps = cfg.max_train_steps or (cfg.num_train_epochs * len(loader))
    t0 = time.time()
    while global_step < max_steps:
        for batch in loader:
            if global_step >= max_steps:
                break
            if (cfg.validation_steps and global_step > 0
                    and global_step % cfg.validation_steps == 0):
                vm = run_vae_validation(
                    tracker, global_step, models["vae"], state.params,
                    demo_samples, cfg,
                )
                print(f"validation @ step {global_step}: {vm}")
            clips, _ = batch_to_device(batch)
            clips = jax.device_put(clips, batch_sharding)
            rng, key = jax.random.split(rng)
            state, metrics = step_fn(state, clips, key)
            global_step += 1
            tracker.log_scalars(global_step, {"train_loss": metrics["loss"]})
            if global_step % 10 == 0 or global_step == 1:
                print(
                    f"step {global_step} loss {float(metrics['loss']):.5f} "
                    f"({(time.time() - t0) / global_step:.2f}s/step)"
                )
            if global_step % cfg.checkpointing_steps == 0:
                ckpt.save(global_step, jax.device_get(state))
    ckpt.save(global_step, jax.device_get(state), wait=True)
    tracker.finish()
    return state


if __name__ == "__main__":
    main()
