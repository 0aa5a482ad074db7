"""Train the SVD UNet (full finetune or bbox predictor).

Behavioral parity: /root/reference/tools/train_video_diffusion.py (§3.1):
same workloads (--predict_bbox for the stage-1 bbox predictor, LoRA, EMA,
temporal-blocks-only regime, conditioning dropout, EDM loss, periodic
validation sampling, checkpoint rotation + resume-latest), rebuilt on the
TPU stack: one jitted train step with DP sharding over the mesh, Orbax
checkpoints, optax schedules.

Example:
  python tools/train_video_diffusion.py --dataset_name synthetic \
      --predict_bbox --max_train_steps 100
"""

from __future__ import annotations

import os
import time

from common import batch_to_device, build_models

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.parallel import make_train_mesh, shard_train_state
from ctrlv_tpu.train import (
    CheckpointManager,
    ema_init,
    ema_update,
    lora_init,
    make_optimizer,
    make_svd_train_step,
    trainable_mask,
)
from ctrlv_tpu.train.observability import Tracker, collect_demo_samples, run_validation
from ctrlv_tpu.train.state import init_train_state, temporal_blocks_predicate
from ctrlv_tpu.utils.config import parse_args


def main(cfg=None):
    cfg = cfg or parse_args()
    from ctrlv_tpu.ops.attention import set_attention_impl

    set_attention_impl(cfg.attention_impl)

    tiny = cfg.dataset_name == "synthetic"
    models = build_models(cfg, tiny=tiny)
    dataset, loader = get_dataloader(
        cfg.data_root, cfg.dataset_name, if_train=True,
        batch_size=cfg.train_batch_size, clip_length=cfg.clip_length,
        if_return_bbox_im=cfg.predict_bbox, train_H=cfg.train_H, train_W=cfg.train_W,
        seed=cfg.seed,
    )

    # optimizer (+ optional temporal-only regime / LoRA). Reference
    # semantics (train_video_diffusion.py:202-212,375-387): start_iter==0
    # => temporal-only from step 0; start_iter>0 => full finetune until
    # global_step reaches it, then temporal-only; <0 => full finetune.
    # LoRA runs skip the regime entirely (reference :204-205).
    mask = sched_mask = None
    start_iter = cfg.backprop_temporal_blocks_start_iter
    if not cfg.enable_lora and start_iter == 0:
        mask = trainable_mask(models["unet_params"], temporal_blocks_predicate)
    elif not cfg.enable_lora and start_iter > 0:
        sched_mask = trainable_mask(models["unet_params"], temporal_blocks_predicate)
    tx = make_optimizer(
        learning_rate=cfg.learning_rate * (
            cfg.train_batch_size * cfg.gradient_accumulation_steps
            if cfg.scale_lr else 1
        ),
        adam_beta1=cfg.adam_beta1,
        adam_beta2=cfg.adam_beta2,
        adam_weight_decay=cfg.adam_weight_decay,
        adam_epsilon=cfg.adam_epsilon,
        max_grad_norm=cfg.max_grad_norm,
        lr_scheduler=cfg.lr_scheduler,
        lr_warmup_steps=cfg.lr_warmup_steps,
        max_train_steps=cfg.max_train_steps,
        mask=mask,
        scheduled_mask=sched_mask,
        freeze_start_iter=start_iter,
        optimizer=cfg.optimizer,
        mu_dtype=cfg.adam_mu_dtype,
    )
    if cfg.gradient_accumulation_steps > 1:
        import optax

        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)

    if cfg.enable_lora:
        lora = lora_init(
            jax.random.PRNGKey(cfg.seed), models["unet_params"]["params"], cfg.rank
        )
        state = init_train_state(lora, tx)
    else:
        state = init_train_state(models["unet_params"], tx)
    ema = ema_init(models["unet_params"]) if cfg.use_ema else None

    step_kwargs = dict(
        predict_bbox=cfg.predict_bbox,
        num_cond_bbox_frames=cfg.num_cond_bbox_frames,
        conditioning_dropout_prob=cfg.conditioning_dropout_prob,
        fps=cfg.fps,
        noise_aug_strength=cfg.noise_aug_strength,
        lora=cfg.enable_lora,
        encode_chunk=cfg.vae_encode_chunk,
    )
    if cfg.split_train_step:
        # Two compiled programs per micro-step (fwd+bwd / optimizer update),
        # bit-identical to the monolith (tests/test_train.py). This is the
        # path that lets FULL-UNet finetune compile where the AOT helper
        # rejects the monolithic program, and the grads program alone
        # leaves <3 GB free on a 16 GB chip — do not instantiate other
        # large executables before its first run (PERF.md round-4).
        from ctrlv_tpu.train import make_svd_grad_step, make_update_step

        # donate the freshly device_put batch (clips/bbox): in the
        # <3 GB-headroom full-finetune regime this flag exists for, keeping
        # them alive across the grad program adds avoidable HBM pressure
        grad_jit = jax.jit(make_svd_grad_step(
            models["unet"], models["vae"], models["clip"], **step_kwargs
        ), donate_argnums=(3, 4))
        upd_jit = jax.jit(make_update_step(tx), donate_argnums=(0, 1))

        def step_fn(state, vae_params, clip_params, clips, bbox, rng, *extra):
            loss, grads = grad_jit(
                state.params, vae_params, clip_params, clips, bbox, rng, *extra
            )
            state, metrics = upd_jit(state, grads)
            return state, {"loss": loss, **metrics}
    else:
        step_fn = jax.jit(
            make_svd_train_step(
                models["unet"], models["vae"], models["clip"], tx, **step_kwargs
            ),
            donate_argnums=(0,),
        )

    mesh = make_train_mesh(
        cfg.train_batch_size, n_data=cfg.mesh_data, n_frame=cfg.mesh_frame
    )
    batch_sharding = NamedSharding(mesh, P("data"))
    zero1 = cfg.optimizer_sharding == "zero1" or (
        cfg.optimizer_sharding == "auto" and mesh.shape["data"] > 1
    )
    state = shard_train_state(state, mesh, zero1=zero1)

    ckpt = CheckpointManager(
        os.path.join(cfg.output_dir, "checkpoints"),
        max_to_keep=cfg.checkpoints_total_limit,
    )
    if cfg.resume_from_checkpoint:
        # restore onto a host template (single bulk transfer afterwards is
        # much faster over the device tunnel than per-array device restore)
        restored = ckpt.restore(
            None if cfg.resume_from_checkpoint == "latest" else int(cfg.resume_from_checkpoint),
            template=jax.device_get(state),
        )
        if restored is not None:
            state = shard_train_state(restored, mesh, zero1=zero1)
            print(f"resumed from step {int(state.step)}")

    # observability: tracker + cached demo samples + validation pipeline
    # (reference train_video_diffusion.py:271-272,334-340,389-425)
    tracker = Tracker(cfg)
    demo_samples = collect_demo_samples(loader, cfg.num_demo_samples)
    from ctrlv_tpu.pipelines import VideoDiffusionPipeline

    val_pipeline = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"],
        models["vae_params"], models["clip"], models["clip_params"],
    )

    def validation_params():
        """EMA weights when enabled (the reference's store/copy/restore
        dance, :400-422 — here just a different param tree); merged LoRA
        weights for LoRA runs."""
        if cfg.use_ema and ema is not None:
            return ema.params
        if cfg.enable_lora:
            from ctrlv_tpu.train import merge_lora

            return {
                "params": merge_lora(
                    models["unet_params"]["params"], jax.device_get(state.params)
                )
            }
        return state.params

    rng = jax.random.PRNGKey(cfg.seed)
    global_step = int(state.step)
    max_steps = cfg.max_train_steps or (cfg.num_train_epochs * len(loader))
    t0 = time.time()
    while global_step < max_steps:
        for batch in loader:
            if global_step >= max_steps:
                break
            if (cfg.validation_steps and global_step > 0
                    and global_step % cfg.validation_steps == 0):
                val_pipeline.unet_params = validation_params()
                rng, vkey = jax.random.split(rng)
                vm = run_validation(
                    tracker, global_step, val_pipeline, demo_samples, cfg,
                    vkey, predict_bbox=cfg.predict_bbox,
                )
                print(f"validation @ step {global_step}: {vm or 'media logged'}")
            clips, bbox = batch_to_device(batch)
            clips = jax.device_put(clips, batch_sharding)
            bbox = jax.device_put(bbox, batch_sharding)
            rng, key = jax.random.split(rng)
            extra = (
                (models["unet_params"],) if cfg.enable_lora else ()
            )
            state, metrics = step_fn(
                state, models["vae_params"], models["clip_params"], clips, bbox, key,
                *extra,
            )
            global_step += 1
            if cfg.use_ema:
                ema = ema_update(ema, state.params)
            tracker.log_scalars(
                global_step,
                {"train_loss": metrics["loss"], "grad_norm": metrics["grad_norm"]},
            )
            if global_step % 10 == 0 or global_step == 1:
                loss = float(metrics["loss"])
                dt = (time.time() - t0) / max(global_step - int(state.step) + 1, 1)
                print(f"step {global_step} loss {loss:.4f} ({dt:.2f}s/step)")
            if global_step % cfg.checkpointing_steps == 0:
                ckpt.save(global_step, jax.device_get(state))
    ckpt.save(global_step, jax.device_get(state), wait=True)
    tracker.finish()
    # final HF-layout export (pipeline.save_pretrained parity)
    from ctrlv_tpu.train.hf_export import save_pipeline

    final_unet = state.params if not cfg.enable_lora else models["unet_params"]
    if cfg.enable_lora:
        from ctrlv_tpu.train import merge_lora

        final_unet = {
            "params": merge_lora(models["unet_params"]["params"], jax.device_get(state.params))
        }
    save_pipeline(
        os.path.join(cfg.output_dir, "pipeline"),
        unet_params=jax.device_get(final_unet),
        unet_config=models["unet_cfg"],
        vae_params=jax.device_get(models["vae_params"]),
        vae_config=models["vae_cfg"],
        clip_params=jax.device_get(models["clip_params"]),
        clip_config=models["clip_cfg"],
    )
    if cfg.use_ema:
        save_pipeline(
            os.path.join(cfg.output_dir, "pipeline_ema"),
            unet_params=jax.device_get(ema.params),
            unet_config=models["unet_cfg"],
        )
    print(f"done at step {global_step}")
    return state


if __name__ == "__main__":
    main()
