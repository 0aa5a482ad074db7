"""Train the spatio-temporal ControlNet (Box2Video stage 2).

Behavioral parity: /root/reference/tools/train_video_controlnet.py (§3.2):
ControlNet initialized from_unet, UNet/VAE/CLIP frozen, EDM loss on
RGB-video latents with bbox-frame control conditioning; --generate_bbox
swaps cond/target to train the video->bbox inverse. The reference's manual
2-GPU model split becomes a no-op under the mesh (everything is resident).
"""

from __future__ import annotations

import os
import time

from common import batch_to_device, build_models

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.parallel import make_train_mesh, shard_train_state
from ctrlv_tpu.train import CheckpointManager, make_controlnet_train_step, make_optimizer
from ctrlv_tpu.train.observability import Tracker, collect_demo_samples, run_validation
from ctrlv_tpu.train.state import init_train_state
from ctrlv_tpu.utils.config import parse_args


def main(cfg=None):
    cfg = cfg or parse_args()
    from ctrlv_tpu.ops.attention import set_attention_impl

    set_attention_impl(cfg.attention_impl)

    tiny = cfg.dataset_name == "synthetic"
    models = build_models(cfg, tiny=tiny, with_controlnet=True)
    dataset, loader = get_dataloader(
        cfg.data_root, cfg.dataset_name, if_train=True,
        batch_size=cfg.train_batch_size, clip_length=cfg.clip_length,
        if_return_bbox_im=True, train_H=cfg.train_H, train_W=cfg.train_W,
        seed=cfg.seed,
    )

    tx = make_optimizer(
        learning_rate=cfg.learning_rate,
        adam_weight_decay=cfg.adam_weight_decay,
        max_grad_norm=cfg.max_grad_norm,
        lr_scheduler=cfg.lr_scheduler,
        lr_warmup_steps=cfg.lr_warmup_steps,
        max_train_steps=cfg.max_train_steps,
        optimizer=cfg.optimizer,
        mu_dtype=cfg.adam_mu_dtype,
    )
    if cfg.gradient_accumulation_steps > 1:
        import optax

        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    state = init_train_state(models["ctrl_params"], tx)

    step_fn = jax.jit(
        make_controlnet_train_step(
            models["unet"], models["ctrl"], models["vae"], models["clip"], tx,
            generate_bbox=cfg.generate_bbox,
            conditioning_dropout_prob=cfg.conditioning_dropout_prob,
            fps=cfg.fps,
            noise_aug_strength=cfg.noise_aug_strength,
            encode_chunk=cfg.vae_encode_chunk,
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

    # observability (reference train_video_controlnet.py:334-363)
    tracker = Tracker(cfg)
    demo_samples = collect_demo_samples(loader, cfg.num_demo_samples)
    from ctrlv_tpu.pipelines import StableVideoControlPipeline

    val_pipeline = StableVideoControlPipeline(
        models["unet"], models["unet_params"], models["ctrl"],
        models["ctrl_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )

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
                val_pipeline.controlnet_params = state.params
                rng, vkey = jax.random.split(rng)
                run_validation(
                    tracker, global_step, val_pipeline, demo_samples, cfg,
                    vkey, controlnet=True,
                )
                print(f"validation @ step {global_step}: media logged")
            clips, bbox = batch_to_device(batch)
            clips = jax.device_put(clips, batch_sharding)
            bbox = jax.device_put(bbox, batch_sharding)
            rng, key = jax.random.split(rng)
            state, metrics = step_fn(
                state, models["unet_params"], models["vae_params"],
                models["clip_params"], clips, bbox, key,
            )
            global_step += 1
            tracker.log_scalars(
                global_step,
                {"train_loss": metrics["loss"], "grad_norm": metrics["grad_norm"]},
            )
            if global_step % 10 == 0 or global_step == 1:
                print(
                    f"step {global_step} loss {float(metrics['loss']):.4f} "
                    f"({(time.time() - t0) / global_step:.2f}s/step)"
                )
            if global_step % cfg.checkpointing_steps == 0:
                ckpt.save(global_step, jax.device_get(state))
    ckpt.save(global_step, jax.device_get(state), wait=True)
    tracker.finish()
    from ctrlv_tpu.train.hf_export import save_pipeline

    save_pipeline(
        os.path.join(cfg.output_dir, "pipeline"),
        controlnet_params=jax.device_get(state.params),
        controlnet_config=models["unet_cfg"],
    )
    return state


if __name__ == "__main__":
    main()
