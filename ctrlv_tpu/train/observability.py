"""Training observability: scalar/media tracking + in-loop validation.

Behavioral parity: the reference's W&B-centric loop
(/root/reference/tools/train_video_diffusion.py:271-272 init_trackers,
:389-425 validation every `validation_steps` over `num_demo_samples`
cached samples with EMA store/copy/restore, :342-369
run_inference_with_pipeline media logs, :549-559 per-step scalars;
train_video_controlnet.py:334-363; train_vae_finetuning.py:282-301).

TPU-native deltas:
  - trackers are W&B when requested AND importable, otherwise a JSONL
    scalar log + on-disk GIF media tree (`<output_dir>/media/videos/
    step_<N>/generated_videos_<i>.gif`) laid out so
    `ctrlv_tpu.metrics.offline_eval.pair_video_files` consumes a step dir
    directly — the same role the reference's `wandb/run-*/files/media`
    dir plays for its offline FVD pass (metrics/fvd.py:331-337),
  - EMA "store/copy/restore" is just passing the EMA param tree to the
    functional pipeline — params are values, nothing to mutate.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from ..metrics.iou import binary_mask_iou
from ..utils.misc import wandb_available
from ..utils.video_io import export_to_video


class Tracker:
    """Scalar + media logger (W&B or local JSONL/GIF fallback)."""

    def __init__(self, cfg, out_dir: Optional[str] = None):
        self.cfg = cfg
        out_dir = out_dir or cfg.output_dir
        self.media_root = os.path.join(out_dir, "media", "videos")
        self.scalar_path = os.path.join(out_dir, "logs", "metrics.jsonl")
        os.makedirs(os.path.dirname(self.scalar_path), exist_ok=True)
        self.use_wandb = cfg.report_to == "wandb" and wandb_available()
        self._t0 = time.time()
        if self.use_wandb:
            import wandb

            wandb.init(
                project=cfg.project_name,
                name=cfg.run_name,
                config=dataclasses.asdict(cfg),
                dir=cfg.logging_dir,
            )

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        record = {k: float(v) for k, v in scalars.items()}
        record.update(step=int(step), wall_time=round(time.time() - self._t0, 3))
        with open(self.scalar_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.use_wandb:
            import wandb

            wandb.log({k: v for k, v in record.items() if k != "step"}, step=int(step))

    def log_video(self, step: int, name: str, frames_uint8: np.ndarray, fps: int) -> str:
        """frames_uint8: (F, H, W, 3). Returns the exported path."""
        step_dir = os.path.join(self.media_root, f"step_{int(step)}")
        os.makedirs(step_dir, exist_ok=True)
        path = os.path.join(step_dir, f"{name}.gif")
        export_to_video(list(frames_uint8), path, fps=fps)
        if self.use_wandb:
            import wandb

            # wandb.Video wants (F, C, H, W)
            wandb.log(
                {name.rsplit("_", 1)[0]: wandb.Video(
                    frames_uint8.transpose(0, 3, 1, 2), fps=fps
                )},
                step=int(step),
            )
        return path

    def finish(self) -> None:
        if self.use_wandb:
            import wandb

            wandb.finish()


def collect_demo_samples(loader, n: int) -> List[dict]:
    """Cache the first n eval samples (reference caches demo_samples once
    before the train loop, train_video_diffusion.py:334-340)."""
    from ..utils.samples import get_n_training_samples

    return get_n_training_samples(loader, n)


def _to_uint8(frames01: np.ndarray) -> np.ndarray:
    return (np.clip(np.asarray(frames01, np.float32), 0.0, 1.0) * 255).astype(np.uint8)


def run_validation(
    tracker: Tracker,
    step: int,
    pipeline,
    demo_samples: List[dict],
    cfg,
    rng: jax.Array,
    predict_bbox: bool = False,
    controlnet: bool = False,
) -> Dict[str, float]:
    """Full pipeline inference on the cached demo samples + media logs.

    Returns the quick metrics that were logged (val_miou etc. for bbox
    workloads) so drivers can print them.
    """
    mious = []
    for i, sample in enumerate(demo_samples):
        rng, key = jax.random.split(rng)
        image = sample["image_init"][None]
        kwargs = dict(
            rng=key,
            num_frames=cfg.clip_length,
            num_inference_steps=cfg.num_inference_steps,
            min_guidance_scale=cfg.min_guidance_scale,
            max_guidance_scale=cfg.max_guidance_scale,
            fps=cfg.fps,
            noise_aug_strength=cfg.noise_aug_strength,
            decode_chunk_size=min(cfg.decode_chunk_size, cfg.clip_length),
        )
        if controlnet:
            frames = pipeline(
                image,
                cond_images=sample["bbox_img"][None],
                control_condition_scale=cfg.conditioning_scale,
                **kwargs,
            )[0]
        elif predict_bbox:
            frames = pipeline(
                image,
                bbox_images=sample["bbox_img"][None],
                num_cond_bbox_frames=cfg.num_cond_bbox_frames,
                **kwargs,
            )[0]
        else:
            frames = pipeline(image, **kwargs)[0]
        gen_u8 = _to_uint8(frames)
        tracker.log_video(step, f"generated_videos_{i}", gen_u8, cfg.fps)
        tracker.log_video(step, f"gt_videos_{i}", sample["gt_clip_np"], cfg.fps)
        if "bbox_img_np" in sample:
            tracker.log_video(step, f"gt_bbox_frames_{i}", sample["bbox_img_np"], cfg.fps)
            if predict_bbox:
                # quick selection-metric check of the generated bbox video
                miou, _, _ = binary_mask_iou(sample["bbox_img_np"], gen_u8)
                mious.append(float(miou))
    metrics = {}
    if mious:
        metrics["val_miou"] = float(np.mean(mious))
        tracker.log_scalars(step, metrics)
    return metrics


_VAE_RECON_CACHE: Dict[tuple, object] = {}


def _vae_recon_fn(vae, num_frames: int):
    key = (id(vae), num_frames)
    if key not in _VAE_RECON_CACHE:
        _VAE_RECON_CACHE[key] = jax.jit(
            lambda p, x: vae.apply(
                p, vae.apply(p, x, method=vae.encode), num_frames, method=vae.decode
            )
        )
    return _VAE_RECON_CACHE[key]


def run_vae_validation(
    tracker: Tracker, step: int, vae, params, demo_samples: List[dict], cfg
) -> Dict[str, float]:
    """Reconstruction validation for the VAE-decoder finetune
    (train_vae_finetuning.py:282-301: decode val clips, log side-by-side)."""
    import jax.numpy as jnp

    psnrs = []
    for i, sample in enumerate(demo_samples):
        clip = jnp.asarray(sample["gt_clip"])  # (F,H,W,3) in [-1,1]
        recon = _vae_recon_fn(vae, clip.shape[0])(params, clip)
        recon = np.asarray(jnp.clip(recon, -1.0, 1.0), np.float32)
        gt = np.asarray(clip, np.float32)
        mse = float(np.mean((recon - gt) ** 2))
        psnrs.append(10.0 * np.log10(4.0 / max(mse, 1e-12)))  # range [-1,1]
        tracker.log_video(step, f"generated_videos_{i}", _to_uint8(recon / 2 + 0.5), cfg.fps)
        tracker.log_video(step, f"gt_videos_{i}", sample["gt_clip_np"], cfg.fps)
    metrics = {"val_psnr": float(np.mean(psnrs))}
    tracker.log_scalars(step, metrics)
    return metrics
