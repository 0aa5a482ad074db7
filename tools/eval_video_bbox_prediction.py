"""Evaluate the stage-1 bbox predictor (teacher-provided cond frames).

Behavioral parity: /root/reference/tools/eval_video_bbox_prediction.py —
generate bbox videos conditioned on GT frames, score per-frame grayscale
boundary F-measure vs GT bbox frames (:85-96) plus clip mask-IoU.
"""

from __future__ import annotations

import os
from collections import defaultdict

from common import build_models

import jax
import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.metrics import binary_mask_iou, stage1_frame_f_measure
from ctrlv_tpu.pipelines import VideoDiffusionPipeline
from ctrlv_tpu.utils.config import parse_args
from ctrlv_tpu.utils.video_io import export_to_video, frames_to_uint8


def main(cfg=None, max_samples=None):
    cfg = cfg or parse_args()
    tiny = cfg.dataset_name == "synthetic"
    models = build_models(cfg, tiny=tiny)
    dataset, loader = get_dataloader(
        cfg.data_root, cfg.dataset_name, if_train=False, batch_size=1,
        clip_length=cfg.clip_length, shuffle=False, if_return_bbox_im=True,
        train_H=cfg.train_H, train_W=cfg.train_W,
    )
    pipe = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)
    scores = defaultdict(list)
    for i, batch in enumerate(iter(loader)):
        if (max_samples or cfg.num_demo_samples) and i >= (max_samples or cfg.num_demo_samples):
            break
        image = jnp.asarray(batch["clips"][:, 0])
        bbox = jnp.asarray(batch["bbox_images"])
        rng, key = jax.random.split(rng)
        frames = pipe(
            image, bbox_images=bbox, rng=key,
            num_frames=cfg.clip_length,
            num_inference_steps=cfg.num_inference_steps,
            min_guidance_scale=cfg.min_guidance_scale,
            max_guidance_scale=cfg.max_guidance_scale,
            fps=cfg.fps,
            noise_aug_strength=cfg.noise_aug_strength,
            num_cond_bbox_frames=cfg.num_cond_bbox_frames,
            decode_chunk_size=cfg.decode_chunk_size,
        )[0]
        gen = np.asarray(frames)
        gt = np.asarray(jnp.clip(bbox[0] / 2 + 0.5, 0, 1))
        miou, ap, ar = binary_mask_iou(
            (gt * 255).astype(np.uint8), (gen * 255).astype(np.uint8)
        )
        # per-frame grayscale boundary F, reference protocol: 5/255 darkness
        # zeroing + PIL-luma grayscale, F on the nonzero support (no extra
        # threshold — /root/reference/tools/eval_video_bbox_prediction.py:85-96)
        gt_u8 = (gt * 255.0).astype(np.uint8)
        fs = [
            stage1_frame_f_measure(gen[f], gt_u8[f]) for f in range(gen.shape[0])
        ]
        scores["miou"].append(miou)
        scores["f_measure"].append(float(np.mean(fs)))
        print(
            f"[{i}] miou={miou:.3f} F={np.mean(fs):.3f} "
            f"avg_miou={np.mean(scores['miou']):.3f}"
        )
        export_to_video(
            frames_to_uint8(gen),
            os.path.join(cfg.output_dir, f"pred_bbox_{i}.gif"), fps=cfg.fps,
        )
    summary = {k: float(np.mean(v)) for k, v in scores.items()}
    print("summary:", summary)
    return summary


if __name__ == "__main__":
    main()
