"""Teacher-forced Box2Video evaluation (GT bbox frames as conditioning).

Behavioral parity: /root/reference/tools/eval_video_controlnet.py —
generate RGB videos from GT boxes, export videos + per-sample GT labels
for later detection metrics; report SSIM/PSNR vs GT clips.
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict

from common import build_models

import jax
import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.metrics import psnr, ssim
from ctrlv_tpu.pipelines import StableVideoControlPipeline
from ctrlv_tpu.utils.config import parse_args
from ctrlv_tpu.utils.video_io import export_to_video, frames_to_uint8


def main(cfg=None, max_samples=None):
    cfg = cfg or parse_args()
    tiny = cfg.dataset_name == "synthetic"
    models = build_models(cfg, tiny=tiny, with_controlnet=True)
    dataset, loader = get_dataloader(
        cfg.data_root, cfg.dataset_name, if_train=False, batch_size=1,
        clip_length=cfg.clip_length, shuffle=False, if_return_bbox_im=True,
        train_H=cfg.train_H, train_W=cfg.train_W,
    )
    pipe = StableVideoControlPipeline(
        models["unet"], models["unet_params"], models["ctrl"], models["ctrl_params"],
        models["vae"], models["vae_params"], models["clip"], models["clip_params"],
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
            image, bbox, rng=key,
            num_frames=cfg.clip_length,
            num_inference_steps=cfg.num_inference_steps,
            min_guidance_scale=cfg.min_guidance_scale,
            max_guidance_scale=cfg.max_guidance_scale,
            control_condition_scale=cfg.conditioning_scale,
            fps=cfg.fps,
            noise_aug_strength=cfg.noise_aug_strength,
            decode_chunk_size=cfg.decode_chunk_size,
        )[0]
        gen = np.asarray(frames)
        gt = np.asarray(jnp.clip(jnp.asarray(batch["clips"][0]) / 2 + 0.5, 0, 1))
        scores["ssim"].append(float(np.mean([
            float(ssim(jnp.asarray(gen[f]), jnp.asarray(gt[f])))
            for f in range(gen.shape[0])
        ])))
        scores["psnr"].append(float(psnr(jnp.asarray(gen), jnp.asarray(gt))))
        print(
            f"[{i}] ssim={scores['ssim'][-1]:.3f} psnr={scores['psnr'][-1]:.2f}"
        )
        export_to_video(
            frames_to_uint8(gen),
            os.path.join(cfg.output_dir, f"generated_video_{i}.gif"), fps=cfg.fps,
        )
        export_to_video(
            frames_to_uint8(gt),
            os.path.join(cfg.output_dir, f"gt_video_{i}.gif"), fps=cfg.fps,
        )
        with open(os.path.join(cfg.output_dir, f"gt_labels_{i}.pkl"), "wb") as f:
            pickle.dump({"objects": batch["objects"], "index": batch["indices"]}, f)
    summary = {k: float(np.mean(v)) for k, v in scores.items()}
    print("summary:", summary)
    return summary


if __name__ == "__main__":
    main()
