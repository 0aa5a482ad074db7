"""Plain SVD generation eval (no bbox conditioning) — FVD baselines.

Behavioral parity: /root/reference/tools/eval_video_generation.py —
unconditioned img2vid generation on test initial frames, exporting
generated + GT videos for offline FVD.
"""

from __future__ import annotations

import os

from common import build_models

import jax
import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.metrics.fvd import FVD
from ctrlv_tpu.pipelines import VideoDiffusionPipeline
from ctrlv_tpu.utils.config import parse_args
from ctrlv_tpu.utils.video_io import export_to_video, frames_to_uint8


def main(cfg=None, max_samples=None, compute_fvd=False):
    cfg = cfg or parse_args()
    tiny = cfg.dataset_name == "synthetic"
    models = build_models(cfg, tiny=tiny)
    dataset, loader = get_dataloader(
        cfg.data_root, cfg.dataset_name, if_train=False, batch_size=1,
        clip_length=cfg.clip_length, shuffle=False, if_return_bbox_im=False,
        train_H=cfg.train_H, train_W=cfg.train_W,
    )
    pipe = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )
    os.makedirs(cfg.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)
    fvd = FVD() if compute_fvd else None
    for i, batch in enumerate(iter(loader)):
        if (max_samples or cfg.num_demo_samples) and i >= (max_samples or cfg.num_demo_samples):
            break
        image = jnp.asarray(batch["clips"][:, 0])
        rng, key = jax.random.split(rng)
        frames = pipe(
            image, rng=key,
            num_frames=cfg.clip_length,
            num_inference_steps=cfg.num_inference_steps,
            min_guidance_scale=cfg.min_guidance_scale,
            max_guidance_scale=cfg.max_guidance_scale,
            fps=cfg.fps,
            noise_aug_strength=cfg.noise_aug_strength,
            decode_chunk_size=cfg.decode_chunk_size,
        )[0]
        gen = np.asarray(frames)
        gt = np.asarray(jnp.clip(jnp.asarray(batch["clips"][0]) / 2 + 0.5, 0, 1))
        export_to_video(
            frames_to_uint8(gen),
            os.path.join(cfg.output_dir, f"generated_videos_{i}.gif"), fps=cfg.fps,
        )
        export_to_video(
            frames_to_uint8(gt),
            os.path.join(cfg.output_dir, f"gt_videos_{i}.gif"), fps=cfg.fps,
        )
        if fvd is not None:
            fvd.update(gt[None], gen[None])
        print(f"[{i}] generated")
    if fvd is not None:
        score = fvd.compute()
        print("FVD:", score)
        return score


if __name__ == "__main__":
    main()
