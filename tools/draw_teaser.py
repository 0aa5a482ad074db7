"""Teaser renderer: multi-seed two-stage generations + bbox overlays.

Behavioral parity: /root/reference/tools/draw_teaser.py — per sample run
the overall two-stage pipeline for several seeds, export each generation,
the winning bbox video, and per-frame images with colored box overlays.
"""

from __future__ import annotations

import os

from common import build_models

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.pipelines import (
    OverallPipeline,
    StableVideoControlPipeline,
    VideoDiffusionPipeline,
)
from ctrlv_tpu.utils.config import parse_args
from ctrlv_tpu.utils.misc import render_gt_3d_bbox_plots
from ctrlv_tpu.utils.video_io import export_to_video, frames_to_uint8

NUM_SEEDS = 3


def main(cfg=None, max_samples=1):
    cfg = cfg or parse_args()
    tiny = cfg.dataset_name == "synthetic"
    models = build_models(cfg, tiny=tiny, with_controlnet=True)
    dataset, loader = get_dataloader(
        cfg.data_root, cfg.dataset_name, if_train=False, batch_size=1,
        clip_length=cfg.clip_length, shuffle=False, if_return_bbox_im=True,
        train_H=cfg.train_H, train_W=cfg.train_W,
    )
    bbox_pipe = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"],
    )
    ctrl_pipe = StableVideoControlPipeline(
        models["unet"], models["unet_params"], models["ctrl"], models["ctrl_params"],
        models["vae"], models["vae_params"], models["clip"], models["clip_params"],
    )
    overall = OverallPipeline(bbox_pipe, ctrl_pipe)
    out_dir = os.path.join(cfg.output_dir, "teaser")
    os.makedirs(out_dir, exist_ok=True)

    for i, batch in enumerate(iter(loader)):
        if i >= max_samples:
            break
        image = jnp.asarray(batch["clips"][0, 0])
        bbox = jnp.asarray(batch["bbox_images"][0])
        for seed in range(NUM_SEEDS):
            result = overall(
                image, bbox, jax.random.PRNGKey(cfg.seed + seed),
                num_frames=cfg.clip_length,
                stage1_steps=30,
                stage2_steps=cfg.num_inference_steps,
                fps=cfg.fps,
                decode_chunk_size=cfg.decode_chunk_size,
            )
            export_to_video(
                frames_to_uint8(result["video"]),
                os.path.join(out_dir, f"sample{i}_seed{seed}.gif"), fps=cfg.fps,
            )
            export_to_video(
                frames_to_uint8(result["bbox_video"]),
                os.path.join(out_dir, f"sample{i}_seed{seed}_bbox.gif"), fps=cfg.fps,
            )
            # per-frame overlay: max-blend generated frame with bbox frame
            overlay = np.maximum(result["video"], result["bbox_video"] * 0.8)
            for f in range(0, overlay.shape[0], max(overlay.shape[0] // 5, 1)):
                Image.fromarray((overlay[f] * 255).astype(np.uint8)).save(
                    os.path.join(out_dir, f"sample{i}_seed{seed}_frame{f}.png")
                )
            print(f"sample {i} seed {seed}: miou={result['miou']:.3f}")

        # reference-style GT 3D-bbox color plots: per-frame wireframes on a
        # white canvas, plum first frame / gold rest, at original resolution
        # (/root/reference/tools/draw_teaser.py:229-240)
        objects = {k: v[0] for k, v in batch["objects"].items()}
        calib = batch.get("cam_to_img")
        plots = render_gt_3d_bbox_plots(
            objects,
            None if calib is None else calib[0],
            dataset.orig_H,
            dataset.orig_W,
            plot_2d_bbox=cfg.dataset_name == "bdd100k",
        )
        for f, plot in enumerate(plots):
            Image.fromarray((plot * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"sample{i}_gt_3d_bbox_frame{f}.png")
            )


if __name__ == "__main__":
    main()
