"""Full two-stage evaluation: bbox prediction (5 candidates) + Box2Video.

Behavioral parity: /root/reference/tools/eval_overall.py (§3.4) — per test
sample: 5 stage-1 candidates over guidance pairs, darkness cleanup, best
mask-IoU selection (+first/last variant), stage-2 generation on the
winner, running mean/std logging, video export.

TPU-native: the 5 candidates run as one batched jitted sampler call
(ctrlv_tpu.pipelines.OverallPipeline).
"""

from __future__ import annotations

import os
from collections import defaultdict

from common import build_models

import jax
import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.pipelines import (
    OverallPipeline,
    StableVideoControlPipeline,
    VideoDiffusionPipeline,
)
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
        use_segmentation=cfg.use_segmentation,
        if_last_frame_traj=cfg.if_last_frame_trajectory,
    )

    mesh = None
    if cfg.mesh_frame > 1 or (cfg.mesh_data or 1) > 1:
        from ctrlv_tpu.parallel import make_mesh

        mesh = make_mesh(n_data=cfg.mesh_data, n_frame=cfg.mesh_frame)
    bbox_pipe = VideoDiffusionPipeline(
        models["unet"], models["unet_params"], models["vae"], models["vae_params"],
        models["clip"], models["clip_params"], mesh=mesh,
    )
    ctrl_pipe = StableVideoControlPipeline(
        models["unet"], models["unet_params"], models["ctrl"], models["ctrl_params"],
        models["vae"], models["vae_params"], models["clip"], models["clip_params"],
        mesh=mesh,
    )
    overall = OverallPipeline(bbox_pipe, ctrl_pipe)

    os.makedirs(cfg.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(cfg.seed)
    scores = defaultdict(list)
    for i, batch in enumerate(iter(loader)):
        if max_samples is not None and i >= max_samples:
            break
        if cfg.num_demo_samples and i >= cfg.num_demo_samples:
            break
        image = jnp.asarray(batch["clips"][0, 0])
        bbox = jnp.asarray(batch["bbox_images"][0])
        rng, key = jax.random.split(rng)
        result = overall(
            image, bbox, key,
            num_frames=cfg.clip_length,
            stage1_steps=30,
            stage2_steps=cfg.num_inference_steps,
            fps=cfg.fps,
            noise_aug_strength=cfg.noise_aug_strength,
            num_cond_bbox_frames=cfg.num_cond_bbox_frames,
            min_guidance_scale=cfg.min_guidance_scale,
            max_guidance_scale=cfg.max_guidance_scale,
            control_condition_scale=cfg.conditioning_scale,
            decode_chunk_size=cfg.decode_chunk_size,
            max_decode_frames=cfg.max_decode_frames,
        )
        for k in ("miou", "ap", "ar", "miou_first_last", "ap_first_last", "ar_first_last"):
            scores[k].append(result[k])
        print(
            f"[{i}] miou={result['miou']:.3f} ap={result['ap']:.3f} "
            f"ar={result['ar']:.3f} avg_miou={np.mean(scores['miou']):.3f} "
            f"best_guidance={result['best_guidance']}"
        )
        export_to_video(
            frames_to_uint8(result["video"]),
            os.path.join(cfg.output_dir, f"generated_video_{i}.gif"), fps=cfg.fps,
        )
        export_to_video(
            frames_to_uint8(result["bbox_video"]),
            os.path.join(cfg.output_dir, f"predicted_bbox_{i}.gif"), fps=cfg.fps,
        )

    summary = {k: (float(np.mean(v)), float(np.std(v))) for k, v in scores.items()}
    print("summary (mean, std):", summary)
    return summary


if __name__ == "__main__":
    main()
