"""Evaluate the AR bbox-predictor baseline via rollout + mask-IoU.

Behavioral parity: /root/reference/src/ctrlv/bbox_generator_baseline/
eval.py + policies/bbox_predictor_lm_policy.py — temperature-sampled AR
rollouts seeded with the conditioning frames, rendered and scored with
mask-IoU / precision / recall (incl. first&last-frame variant), videos
exported.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import defaultdict

import jax
import numpy as np

from ctrlv_tpu.baseline import (
    BaselineConfig,
    BboxPredictorLM,
    BboxPredictorLMPolicy,
    process_data,
)
from ctrlv_tpu.data import get_dataloader
from ctrlv_tpu.train import CheckpointManager
from ctrlv_tpu.utils.video_io import export_to_video, frames_to_uint8


def main(cfg: BaselineConfig = None, num_samples=4, params=None, dataset_name=None):
    cfg = cfg or BaselineConfig()
    dataset_name = dataset_name or cfg.dataset
    dataset, loader = get_dataloader(
        cfg.data_root, dataset_name, if_train=False, batch_size=1,
        clip_length=cfg.num_timesteps, shuffle=False,
        train_H=cfg.train_H, train_W=cfg.train_W,
    )
    model = BboxPredictorLM(cfg=cfg)

    if params is None:
        ckpt = CheckpointManager(os.path.join("output", "baseline_checkpoints"))
        data0 = process_data(
            cfg, next(iter(loader))["objects"], (dataset.orig_W, dataset.orig_H)
        )
        template = jax.jit(lambda k: model.init(k, data0))(jax.random.PRNGKey(0))
        params = ckpt.restore(template=template) or template

    policy = BboxPredictorLMPolicy(cfg, model, params)
    rng = jax.random.PRNGKey(cfg.seed)
    scores = defaultdict(list)
    out_dir = os.path.join("output", "baseline_eval")
    os.makedirs(out_dir, exist_ok=True)
    for i, batch in enumerate(iter(loader)):
        if i >= num_samples:
            break
        data = process_data(cfg, batch["objects"], (dataset.orig_W, dataset.orig_H))
        rng, key = jax.random.split(rng)
        pred = policy.rollout(data, key)
        pred_frames = policy.render(np.asarray(pred[0]), np.asarray(data["type_ids"][0]))
        gt_frames = policy.render(
            np.asarray(data["bboxes"][0]), np.asarray(data["type_ids"][0])
        )
        s = policy.score(pred_frames, gt_frames)
        for k, v in s.items():
            scores[k].append(v)
        print(f"[{i}] miou={s['miou']:.3f} avg={np.mean(scores['miou']):.3f}")
        export_to_video(
            frames_to_uint8(pred_frames),
            os.path.join(out_dir, f"rollout_{i}.gif"),
            fps=cfg.video_fps,
        )
    summary = {k: float(np.mean(v)) for k, v in scores.items()}
    print("summary:", summary)
    return summary


if __name__ == "__main__":
    from ctrlv_tpu.baseline.config import config_from_overrides

    main(cfg=config_from_overrides())
