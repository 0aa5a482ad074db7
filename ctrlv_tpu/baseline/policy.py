"""AR rollout policy for the bbox predictor baseline.

Behavioral parity: /root/reference/src/ctrlv/bbox_generator_baseline/
policies/bbox_predictor_lm_policy.py — seed the first K (optionally + last)
frames from GT, then autoregressively sample action tokens per timestep
with temperature, convert to bbox sequences, render with the rasterizer
and score mask-IoU (incl. first&last variant).

TPU-first: each rollout step re-runs the jitted decoder on the fixed-size
(T*N) token grid with future positions holding placeholder tokens — the
block-causal mask makes them invisible, so this is semantically identical
to incremental decoding while keeping one static compile.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.iou import binary_mask_iou
from .actions import (
    actions_to_bbox_seq,
    discretize_actions,
    undiscretize_actions,
    undiscretize_coords,
)
from .config import BaselineConfig
from .model import BboxPredictorLM


class BboxPredictorLMPolicy:
    def __init__(self, cfg: BaselineConfig, model: BboxPredictorLM, params):
        self.cfg = cfg
        self.model = model
        self.params = params
        self._apply = jax.jit(
            lambda p, data, tokens: model.apply(
                p, data, actions_override=tokens
            )["action_preds"]
        )

    def rollout(
        self,
        data: Dict[str, jnp.ndarray],
        rng: jax.Array,
        temperature: Optional[float] = None,
    ) -> jnp.ndarray:
        """Returns predicted bboxes (B, T, N, 4) in [0,1] frame coords."""
        cfg = self.cfg
        temperature = temperature or cfg.action_temp
        n = cfg.max_num_agents
        bboxes = jnp.asarray(data["bboxes"])[:, :, :n]
        b, t = bboxes.shape[:2]
        k = cfg.initial_frames_condition_num

        gt_tokens = discretize_actions(
            jnp.asarray(data["actions"])[:, :, :n], cfg.dir_disc, cfg.norm_disc
        ).astype(jnp.int32)
        tokens = jnp.zeros_like(gt_tokens)
        tokens = tokens.at[:, :k].set(gt_tokens[:, :k])
        if cfg.condition_last_frame:
            tokens = tokens.at[:, -1].set(gt_tokens[:, -1])

        for step in range(k, t):
            preds = self._apply(self.params, data, tokens)  # (B,T,N,2,V)
            logits = preds[:, step - 1].astype(jnp.float32) / temperature
            rng, key = jax.random.split(rng)
            sampled = jax.random.categorical(key, logits, axis=-1)  # (B,N,2)
            tokens = tokens.at[:, step].set(sampled)

        actions = undiscretize_actions(tokens, cfg.dir_disc, cfg.norm_disc)
        # keep GT conditioning actions exact for the seeded frames
        gt_actions = jnp.asarray(data["actions"])[:, :, :n]
        actions = actions.at[:, :k].set(gt_actions[:, :k])
        pred_bboxes = actions_to_bbox_seq(actions, bboxes[:, 0])
        # existence gating: agents absent at t=0 stay absent
        exist0 = jnp.asarray(data["existence"])[:, 0:1, :n].astype(pred_bboxes.dtype)
        return pred_bboxes * exist0

    # ------------------------------------------------------------------
    def render(self, pred_bboxes: np.ndarray, type_ids: np.ndarray) -> np.ndarray:
        """(T, N, 4) normalized boxes -> (T, H, W, 3) rendered frames [0,1]."""
        import jax.numpy as jnp

        from ..ops.rasterize import TYPE_COLORS, rasterize_frame, track_color

        cfg = self.cfg
        frames = []
        scale = np.asarray([cfg.train_W, cfg.train_H, cfg.train_W, cfg.train_H])
        for tstep in range(pred_bboxes.shape[0]):
            boxes = pred_bboxes[tstep] * scale
            valid = (pred_bboxes[tstep].sum(axis=-1) != 0)
            tcol = np.asarray(TYPE_COLORS)[
                np.clip(type_ids[tstep].astype(int).reshape(-1), 0, len(TYPE_COLORS) - 1)
            ]
            kcol = np.asarray(track_color(jnp.arange(boxes.shape[0])))
            frames.append(
                np.asarray(
                    rasterize_frame(
                        jnp.full((boxes.shape[0], 8, 2), -1e4),
                        jnp.asarray(boxes, jnp.float32),
                        jnp.asarray(valid),
                        jnp.asarray(tcol, jnp.float32),
                        jnp.asarray(kcol, jnp.float32),
                        height=cfg.train_H,
                        width=cfg.train_W,
                    )
                )
            )
        return np.stack(frames)

    def score(self, pred_frames: np.ndarray, gt_frames: np.ndarray) -> Dict[str, float]:
        miou, ap, ar = binary_mask_iou(gt_frames, pred_frames)
        fl = [0, len(gt_frames) - 1]
        miou_fl, ap_fl, ar_fl = binary_mask_iou(gt_frames[fl], pred_frames[fl])
        return dict(
            miou=miou, ap=ap, ar=ar,
            miou_first_last=miou_fl, ap_first_last=ap_fl, ar_first_last=ar_fl,
        )
