"""Action discretization + data processing for the AR bbox baseline (jnp).

Behavioral parity: /root/reference/src/ctrlv/bbox_generator_baseline/utils/
utils.py:12-341 — polar displacement actions of the two box corners
(24 direction bins x 16 norm bins => vocab 384, norms clipped to 0.1),
bbox<->action conversions, coordinate-token variants, track-id slot
alignment, leaving-frame smoothing, and the full process_data pipeline.

TPU-first deltas: actions_to_bbox_seq is a lax.scan (cumulative polar
integration) instead of a Python timestep loop; normalize_track_ids is
vectorized with argsort-based unique remapping instead of per-batch dict
loops.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

DIR_DISCRETIZATION = 24
NORM_DISCRETIZATION = 16
MAX_DIR = 2 * np.pi
MIN_DIR = 0.0
MAX_NORM = 0.1
MIN_NORM = 0.0


def discretize_actions(actions, dir_disc=DIR_DISCRETIZATION, norm_disc=NORM_DISCRETIZATION):
    """(..., 2, 2) continuous (direction, norm) -> (..., 2) tokens."""
    d = jnp.clip(actions[..., 0], MIN_DIR, MAX_DIR)
    n = jnp.clip(actions[..., 1], MIN_NORM, MAX_NORM)
    d = jnp.round((d - MIN_DIR) / (MAX_DIR - MIN_DIR) * (dir_disc - 1))
    n = jnp.round((n - MIN_NORM) / (MAX_NORM - MIN_NORM) * (norm_disc - 1))
    return d * norm_disc + n


def undiscretize_actions(tokens, dir_disc=DIR_DISCRETIZATION, norm_disc=NORM_DISCRETIZATION):
    """(..., 2) tokens -> (..., 2, 2) continuous (direction, norm)."""
    d = tokens // norm_disc
    n = tokens % norm_disc
    d = d / (dir_disc - 1) * (MAX_DIR - MIN_DIR) + MIN_DIR
    n = n / (norm_disc - 1) * (MAX_NORM - MIN_NORM) + MIN_NORM
    return jnp.stack([d, n], axis=-1)


def discretize_coords(coords, vocabulary_size: int):
    return jnp.round(jnp.clip(coords, 0.0, 1.0) * (vocabulary_size - 1)).astype(jnp.int32)


def undiscretize_coords(tokens, vocabulary_size: int):
    return tokens.astype(jnp.float32) / (vocabulary_size - 1)


def bbox_seq_to_actions(bboxes: jnp.ndarray) -> jnp.ndarray:
    """(B, T, N, 4) -> (B, T, N, 2, 2) polar corner displacements.

    Action at t describes the move from t-1 to t; action[.., 0] is the
    top-left corner, [.., 1] the bottom-right. t=0 action is zero.
    """
    prev = bboxes[:, :-1]
    curr = bboxes[:, 1:]
    d = curr - prev  # (B, T-1, N, 4): dx1, dy1, dx2, dy2
    dx = jnp.stack([d[..., 0], d[..., 2]], axis=-1)
    dy = jnp.stack([d[..., 1], d[..., 3]], axis=-1)
    direction = jnp.mod(jnp.arctan2(dy, dx) + 2 * np.pi, 2 * np.pi)
    norm = jnp.sqrt(dx**2 + dy**2)
    actions = jnp.stack([direction, norm], axis=-1)  # (B, T-1, N, 2, 2)
    zero = jnp.zeros_like(actions[:, :1])
    return jnp.concatenate([zero, actions], axis=1)


def actions_to_bbox_seq(
    actions: jnp.ndarray, initial_bboxes: jnp.ndarray, discard_first_action: bool = False
) -> jnp.ndarray:
    """(B, T, N, 2, 2) + (B, N, 4) -> (B, T, N, 4) via cumulative sums."""
    direction = actions[..., 0]
    norm = actions[..., 1]
    dx = norm * jnp.cos(direction)  # (B, T, N, 2)
    dy = norm * jnp.sin(direction)
    # t=0 (and optionally t=0 only when discard_first_action) contributes 0
    start = 1 if discard_first_action else 0
    t_idx = jnp.arange(actions.shape[1])
    live = (t_idx >= max(start, 1))[None, :, None, None]
    dx = jnp.where(live, dx, 0.0)
    dy = jnp.where(live, dy, 0.0)
    cx = jnp.cumsum(dx, axis=1)
    cy = jnp.cumsum(dy, axis=1)
    deltas = jnp.stack([cx[..., 0], cy[..., 0], cx[..., 1], cy[..., 1]], axis=-1)
    return initial_bboxes[:, None] + deltas


def reshape_data(tensor: jnp.ndarray, track_ids: jnp.ndarray) -> jnp.ndarray:
    """Scatter (B, T, N, D) rows into the slot given by track_ids (−1=null)."""
    b, t, n = track_ids.shape
    out = jnp.zeros_like(tensor)
    valid = track_ids >= 0
    safe_ids = jnp.where(valid, track_ids, 0)
    bi = jnp.arange(b)[:, None, None]
    ti = jnp.arange(t)[None, :, None]
    vals = jnp.where(valid[..., None], tensor, 0.0)
    # each valid id occupies a unique slot within a frame (normalize_track_ids
    # guarantees it), so scatter-add == scatter; null rows add zeros to slot 0.
    return out.at[bi, ti, safe_ids].add(vals)


def normalize_track_ids(track_ids: np.ndarray, max_num_agents: Optional[int] = None) -> np.ndarray:
    """Recast raw track ids to slot ids in [0, N). numpy (host-side).

    Semantics: id 0 in slot 0 is a real id; other zeros are padding (-1).
    First-seen order defines the new index, capped at N unique agents.
    """
    track_ids = np.asarray(track_ids).copy()
    b, t, n = track_ids.shape
    max_num_agents = max_num_agents or n
    first_pos_real = np.zeros_like(track_ids, dtype=bool)
    first_pos_real[:, :, 0] = track_ids[:, :, 0] == 0
    null_mask = (track_ids == 0) & ~first_pos_real
    track_ids[null_mask] = -1

    new_ids = np.full_like(track_ids, -1)
    for bi in range(b):
        uniq = []
        seen = set()
        for val in track_ids[bi].reshape(-1):
            if val != -1 and val not in seen:
                seen.add(val)
                uniq.append(val)
                if len(uniq) >= max_num_agents:
                    break
        mapping = {v: i for i, v in enumerate(uniq)}
        flat = track_ids[bi].reshape(-1)
        out = np.array([mapping.get(v, -1) for v in flat])
        new_ids[bi] = out.reshape(t, n)
    return new_ids


def smooth_gt_leaving_frame(actions: jnp.ndarray, bboxes: jnp.ndarray) -> jnp.ndarray:
    """Repeat the last real action after a bbox collapses to null."""
    null_mask = jnp.all(bboxes == 0, axis=-1)  # (B, T, N)
    cumsum = jnp.cumsum(null_mask.astype(jnp.int32), axis=1)
    t_idx = jnp.arange(bboxes.shape[1])[None, :, None]
    prev_idx = jnp.clip(t_idx - cumsum, 0)
    return jnp.take_along_axis(
        actions, prev_idx[..., None, None], axis=1
    )


def process_data(
    cfg, object_data: Dict[str, np.ndarray], bbox_frame_size=(1382, 512)
) -> Dict[str, jnp.ndarray]:
    """objects batch -> aligned/normalized actions+coords+existence."""
    bboxes = jnp.asarray(object_data["bbox"], jnp.float32)
    type_ids = jnp.asarray(object_data["id_type"], jnp.float32)
    track_ids = np.asarray(object_data["track_id"])

    track_ids = jnp.asarray(normalize_track_ids(track_ids, bboxes.shape[2]))
    bboxes = reshape_data(bboxes, track_ids)
    type_ids = reshape_data(type_ids[..., None], track_ids)
    existence = (bboxes[..., -1:] != 0)

    w, h = bbox_frame_size
    scale = jnp.asarray([1.0 / w, 1.0 / h, 1.0 / w, 1.0 / h])
    bboxes = bboxes * scale

    actions, coords = None, None
    if not cfg.pred_coords:
        actions = bbox_seq_to_actions(bboxes)
        if cfg.smooth_gt_leaving_frame:
            actions = smooth_gt_leaving_frame(actions, bboxes)
    else:
        coords = bboxes

    return dict(
        actions=actions,
        coords=coords,
        bboxes=bboxes,
        type_ids=type_ids,
        existence=existence,
    )
