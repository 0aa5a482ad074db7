"""LayoutNet object-dict flatten/unflatten + AR rollout helpers.

Parity: /root/reference/src/ctrlv/utils/util_objectnet.py:3-76 —
convertObjects packs the padded object dict into flat per-frame layout
vectors, revertEmbed unpacks model output back into the dict, and
generate_step does the autoregressive rollout with the LayoutNet.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# per-object scalar layout: truncated, occluded, alpha, bbox4, dims3, loc3,
# rot_y, id_type, track_id  ->  16 numbers per object slot
OBJECT_DIM = 16


def convert_objects(objects: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Padded object dict (B, F, N, ...) -> flat layouts (B, F, N*OBJECT_DIM)."""
    parts = [
        objects["truncated"][..., None],
        objects["occluded"].astype(jnp.float32)[..., None],
        objects["alpha"][..., None],
        objects["bbox"],
        objects["dimensions"],
        objects["locations"],
        objects["rotation_y"][..., None],
        objects["id_type"].astype(jnp.float32)[..., None],
        objects["track_id"].astype(jnp.float32)[..., None],
    ]
    flat = jnp.concatenate(parts, axis=-1)  # (B, F, N, 16)
    b, f, n, d = flat.shape
    return flat.reshape(b, f, n * d)


def revert_embed(layout: jnp.ndarray, num_objects: int) -> Dict[str, jnp.ndarray]:
    """Flat layouts (B, F, N*OBJECT_DIM) -> object dict (inverse of convert_objects)."""
    b, f, _ = layout.shape
    x = layout.reshape(b, f, num_objects, OBJECT_DIM)
    return dict(
        truncated=x[..., 0],
        occluded=x[..., 1].astype(jnp.int32),
        alpha=x[..., 2],
        bbox=x[..., 3:7],
        dimensions=x[..., 7:10],
        locations=x[..., 10:13],
        rotation_y=x[..., 13],
        id_type=x[..., 14].astype(jnp.int32),
        track_id=x[..., 15].astype(jnp.int32),
    )


def generate_step(
    layout_net, params, seed_layouts: jnp.ndarray, cond: jnp.ndarray, steps: int
) -> jnp.ndarray:
    """AR rollout: feed (layout ++ cond) and append the model's next-frame
    prediction `steps` times. seed_layouts (B, S0, n_layout), cond (B, n_cond)."""
    layouts = seed_layouts
    for _ in range(steps):
        b, s, _ = layouts.shape
        cond_seq = jnp.broadcast_to(cond[:, None], (b, s, cond.shape[-1]))
        inputs = jnp.concatenate([layouts, cond_seq], axis=-1)
        pred, _ = layout_net.apply(params, inputs)
        layouts = jnp.concatenate([layouts, pred[:, -1:]], axis=1)
    return layouts
