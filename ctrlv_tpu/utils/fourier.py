"""Fourier embeddings of bounding-box object attributes (jnp).

Behavioral parity: /root/reference/src/ctrlv/utils/util.py:177-239 —
per-object token = sin/cos(100^(k/8) * attrs) over the 13 scalar box
attributes (truncated, alpha, 4 bbox coords rescaled to [0,1], 3 dims,
3 locations, rotation_y) ++ L2-normalized 4-bit binary track-id ++
normalized frame index ++ 4-bit binary type id; zero-padded beyond
num_objects; optional dropout masks whole objects.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def rescale_bbox(bbox, image_size=(1242, 375), target_size=(1, 1)):
    """Rescale (..., 4) xyxy boxes between pixel spaces."""
    bbox = jnp.asarray(bbox)
    sx = target_size[0] / image_size[0]
    sy = target_size[1] / image_size[1]
    scale = jnp.asarray([sx, sy, sx, sy], bbox.dtype)
    return bbox * scale


def to_binary(x: jnp.ndarray, bits: int = 4) -> jnp.ndarray:
    """Integer -> (..., bits) binary expansion (LSB first)."""
    mask = 2 ** jnp.arange(bits)
    return (jnp.asarray(x)[..., None] & mask) != 0


class FourierEmbedder:
    """sin/cos features at num_freqs geometric frequencies (temperature^k/K)."""

    def __init__(self, num_freqs: int = 64, temperature: float = 100.0):
        self.num_freqs = num_freqs
        self.freq_bands = temperature ** (jnp.arange(num_freqs) / num_freqs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        temp = x[..., None] * self.freq_bands
        return jnp.concatenate([jnp.sin(temp), jnp.cos(temp)], axis=-1)


def get_fourier_embeds_from_boundingbox(
    objects: Dict[str, jnp.ndarray],
    image_size: Tuple[int, int] = (1242, 375),
    dropout_prob: float = 0.0,
    rng: Optional[jax.Array] = None,
    embed_dim: int = 8,
    bits: int = 4,
) -> jnp.ndarray:
    """Object dicts -> (B, F, N, embed_dim*2*(13+2*bits+1)) tokens.

    objects keys (each (B, F, N, ...)): bbox, truncated, alpha, dimensions,
    locations, rotation_y, track_id, id_type, num_objects (B, F) or (B, F, N)
    mask source.
    """
    bbox = rescale_bbox(objects["bbox"], image_size, (1, 1))
    feats = jnp.concatenate(
        [
            objects["truncated"][..., None],
            objects["alpha"][..., None],
            bbox,
            objects["dimensions"],
            objects["locations"],
            objects["rotation_y"][..., None],
        ],
        axis=-1,
    )  # (B, F, N, 13)
    b, f, n = feats.shape[:3]

    def l2norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    object_ids = l2norm(to_binary(objects["track_id"], bits).astype(feats.dtype))
    type_ids = l2norm(to_binary(objects["id_type"], bits).astype(feats.dtype))
    frame_ids = jnp.broadcast_to(
        (jnp.arange(f, dtype=feats.dtype) / f)[None, :, None, None], (b, f, n, 1)
    )
    tokens = jnp.concatenate([feats, object_ids, frame_ids, type_ids], axis=-1)

    freqs = 100.0 ** (jnp.arange(embed_dim, dtype=feats.dtype) / embed_dim)
    ang = tokens[..., None] * freqs  # (B,F,N,D,E)
    emb = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # (B,F,N,D,E,2)
    # match reference layout: permute so feature dim is last-major
    emb = jnp.transpose(emb, (0, 1, 2, 4, 5, 3)).reshape(b, f, n, -1)

    # zero-pad beyond num_objects
    num_objects = jnp.asarray(objects["num_objects"])
    if num_objects.ndim == 1:
        num_objects = num_objects[:, None]
    slot = jnp.arange(n)[None, None, :]
    valid = slot < num_objects[..., None]
    emb = jnp.where(valid[..., None], emb, 0.0)

    if dropout_prob > 0.0 and rng is not None:
        keep = jax.random.uniform(rng, (b, f, n, 1)) >= dropout_prob
        emb = jnp.where(keep, emb, 0.0)
    return emb
