"""KittiObjectNet: Fourier+embedding MLP object encoder (legacy path).

Behavioral parity: /root/reference/src/ctrlv/models/kitti_object_net.py —
32-freq Fourier features of the 13 scalar box attrs (truncated, alpha,
bbox4, dims3, loc3, rot_y) plus learned id/occluded embeddings (2*FF each)
-> 3-layer SiLU MLP -> one out_dim token per object slot. Input is the
padded objects dict (B, N, ...) or clip form (B, F, N, ...).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils.fourier import FourierEmbedder
from .layers import Dtype

FOURIER_FREQS = 32


class KittiObjectNet(nn.Module):
    out_dim: int
    num_id_classes: int = 9
    num_occluded_classes: int = 5
    mid_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, objects: dict) -> jnp.ndarray:
        id_type = objects["id_type"]
        original_shape = id_type.shape
        is_clip = id_type.ndim == 3

        def flat(x):
            return x.reshape((-1,) + x.shape[2:]) if is_clip else x

        ff = FourierEmbedder(num_freqs=FOURIER_FREQS)
        fourier_input = jnp.concatenate(
            [
                flat(objects["truncated"])[..., None],
                flat(objects["alpha"])[..., None],
                flat(objects["bbox"]),
                flat(objects["dimensions"]),
                flat(objects["locations"]),
                flat(objects["rotation_y"])[..., None],
            ],
            axis=-1,
        )  # (B, N, 13)
        b, n = fourier_input.shape[:2]
        fourier_embed = ff(fourier_input).reshape(b, n, -1)  # (B, N, 13*2*FF)

        id_embed = nn.Embed(
            self.num_id_classes, 2 * FOURIER_FREQS,
            embedding_init=nn.initializers.normal(0.01), name="id_embedder",
        )(flat(id_type))
        occ_embed = nn.Embed(
            self.num_occluded_classes, 2 * FOURIER_FREQS,
            embedding_init=nn.initializers.normal(0.01), name="occluded_embedder",
        )(jnp.clip(flat(objects["occluded"]).astype(jnp.int32), 0,
                   self.num_occluded_classes - 1))

        x = jnp.concatenate([fourier_embed, id_embed, occ_embed], axis=-1)
        x = x.astype(self.dtype)
        x = nn.Dense(self.mid_dim, kernel_init=nn.initializers.he_normal(),
                     dtype=self.dtype, name="mlp_0")(x)
        x = nn.silu(x)
        x = nn.Dense(self.mid_dim, kernel_init=nn.initializers.he_normal(),
                     dtype=self.dtype, name="mlp_2")(x)
        x = nn.silu(x)
        x = nn.Dense(self.out_dim, kernel_init=nn.initializers.he_normal(),
                     dtype=self.dtype, name="mlp_4")(x)
        if is_clip:
            x = x.reshape(original_shape[:2] + x.shape[1:])
        return x
