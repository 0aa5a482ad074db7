"""Image-context encoder for the AR baseline ("map embedding").

Parity: /root/reference/src/ctrlv/bbox_generator_baseline/utils/
image_encoder.py:20-108 — frozen SVD VAE + CLIP of the initial frame; the
CLIP image embedding goes through an MLP to one context token, the VAE
latent goes through conv+pool stacks flattened channel-wise into 32 tokens
of hidden_dim; tokens are concatenated for the encoder's memory.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.clip_vision import clip_preprocess
from .config import BaselineConfig


class ImageContextProjector(nn.Module):
    """Trainable projections over frozen VAE/CLIP features."""

    cfg: BaselineConfig
    out_tokens_channels: int = 32
    pool_size: int = 16

    @nn.compact
    def __call__(self, clip_embed: jnp.ndarray, vae_latent: jnp.ndarray):
        """clip_embed (B, D_clip); vae_latent (B, h, w, 4) ->
        (B, 1 + out_tokens_channels, hidden)."""
        hidden = self.cfg.hidden_dim
        # CLIP token: MLP 1024 -> hidden
        c = nn.Dense(hidden, name="clip_fc1")(clip_embed)
        c = nn.relu(c)
        c = nn.Dense(hidden, name="clip_fc2")(c)[:, None, :]

        # VAE tokens: conv+pool to (pool, pool), flatten spatially per channel
        v = nn.Conv(self.out_tokens_channels // 2, (3, 3), padding="SAME", name="conv1")(
            vae_latent
        )
        v = nn.relu(v)
        v = _adaptive_max_pool(v, self.pool_size * 2)
        v = nn.Conv(self.out_tokens_channels, (3, 3), padding="SAME", name="conv2")(v)
        v = nn.relu(v)
        v = _adaptive_max_pool(v, self.pool_size)
        b = v.shape[0]
        v = v.reshape(b, self.pool_size * self.pool_size, self.out_tokens_channels)
        v = v.transpose(0, 2, 1)  # (B, C, pool^2) — channels become tokens
        v = nn.Dense(hidden, name="vae_fc1")(v)
        v = nn.relu(v)
        v = nn.Dense(hidden, name="vae_fc2")(v)
        return jnp.concatenate([c, v], axis=1)


def _adaptive_max_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """AdaptiveMaxPool2d equivalent for (B, H, W, C)."""
    b, h, w, c = x.shape
    if h < out_size or w < out_size:
        x = jax.image.resize(x, (b, max(h, out_size), max(w, out_size), c), "nearest")
        b, h, w, c = x.shape
    kh, kw = h // out_size, w // out_size
    x = x[:, : kh * out_size, : kw * out_size]
    x = x.reshape(b, out_size, kh, out_size, kw, c)
    return x.max(axis=(2, 4))


class ImageEncoder:
    """Frozen VAE+CLIP feature extraction + trainable projector."""

    def __init__(self, cfg: BaselineConfig, vae, vae_params, clip, clip_params):
        self.cfg = cfg
        self.vae = vae
        self.vae_params = vae_params
        self.clip = clip
        self.clip_params = clip_params
        self.projector = ImageContextProjector(cfg)

    def init(self, rng, images):
        clip_e, vae_l = self.features(images)
        return self.projector.init(rng, clip_e, vae_l)

    def features(self, images: jnp.ndarray):
        """images (B, H, W, 3) in [-1,1] -> frozen (clip_embed, vae_latent)."""
        pixel = clip_preprocess(images, image_size=self.clip.config.image_size)
        clip_e = jax.lax.stop_gradient(self.clip.apply(self.clip_params, pixel))
        vae_l = jax.lax.stop_gradient(
            self.vae.apply(self.vae_params, images, method=self.vae.encode)
        )
        return clip_e, vae_l

    def __call__(self, proj_params, images: jnp.ndarray) -> jnp.ndarray:
        clip_e, vae_l = self.features(images)
        return self.projector.apply(proj_params, clip_e, vae_l)
