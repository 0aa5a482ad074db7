"""CLIP vision encoder with projection (ViT-H/14) — flax, channels-last.

Provides the `image_embeds` conditioning path the reference gets from
transformers' CLIPVisionModelWithProjection (SURVEY.md §2.8; usage
/root/reference/src/ctrlv/utils/util.py:97-125: antialiased 224x224 resize,
CLIP normalize, single projected embedding per image).

SVD-XT's encoder is the LAION ViT-H/14 (hidden 1280, 32 layers, 16 heads,
penultimate projection to 1024, exact GELU).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention
from .layers import Dtype

# CLIP preprocessing constants (OpenAI CLIP normalization).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5

    @classmethod
    def tiny(cls) -> "CLIPVisionConfig":
        return cls(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            image_size=28,
            patch_size=14,
            projection_dim=48,
        )


class CLIPAttention(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, s, c = x.shape
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, heads, head_dim)
        k = k.reshape(b, s, heads, head_dim)
        v = v.reshape(b, s, heads, head_dim)
        out = dot_product_attention(q, k, v)
        out = out.reshape(b, s, c)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPVisionConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm1")(
            x
        ).astype(self.dtype)
        x = x + CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm2")(
            x
        ).astype(self.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPVisionModelWithProjection(nn.Module):
    config: CLIPVisionConfig = CLIPVisionConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, 224, 224, 3) normalized pixels -> (B, projection_dim) image_embeds."""
        cfg = self.config
        b = pixel_values.shape[0]
        num_patches = (cfg.image_size // cfg.patch_size) ** 2

        patch_embeds = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patch_embeds = patch_embeds.reshape(b, num_patches, cfg.hidden_size)

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        class_embeds = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([class_embeds, patch_embeds], axis=1)

        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (num_patches + 1, cfg.hidden_size),
        )
        x = x + position_embedding.astype(self.dtype)[None]

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="pre_layrnorm"
        )(x).astype(self.dtype)

        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)

        pooled = x[:, 0]
        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="post_layernorm"
        )(pooled).astype(self.dtype)
        image_embeds = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype, name="visual_projection"
        )(pooled)
        return image_embeds


def clip_preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[-1,1] (B,H,W,3) frames -> CLIP-normalized (B,224,224,3).

    Mirrors encode_video_image (/root/reference/src/ctrlv/utils/util.py:97-125):
    antialiased resize to 224, rescale to [0,1], clamp, CLIP mean/std.
    Uses jax.image bicubic+antialias in place of the reference's
    gaussian-blur+bicubic — behaviorally equivalent downsampling.
    """
    import jax

    b = images.shape[0]
    images = jax.image.resize(
        images, (b, image_size, image_size, images.shape[-1]), method="bicubic"
    )
    images = jnp.clip((images + 1.0) * 0.5, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images.dtype)
    return (images - mean) / std
