"""Legacy image UNet with object conditioning (UNet2DConditionModel).

Behavioral parity: /root/reference/src/ctrlv/models/unet_2d_condition.py —
a standard SD-style 2D text-conditioned UNet with two additions:
  - addition_embed_type == "object": a TextTimeEmbedding (attention-pooled
    object tokens -> time-embed dim) scaled by a learned scalar `object_w`
    and added to the time embedding (:39-49, 80-87),
  - encoder_hid_dim_type == "text_object_proj": projected object tokens
    scaled by learned `object_u` are added onto the text encoder states
    (:22-25, 89-99).

This is the legacy image-diffusion path (not the SVD video path); topology
is the SD1.x 4-level UNet built from the same ResnetBlock2D /
BasicTransformerBlock primitives as the video UNet.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    Attention,
    BasicTransformerBlock,
    Downsample2D,
    Dtype,
    GroupNorm,
    TimestepEmbedding,
    Upsample2D,
    get_timestep_embedding,
)
from .resnet import ResnetBlock2D


@dataclasses.dataclass(frozen=True)
class UNet2DConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8
    addition_embed_type: Optional[str] = None  # "object"
    encoder_hid_dim_type: Optional[str] = None  # "text_object_proj"
    object_dim: int = 768

    @classmethod
    def tiny(cls, **kw) -> "UNet2DConfig":
        return cls(
            block_out_channels=(32, 64),
            cross_attention_dim=32,
            attention_head_dim=4,
            object_dim=32,
            **kw,
        )


class Transformer2D(nn.Module):
    """Spatial transformer: GN + 1x1 proj + blocks + 1x1 proj + residual."""

    in_channels: int
    num_heads: int
    num_layers: int = 1
    cross_attention_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        z = GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(
            x
        ).astype(self.dtype)
        z = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(z)
        z = z.reshape(b, h * w, c)
        for i in range(self.num_layers):
            z = BasicTransformerBlock(
                dim=c,
                num_attention_heads=self.num_heads,
                attention_head_dim=c // self.num_heads,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(z, context)
        z = z.reshape(b, h, w, c)
        z = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(z)
        return z + residual


class TextTimeEmbedding(nn.Module):
    """Attention-pooled token embedding -> time-embed dim (diffusers flavor)."""

    time_embed_dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):  # (B, T, D)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(tokens).astype(self.dtype)
        # attention pooling: learned query attends over tokens
        d = x.shape[-1]
        query = self.param("pool_query", nn.initializers.normal(0.02), (1, 1, d))
        q = jnp.broadcast_to(query.astype(self.dtype), (x.shape[0], 1, d))
        pooled = Attention(
            query_dim=d,
            heads=self.num_heads,
            dim_head=max(d // self.num_heads, 1),
            cross_attention_dim=d,
            dtype=self.dtype,
            name="pool_attn",
        )(q, context=x)[:, 0]
        pooled = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="proj")(pooled)
        pooled = nn.LayerNorm(dtype=jnp.float32, name="norm2")(pooled).astype(self.dtype)
        return pooled


class UNet2DConditionModel(nn.Module):
    config: UNet2DConfig = UNet2DConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C)
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,  # (B, T, cross_dim) text states
        object_embs: Optional[jnp.ndarray] = None,  # (B, N, object_dim)
    ) -> jnp.ndarray:
        cfg = self.config
        b = sample.shape[0]
        time_embed_dim = cfg.block_out_channels[0] * 4

        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (b,))
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0])
        emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype)
        )

        if cfg.addition_embed_type == "object" and object_embs is not None:
            object_w = self.param("object_w", nn.initializers.ones, (1,))
            aug = TextTimeEmbedding(
                time_embed_dim, dtype=self.dtype, name="add_embedding"
            )(object_embs)
            emb = emb + object_w.astype(emb.dtype) * aug

        context = encoder_hidden_states.astype(self.dtype)
        if cfg.encoder_hid_dim_type == "text_object_proj" and object_embs is not None:
            object_u = self.param("object_u", nn.initializers.ones, (1,))
            proj = nn.Dense(
                cfg.cross_attention_dim, dtype=self.dtype, name="encoder_hid_proj"
            )(object_embs.astype(self.dtype))
            # pad/truncate object tokens onto the text sequence length
            t_len = context.shape[1]
            o_len = proj.shape[1]
            if o_len < t_len:
                proj = jnp.pad(proj, ((0, 0), (0, t_len - o_len), (0, 0)))
            proj = proj[:, :t_len]
            context = context + object_u.astype(context.dtype) * proj

        sample = sample.astype(self.dtype)
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(sample)

        num_levels = len(cfg.block_out_channels)
        skips = [x]
        ch = cfg.block_out_channels[0]
        for i, out_ch in enumerate(cfg.block_out_channels):
            is_final = i == num_levels - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    in_channels=ch if j == 0 else out_ch,
                    out_channels=out_ch,
                    eps=1e-5,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}",
                )(x, emb)
                if not is_final:
                    x = Transformer2D(
                        in_channels=out_ch,
                        num_heads=cfg.attention_head_dim,
                        cross_attention_dim=cfg.cross_attention_dim,
                        dtype=self.dtype,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(x, context)
                skips.append(x)
            if not is_final:
                x = Downsample2D(out_ch, dtype=self.dtype, name=f"down_blocks_{i}_downsample")(x)
                skips.append(x)
            ch = out_ch

        # mid
        x = ResnetBlock2D(ch, ch, eps=1e-5, dtype=self.dtype, name="mid_resnets_0")(x, emb)
        x = Transformer2D(
            in_channels=ch,
            num_heads=cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim,
            dtype=self.dtype,
            name="mid_attention",
        )(x, context)
        x = ResnetBlock2D(ch, ch, eps=1e-5, dtype=self.dtype, name="mid_resnets_1")(x, emb)

        # up
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(reversed_ch):
            is_first_level = i == 0
            in_ch = reversed_ch[min(i + 1, num_levels - 1)]
            prev = reversed_ch[max(i - 1, 0)] if i > 0 else reversed_ch[0]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock2D(
                    in_channels=x.shape[-1],
                    out_channels=out_ch,
                    eps=1e-5,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}",
                )(x, emb)
                if not is_first_level:
                    x = Transformer2D(
                        in_channels=out_ch,
                        num_heads=cfg.attention_head_dim,
                        cross_attention_dim=cfg.cross_attention_dim,
                        dtype=self.dtype,
                        name=f"up_blocks_{i}_attentions_{j}",
                    )(x, context)
            if i != num_levels - 1:
                x = Upsample2D(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsample")(x)

        x = GroupNorm(num_groups=32, epsilon=1e-5, name="conv_norm_out")(
            x
        ).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)
        return x
