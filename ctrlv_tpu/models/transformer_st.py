"""TransformerSpatioTemporalModel: paired spatial/temporal attention.

Spec: SURVEY.md §2.8 — spatial transformer over H*W tokens per frame,
temporal transformer over the frame axis per pixel, blended by a learned
alpha, with a sinusoidal frame-position embedding added before the temporal
pass and the *first frame's* CLIP token as temporal cross-attn context.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import (
    AlphaBlender,
    BasicTransformerBlock,
    Dtype,
    TemporalBasicTransformerBlock,
    TimestepEmbedding,
    get_timestep_embedding,
)


class TransformerSpatioTemporalModel(nn.Module):
    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B*F, H, W, C)
        encoder_hidden_states: jnp.ndarray,  # (B*F, 1, cross_dim)
        image_only_indicator: jnp.ndarray,  # (B, F)
    ) -> jnp.ndarray:
        bf, height, width, channels = hidden_states.shape
        num_frames = image_only_indicator.shape[-1]
        batch_size = bf // num_frames
        seq = height * width
        inner_dim = self.num_attention_heads * self.attention_head_dim

        # Temporal cross-attn context: first frame's CLIP token per pixel.
        ctx_tokens = encoder_hidden_states.shape[-2]
        time_context = encoder_hidden_states.reshape(
            batch_size, num_frames, ctx_tokens, -1
        )[:, 0]  # (B, T, cross)
        time_context = jnp.broadcast_to(
            time_context[:, None],
            (batch_size, seq, ctx_tokens, time_context.shape[-1]),
        ).reshape(batch_size * seq, ctx_tokens, -1)

        residual = hidden_states
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32, name="norm")(
            hidden_states
        ).astype(self.dtype)
        h = h.reshape(bf, seq, channels)
        h = nn.Dense(inner_dim, dtype=self.dtype, name="proj_in")(h)

        # Frame-position embedding (added before the temporal pass).
        frame_ids = jnp.tile(jnp.arange(num_frames), (batch_size,))  # (B*F,)
        t_emb = get_timestep_embedding(frame_ids, self.in_channels)
        emb = TimestepEmbedding(
            self.in_channels * 4,
            out_dim=self.in_channels,
            dtype=self.dtype,
            name="time_pos_embed",
        )(t_emb.astype(self.dtype))
        emb = emb[:, None, :]  # (B*F, 1, C)

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, encoder_hidden_states)

            h_mix = h + emb
            # (B*F, S, C) -> (B*S, F, C): frames become the sequence axis.
            h_mix = (
                h_mix.reshape(batch_size, num_frames, seq, inner_dim)
                .transpose(0, 2, 1, 3)
                .reshape(batch_size * seq, num_frames, inner_dim)
            )
            h_mix = TemporalBasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"temporal_transformer_blocks_{i}",
            )(h_mix, time_context)
            h_mix = (
                h_mix.reshape(batch_size, seq, num_frames, inner_dim)
                .transpose(0, 2, 1, 3)
                .reshape(bf, seq, inner_dim)
            )

            h = AlphaBlender(
                alpha=0.5, merge_strategy="learned_with_images", name="time_mixer"
            )(
                x_spatial=h,
                x_temporal=h_mix,
                image_only_indicator=image_only_indicator,
                ndims_after_batch_frames=2,
            )

        h = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(h)
        h = h.reshape(bf, height, width, channels)
        return h + residual
