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
    GroupNorm,
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

        # Temporal cross-attn context: first frame's CLIP token, batched to
        # match the frames-major temporal block input (B*F, S, C). The
        # temporal transformer runs ENTIRELY in the UNet's native layout —
        # LN/FF/cross-attn are last-axis ops, and the frame self-attention
        # uses the frames-major kernel (ops/mha.py) — so the reference's
        # (B*S, F, C) flatten/permute dance (SURVEY.md §7 hard-part 1,
        # unet_spatio_temporal_condition.py:87-99) never touches HBM.
        ctx_tokens = encoder_hidden_states.shape[-2]
        time_context = encoder_hidden_states.reshape(
            batch_size, num_frames, ctx_tokens, -1
        )[:, :1]  # (B, 1, T, cross) — first frame's token
        time_context = jnp.broadcast_to(
            time_context,
            (batch_size, num_frames, ctx_tokens, time_context.shape[-1]),
        ).reshape(bf, ctx_tokens, -1)

        residual = hidden_states
        h = GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(
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
            # Frames-major: stays (B*F, S, C) end to end.
            h_mix = TemporalBasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"temporal_transformer_blocks_{i}",
            )(h_mix, time_context, frames_major=num_frames)

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
