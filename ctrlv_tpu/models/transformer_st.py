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
    """Spatio-temporal transformer (SVD block): spatial transformer +
    temporal transformer with learned alpha-blend per layer.

    temporal_layout:
      "seq" (default) — the temporal block runs on (B*S, F, C) via an
        explicit HBM transpose pair (the reference's flatten/permute dance,
        unet_spatio_temporal_condition.py:87-99; XLA turns it into two
        relayout copies that fuse well with neighbors).
      "frames_major" — the temporal block stays in the UNet-native
        (B*F, S, C) layout and the frame attention uses the frames-major
        Pallas kernel. Measured NET-SLOWER on the flagship step (463 vs
        457 ms, PERF.md round-3: the kernel's strided DMA + VMEM slab
        transposes cost more than the copies they remove, and the temporal
        LN stats lose their (B*S, F) shape advantage) — kept as an opt-in
        documented negative result and for frame-sharded experimentation.
    """

    num_attention_heads: int
    attention_head_dim: int
    in_channels: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = 1024
    temporal_layout: str = "seq"
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

        fm = self.temporal_layout == "frames_major"
        # Temporal cross-attn context: first frame's CLIP token, batched to
        # match the temporal block input ((B*F, S, C) frames-major, else
        # (B*S, F, C)).
        ctx_tokens = encoder_hidden_states.shape[-2]
        tc = encoder_hidden_states.reshape(
            batch_size, num_frames, ctx_tokens, -1
        )[:, :1]  # (B, 1, T, cross) — first frame's token
        if fm:
            time_context = jnp.broadcast_to(
                tc, (batch_size, num_frames, ctx_tokens, tc.shape[-1])
            ).reshape(bf, ctx_tokens, -1)
        else:
            time_context = jnp.broadcast_to(
                tc, (batch_size, seq, ctx_tokens, tc.shape[-1])
            ).reshape(batch_size * seq, ctx_tokens, -1)

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
            tblk = TemporalBasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"temporal_transformer_blocks_{i}",
            )
            if fm:
                # Frames-major: stays (B*F, S, C) end to end.
                h_mix = tblk(h_mix, time_context, frames_major=num_frames)
            else:
                # (B*F, S, C) -> (B*S, F, C): frames become the sequence axis.
                h_mix = (
                    h_mix.reshape(batch_size, num_frames, seq, inner_dim)
                    .transpose(0, 2, 1, 3)
                    .reshape(batch_size * seq, num_frames, inner_dim)
                )
                h_mix = tblk(h_mix, time_context)
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
