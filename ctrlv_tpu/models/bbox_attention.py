"""BBOXFrameAttention: rezero transformer producing per-frame cond latents.

Behavioral spec (/root/reference/src/ctrlv/models/attention.py:17-36 +
vendored Transformer2DModel): continuous-input transformer over the
first-frame latent's pixels — GroupNorm(4) + 1x1 conv proj_in, N
BasicTransformerBlocks (heads=num_frames, head_dim=out_channels, optional
cross-attn to encoded object tokens), 1x1 conv proj_out — with a rezero
scalar initialized to 0 so the module starts as an exact channel-repeat of
its input:  out = h * rz_weight + repeat(x, out_ch/in_ch)  (:560).

Usage (unet_spatio_temporal_condition.py:214-236): in_channels=4,
out_channels=4*num_frames, 8 layers — maps one frame latent to 25 frames
of conditioning latents.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import BasicTransformerBlock, Dtype, GroupNorm


class BBOXFrameAttention(nn.Module):
    num_frames: int
    in_channels: int = 4
    out_channels: int = 4
    num_layers: int = 2
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_latents: jnp.ndarray,  # (B, h, w, C_in)
        bbox_tokens: Optional[jnp.ndarray] = None,  # (B, T, D)
    ) -> jnp.ndarray:
        # Reference construction: heads=num_frames, head_dim=out_channels
        # (= 4*num_frames in the UNet variant) => inner_dim = F * out_ch.
        b, h, w, c = image_latents.shape
        inner_dim = self.num_frames * self.out_channels
        residual = image_latents

        x = GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, name="norm",
        )(image_latents).astype(self.dtype)
        x = nn.Conv(inner_dim, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, inner_dim)

        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner_dim,
                num_attention_heads=self.num_frames,
                attention_head_dim=self.out_channels,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(x, bbox_tokens)

        x = x.reshape(b, h, w, inner_dim)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="proj_out")(x)

        rz_weight = self.param("rz_weight", nn.initializers.zeros, (1,))
        repeat = self.out_channels // self.in_channels
        residual_rep = jnp.tile(residual, (1, 1, 1, repeat))
        return x * rz_weight.astype(x.dtype) + residual_rep
