"""ResNet blocks: spatial 2D, temporal (3,1,1)-conv, and the blended ST block.

Spec: SURVEY.md §2.8 — each SVD block = spatial ResBlock + temporal ResBlock
with a learned AlphaBlender mix. Layout: spatial blocks take (B*F, H, W, C);
the ST wrapper reshapes to (B, F, H, W, C) for the temporal conv.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .layers import AlphaBlender, Dtype, GroupNorm


class ResnetBlock2D(nn.Module):
    """GN-SiLU-Conv x2 with time-embedding injection and 1x1 shortcut."""

    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = 1280
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        residual = x
        h = GroupNorm(
            num_groups=self.groups, epsilon=self.eps, name="norm1"
        )(x).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1"
        )(h)

        if temb is not None and self.temb_channels is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb_proj[:, None, None, :]

        h = GroupNorm(
            num_groups=self.groups, epsilon=self.eps, name="norm2"
        )(h).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2"
        )(h)

        if self.in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class TemporalResnetBlock(nn.Module):
    """ResNet block with (3,1,1) temporal convs over (B, F, H, W, C)."""

    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = 1280
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # x: (B, F, H, W, C); temb: (B, F, temb_channels)
        residual = x
        h = GroupNorm(num_groups=32, epsilon=self.eps, name="norm1")(
            x
        ).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels,
            (3, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype,
            name="conv1",
        )(h)

        if temb is not None and self.temb_channels is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + temb_proj[:, :, None, None, :]

        h = GroupNorm(num_groups=32, epsilon=self.eps, name="norm2")(
            h
        ).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels,
            (3, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype,
            name="conv2",
        )(h)

        if self.in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class SpatioTemporalResBlock(nn.Module):
    """Spatial ResBlock + temporal ResBlock blended by a learned alpha.

    Input/output (B*F, H, W, C), with num_frames recovered from
    image_only_indicator's shape — matching the reference's flatten(0,1)
    batch-frame convention.
    """

    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = 1280
    eps: float = 1e-6
    merge_factor: float = 0.5
    merge_strategy: str = "learned_with_images"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        image_only_indicator: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        num_frames = image_only_indicator.shape[-1]
        hidden_states = ResnetBlock2D(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            temb_channels=self.temb_channels,
            eps=self.eps,
            dtype=self.dtype,
            name="spatial_res_block",
        )(hidden_states, temb)

        bf, h, w, c = hidden_states.shape
        b = bf // num_frames
        x = hidden_states.reshape(b, num_frames, h, w, c)
        temb_f = temb.reshape(b, num_frames, -1) if temb is not None else None
        x_temporal = TemporalResnetBlock(
            in_channels=self.out_channels,
            out_channels=self.out_channels,
            temb_channels=self.temb_channels,
            eps=self.eps,
            dtype=self.dtype,
            name="temporal_res_block",
        )(x, temb_f)

        mixed = AlphaBlender(
            alpha=self.merge_factor,
            merge_strategy=self.merge_strategy,
            switch_spatial_to_temporal_mix=True,
            name="time_mixer",
        )(
            x_spatial=x.reshape(bf, h, w, c),
            x_temporal=x_temporal.reshape(bf, h, w, c),
            image_only_indicator=image_only_indicator,
            ndims_after_batch_frames=3,
        )
        return mixed
