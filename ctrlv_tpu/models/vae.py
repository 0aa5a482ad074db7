"""AutoencoderKLTemporalDecoder — SVD's VAE, TPU-native flax.

Spec (SURVEY.md §2.8): standard SD 2D encoder (4 down blocks, channels
128/256/512/512, mid block with single-head attention) producing 2*4ch
moments; TemporalDecoder whose ResBlocks are SpatioTemporalResBlocks
(merge_strategy="learned", no temb) plus a final (3,1,1) temporal conv.
Reference usage: /root/reference/tools/train_video_diffusion.py:86-88
(latent_dist.sample/mode, scaling_factor), pipeline chunked decode
(decode_chunk_size=8, /root/reference/tools/eval_overall.py:88).

Layout: images (B, H, W, C); videos decoded as (B*F, h, w, 4) latents with
num_frames passed explicitly (the temporal conv needs the frame axis).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Attention, DownsampleVAE2D, Dtype, GroupNorm, Upsample2D
from .resnet import ResnetBlock2D, SpatioTemporalResBlock


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    force_upcast: bool = True

    @classmethod
    def tiny(cls) -> "VAEConfig":
        return cls(block_out_channels=(32, 32), layers_per_block=1)

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


class DownEncoderBlock2D(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=None,
                eps=1e-6,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x)
        if self.add_downsample:
            x = DownsampleVAE2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    """VAE mid block: resnet, single-head attention (residual), resnet."""

    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            temb_channels=None,
            eps=1e-6,
            dtype=self.dtype,
            name="resnets_0",
        )(x)
        b, h, w, c = x.shape
        attn_in = x.reshape(b, h * w, c)
        attn_out = Attention(
            query_dim=c,
            heads=1,
            dim_head=c,
            qkv_bias=True,
            residual_connection=True,
            norm_num_groups=32,
            eps=1e-6,
            dtype=self.dtype,
            name="attentions_0",
        )(attn_in)
        x = attn_out.reshape(b, h, w, c)
        x = ResnetBlock2D(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            temb_channels=None,
            eps=1e-6,
            dtype=self.dtype,
            name="resnets_1",
        )(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(x)
        out_ch = cfg.block_out_channels[0]
        for i, ch in enumerate(cfg.block_out_channels):
            in_ch, out_ch = out_ch, ch
            x = DownEncoderBlock2D(
                in_channels=in_ch,
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                add_downsample=i != len(cfg.block_out_channels) - 1,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(x)
        x = UNetMidBlock2D(out_ch, dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(num_groups=32, epsilon=1e-6, name="conv_norm_out")(
            x
        ).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)
        return x


class MidBlockTemporalDecoder(nn.Module):
    in_channels: int
    attention_head_dim: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_only_indicator):
        x = SpatioTemporalResBlock(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            temb_channels=None,
            eps=1e-6,
            merge_factor=0.0,
            merge_strategy="learned",
            dtype=self.dtype,
            name="resnets_0",
        )(x, None, image_only_indicator)
        b, h, w, c = x.shape
        attn_out = Attention(
            query_dim=c,
            heads=c // self.attention_head_dim,
            dim_head=self.attention_head_dim,
            qkv_bias=True,
            residual_connection=True,
            norm_num_groups=32,
            eps=1e-6,
            dtype=self.dtype,
            name="attentions_0",
        )(x.reshape(b, h * w, c))
        x = attn_out.reshape(b, h, w, c)
        x = SpatioTemporalResBlock(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            temb_channels=None,
            eps=1e-6,
            merge_factor=0.0,
            merge_strategy="learned",
            dtype=self.dtype,
            name="resnets_1",
        )(x, None, image_only_indicator)
        return x


class UpBlockTemporalDecoder(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_only_indicator):
        for i in range(self.num_layers):
            x = SpatioTemporalResBlock(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=None,
                eps=1e-6,
                merge_factor=0.0,
                merge_strategy="learned",
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, None, image_only_indicator)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class TemporalDecoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, num_frames: int):
        cfg = self.config
        z = z.astype(self.dtype)
        bf = z.shape[0]
        batch = bf // num_frames
        image_only_indicator = jnp.zeros((batch, num_frames), dtype=self.dtype)

        x = nn.Conv(
            cfg.block_out_channels[-1], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(z)
        x = MidBlockTemporalDecoder(
            cfg.block_out_channels[-1],
            attention_head_dim=cfg.block_out_channels[-1],
            dtype=self.dtype,
            name="mid_block",
        )(x, image_only_indicator)

        reversed_channels = tuple(reversed(cfg.block_out_channels))
        ch = reversed_channels[0]
        for i, out_ch in enumerate(reversed_channels):
            x = UpBlockTemporalDecoder(
                in_channels=ch,
                out_channels=out_ch,
                num_layers=cfg.layers_per_block + 1,
                add_upsample=i != len(reversed_channels) - 1,
                dtype=self.dtype,
                name=f"up_blocks_{i}",
            )(x, image_only_indicator)
            ch = out_ch

        x = GroupNorm(num_groups=32, epsilon=1e-6, name="conv_norm_out")(
            x
        ).astype(self.dtype)
        x = nn.silu(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)

        # Final temporal conv over the frame axis: (B*F,H,W,C) -> (B,F,H,W,C)
        h, w, c = x.shape[1:]
        xt = x.reshape(batch, num_frames, h, w, c)
        xt = nn.Conv(
            cfg.out_channels,
            (3, 1, 1),
            padding=((1, 1), (0, 0), (0, 0)),
            dtype=self.dtype,
            name="time_conv_out",
        )(xt)
        return xt.reshape(bf, h, w, c)


class AutoencoderKLTemporalDecoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.decoder = TemporalDecoder(self.config, dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B,H,W,3) -> (B,h,w,8) mean||logvar."""
        return self.quant_conv(self.encoder(x))

    def encode(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None, sample: bool = False
    ) -> jnp.ndarray:
        """VAE-encode; mode unless sample=True (latent_dist.sample parity)."""
        moments = self.encode_moments(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            std = jnp.exp(0.5 * logvar)
            return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
        return mean

    def decode(self, z: jnp.ndarray, num_frames: int = 1) -> jnp.ndarray:
        """(B*F,h,w,4) -> (B*F,H,W,3)."""
        return self.decoder(z, num_frames)

    def __call__(self, x, rng=None, sample=False, num_frames: int = 1):
        z = self.encode(x, rng=rng, sample=sample)
        return self.decode(z, num_frames=num_frames)
