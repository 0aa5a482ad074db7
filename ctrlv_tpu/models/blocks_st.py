"""SVD UNet down/mid/up spatio-temporal blocks.

Spec: SURVEY.md §2.8 (block composition), reference usage
/root/reference/src/ctrlv/models/controlnet.py:157-192 (get_down_block /
UNetMidBlockSpatioTemporal configs: layers_per_block=2, resnet_eps=1e-5,
transformer_layers_per_block=1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import Downsample2D, Dtype, Upsample2D
from .resnet import SpatioTemporalResBlock
from .transformer_st import TransformerSpatioTemporalModel


class DownBlockSpatioTemporal(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    remat_sub: bool = False  # remat per ResBlock (training-memory knob)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, image_only_indicator):
        RB = nn.remat(SpatioTemporalResBlock) if self.remat_sub else SpatioTemporalResBlock
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = RB(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                eps=1e-5,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, image_only_indicator)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, dtype=self.dtype, name="downsamplers_0"
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class CrossAttnDownBlockSpatioTemporal(nn.Module):
    in_channels: int
    out_channels: int
    num_layers: int = 2
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 1
    cross_attention_dim: int = 1024
    add_downsample: bool = True
    remat_sub: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, image_only_indicator):
        RB = nn.remat(SpatioTemporalResBlock) if self.remat_sub else SpatioTemporalResBlock
        TR = (
            nn.remat(TransformerSpatioTemporalModel)
            if self.remat_sub
            else TransformerSpatioTemporalModel
        )
        output_states = ()
        for i in range(self.num_layers):
            hidden_states = RB(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                eps=1e-5,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, image_only_indicator)
            hidden_states = TR(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                in_channels=self.out_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(hidden_states, encoder_hidden_states, image_only_indicator)
            output_states += (hidden_states,)
        if self.add_downsample:
            hidden_states = Downsample2D(
                self.out_channels, dtype=self.dtype, name="downsamplers_0"
            )(hidden_states)
            output_states += (hidden_states,)
        return hidden_states, output_states


class UNetMidBlockSpatioTemporal(nn.Module):
    in_channels: int
    num_layers: int = 1
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 1
    cross_attention_dim: int = 1024
    remat_sub: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, temb, encoder_hidden_states, image_only_indicator):
        RB = nn.remat(SpatioTemporalResBlock) if self.remat_sub else SpatioTemporalResBlock
        TR = (
            nn.remat(TransformerSpatioTemporalModel)
            if self.remat_sub
            else TransformerSpatioTemporalModel
        )
        hidden_states = RB(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            eps=1e-5,
            dtype=self.dtype,
            name="resnets_0",
        )(hidden_states, temb, image_only_indicator)
        for i in range(self.num_layers):
            hidden_states = TR(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.in_channels // self.num_attention_heads,
                in_channels=self.in_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(hidden_states, encoder_hidden_states, image_only_indicator)
            hidden_states = RB(
                in_channels=self.in_channels,
                out_channels=self.in_channels,
                eps=1e-5,
                dtype=self.dtype,
                name=f"resnets_{i + 1}",
            )(hidden_states, temb, image_only_indicator)
        return hidden_states


class UpBlockSpatioTemporal(nn.Module):
    in_channels: int  # skip channels at this depth
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    remat_sub: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, res_hidden_states_tuple, temb, image_only_indicator):
        RB = nn.remat(SpatioTemporalResBlock) if self.remat_sub else SpatioTemporalResBlock
        for i in range(self.num_layers):
            res_skip_channels = (
                self.in_channels if (i == self.num_layers - 1) else self.out_channels
            )
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = RB(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                eps=1e-5,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, image_only_indicator)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, dtype=self.dtype, name="upsamplers_0"
            )(hidden_states)
        return hidden_states


class CrossAttnUpBlockSpatioTemporal(nn.Module):
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int = 3
    transformer_layers_per_block: int = 1
    num_attention_heads: int = 1
    cross_attention_dim: int = 1024
    add_upsample: bool = True
    remat_sub: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states,
        res_hidden_states_tuple,
        temb,
        encoder_hidden_states,
        image_only_indicator,
    ):
        RB = nn.remat(SpatioTemporalResBlock) if self.remat_sub else SpatioTemporalResBlock
        TR = (
            nn.remat(TransformerSpatioTemporalModel)
            if self.remat_sub
            else TransformerSpatioTemporalModel
        )
        for i in range(self.num_layers):
            res_skip_channels = (
                self.in_channels if (i == self.num_layers - 1) else self.out_channels
            )
            resnet_in_channels = self.prev_output_channel if i == 0 else self.out_channels
            res_hidden = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            hidden_states = jnp.concatenate([hidden_states, res_hidden], axis=-1)
            hidden_states = RB(
                in_channels=resnet_in_channels + res_skip_channels,
                out_channels=self.out_channels,
                eps=1e-5,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(hidden_states, temb, image_only_indicator)
            hidden_states = TR(
                num_attention_heads=self.num_attention_heads,
                attention_head_dim=self.out_channels // self.num_attention_heads,
                in_channels=self.out_channels,
                num_layers=self.transformer_layers_per_block,
                cross_attention_dim=self.cross_attention_dim,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(hidden_states, encoder_hidden_states, image_only_indicator)
        if self.add_upsample:
            hidden_states = Upsample2D(
                self.out_channels, dtype=self.dtype, name="upsamplers_0"
            )(hidden_states)
        return hidden_states
