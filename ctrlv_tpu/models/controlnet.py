"""Spatio-temporal ControlNet for Box2Video, TPU-native flax.

Behavioral spec (/root/reference/src/ctrlv/models/controlnet.py:52-351):
  - same down/mid topology as the SVD UNet (conv_in, time + added-time
    embeddings, 3 cross-attn + 1 plain down blocks, ST mid block),
  - an extra `control_conv_in` over the 4-ch conditioning latents whose
    output is *added* to conv_in's output (:296-299),
  - zero-initialized 1x1 "controlnet blocks": one per down residual
    (conv_in + 2 per block + 1 per downsampler) and one for the mid
    (:148-185), outputs scaled by conditioning_scale (:341-344),
  - `from_unet` copies every intersecting weight from the UNet (:197-224).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .blocks_st import (
    CrossAttnDownBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
)
from .layers import Dtype, TimestepEmbedding, get_timestep_embedding
from .unet_st import UNetSTConfig


class ControlNetSpatioTemporal(nn.Module):
    config: UNetSTConfig = UNetSTConfig()
    dtype: Dtype = jnp.float32
    gradient_checkpointing: bool = False
    # "block": remat whole down/mid/up blocks (fewer stored boundaries,
    # larger recompute live-set); "sub": remat each ResBlock/transformer
    # individually (lower bwd peak memory — the single-chip training knob)
    remat_granularity: str = "block"

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, F, H, W, C_in)
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,  # (B, 1, cross_dim)
        added_time_ids: jnp.ndarray,  # (B, 3)
        control_cond: jnp.ndarray,  # (B, F, H, W, C_in//2) cond latents
        conditioning_scale: float = 1.0,
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        cfg = self.config
        batch_size, num_frames = sample.shape[0], sample.shape[1]

        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (batch_size,))
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0])
        emb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))
        time_embeds = get_timestep_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        ).reshape(batch_size, -1)
        emb = emb + TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="add_embedding"
        )(time_embeds.astype(self.dtype))

        sample = sample.reshape((batch_size * num_frames,) + sample.shape[2:]).astype(
            self.dtype
        )
        control_cond = control_cond.reshape(
            (batch_size * num_frames,) + control_cond.shape[2:]
        ).astype(self.dtype)
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(encoder_hidden_states, num_frames, axis=0)
        image_only_indicator = jnp.zeros((batch_size, num_frames), dtype=self.dtype)

        sample = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(sample)
        control = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="control_conv_in",
        )(control_cond)
        sample = sample + control

        remat_sub = self.gradient_checkpointing and self.remat_granularity == "sub"
        maybe_remat = (
            nn.remat
            if (self.gradient_checkpointing and not remat_sub)
            else (lambda m: m)
        )

        down_block_res_samples = (sample,)
        output_channel = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            if block_type == "CrossAttnDownBlockSpatioTemporal":
                block = maybe_remat(CrossAttnDownBlockSpatioTemporal)(
                    remat_sub=remat_sub,
                    in_channels=input_channel,
                    out_channels=output_channel,
                    num_layers=cfg.layers_per_block,
                    transformer_layers_per_block=cfg.transformer_layers_per_block,
                    num_attention_heads=cfg.num_attention_heads[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_downsample=not is_final,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )
                sample, res_samples = block(
                    sample, emb, encoder_hidden_states, image_only_indicator
                )
            else:
                block = maybe_remat(DownBlockSpatioTemporal)(
                    remat_sub=remat_sub,
                    in_channels=input_channel,
                    out_channels=output_channel,
                    num_layers=cfg.layers_per_block,
                    add_downsample=not is_final,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )
                sample, res_samples = block(sample, emb, image_only_indicator)
            down_block_res_samples += res_samples

        sample = maybe_remat(UNetMidBlockSpatioTemporal)(
            remat_sub=remat_sub,
            in_channels=cfg.block_out_channels[-1],
            transformer_layers_per_block=cfg.transformer_layers_per_block,
            num_attention_heads=cfg.num_attention_heads[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            dtype=self.dtype,
            name="mid_block",
        )(sample, emb, encoder_hidden_states, image_only_indicator)

        # Zero-initialized 1x1 projections (zero at init => ControlNet is a
        # no-op when training starts, matching zero_module semantics).
        ctrl_res = ()
        for i, res in enumerate(down_block_res_samples):
            proj = nn.Conv(
                res.shape[-1],
                (1, 1),
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"controlnet_down_blocks_{i}",
            )(res)
            ctrl_res += (proj * conditioning_scale,)
        mid = nn.Conv(
            sample.shape[-1],
            (1, 1),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="controlnet_mid_block",
        )(sample)
        return ctrl_res, mid * conditioning_scale


def controlnet_params_from_unet(unet_params, controlnet_params):
    """Initialize ControlNet weights from a UNet's (from_unet parity).

    Copies every parameter whose path exists in both trees with matching
    shape (conv_in, embeddings, down blocks, mid block); leaves the
    ControlNet-only parts (control_conv_in, zero convs) at their init.
    """
    import flax

    unet_flat = flax.traverse_util.flatten_dict(unet_params)
    ctrl_flat = flax.traverse_util.flatten_dict(controlnet_params)
    copied = 0
    for key, val in ctrl_flat.items():
        if key in unet_flat and unet_flat[key].shape == val.shape:
            ctrl_flat[key] = unet_flat[key]
            copied += 1
    assert copied > 0, "from_unet copied nothing — param naming drifted"
    return flax.traverse_util.unflatten_dict(ctrl_flat)
