"""UNetSpatioTemporalConditionModel — the SVD video UNet, TPU-native.

Behavioral parity target: the reference's override of the diffusers SVD UNet
(/root/reference/src/ctrlv/models/unet_spatio_temporal_condition.py:31-171):
  - input (B, F, C=8, H/8, W/8) latents (noise ++ conditioning latents),
  - EDM continuous timestep + added_time_ids (fps-1, motion_bucket, noise_aug)
    micro-conditioning,
  - optional ControlNet down/mid residual injection (:119-137),
  - output (B, F, 4, H/8, W/8) v-prediction.

TPU-native deltas: channels-last (B, F, H, W, C); fp32 norms with bf16
matmuls; per-block `nn.remat` instead of torch gradient checkpointing;
no Python control flow on traced values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .blocks_st import (
    CrossAttnDownBlockSpatioTemporal,
    CrossAttnUpBlockSpatioTemporal,
    DownBlockSpatioTemporal,
    UNetMidBlockSpatioTemporal,
    UpBlockSpatioTemporal,
)
from .layers import Dtype, GroupNorm, TimestepEmbedding, get_timestep_embedding


@dataclasses.dataclass(frozen=True)
class UNetSTConfig:
    """SVD-XT UNet config (reference defaults:
    unet_spatio_temporal_condition.py:176-199)."""

    sample_size: Optional[int] = None
    in_channels: int = 8
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: int = 1
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    num_frames: int = 25

    @classmethod
    def tiny(cls, num_frames: int = 5) -> "UNetSTConfig":
        """Small config for tests: same topology, tiny widths."""
        return cls(
            block_out_channels=(32, 64, 64, 64),
            num_attention_heads=(1, 2, 2, 2),
            cross_attention_dim=48,
            addition_time_embed_dim=16,
            projection_class_embeddings_input_dim=48,
            num_frames=num_frames,
        )

    @classmethod
    def micro(cls, num_frames: int = 4) -> "UNetSTConfig":
        """Minimal-depth config (2 blocks, 1 layer each): every block kind and
        sharding path at a fraction of tiny()'s graph size. Exists for the
        driver's multi-chip dryrun, whose cold compile on a 1-core host must
        fit the driver timeout (VERDICT r3 #1)."""
        return cls(
            down_block_types=(
                "CrossAttnDownBlockSpatioTemporal",
                "DownBlockSpatioTemporal",
            ),
            up_block_types=(
                "UpBlockSpatioTemporal",
                "CrossAttnUpBlockSpatioTemporal",
            ),
            block_out_channels=(32, 32),
            num_attention_heads=(1, 1),
            layers_per_block=1,
            cross_attention_dim=48,
            addition_time_embed_dim=16,
            projection_class_embeddings_input_dim=48,
            num_frames=num_frames,
        )


class UNetSpatioTemporalConditionModel(nn.Module):
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
        timestep: jnp.ndarray,  # scalar or (B,)
        encoder_hidden_states: jnp.ndarray,  # (B, 1, cross_dim)
        added_time_ids: jnp.ndarray,  # (B, 3)
        down_block_additional_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_additional_residuals: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        is_controlnet = (
            down_block_additional_residuals is not None
            and mid_block_additional_residuals is not None
        )
        batch_size, num_frames = sample.shape[0], sample.shape[1]

        # 1. time + micro-conditioning embeddings (fp32 tables, cast after)
        timesteps = jnp.broadcast_to(jnp.atleast_1d(timestep), (batch_size,))
        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0])
        emb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))

        time_embeds = get_timestep_embedding(
            added_time_ids.reshape(-1), cfg.addition_time_embed_dim
        )
        time_embeds = time_embeds.reshape(batch_size, -1)
        aug_emb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="add_embedding"
        )(time_embeds.astype(self.dtype))
        emb = emb + aug_emb

        # 2. flatten batch/frames; repeat per-frame embeddings
        sample = sample.reshape((batch_size * num_frames,) + sample.shape[2:])
        emb = jnp.repeat(emb, num_frames, axis=0)
        encoder_hidden_states = jnp.repeat(encoder_hidden_states, num_frames, axis=0)
        image_only_indicator = jnp.zeros((batch_size, num_frames), dtype=self.dtype)

        sample = sample.astype(self.dtype)
        sample = nn.Conv(
            cfg.block_out_channels[0],
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv_in",
        )(sample)

        remat_sub = self.gradient_checkpointing and self.remat_granularity == "sub"
        maybe_remat = (
            nn.remat
            if (self.gradient_checkpointing and not remat_sub)
            else (lambda m: m)
        )

        # 3. down path
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
            elif block_type == "DownBlockSpatioTemporal":
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
            else:
                raise ValueError(block_type)
            down_block_res_samples += res_samples

        if is_controlnet:
            down_block_res_samples = tuple(
                res + ctrl
                for res, ctrl in zip(
                    down_block_res_samples, down_block_additional_residuals
                )
            )

        # 4. mid
        sample = maybe_remat(UNetMidBlockSpatioTemporal)(
            remat_sub=remat_sub,
            in_channels=cfg.block_out_channels[-1],
            transformer_layers_per_block=cfg.transformer_layers_per_block,
            num_attention_heads=cfg.num_attention_heads[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            dtype=self.dtype,
            name="mid_block",
        )(sample, emb, encoder_hidden_states, image_only_indicator)
        if is_controlnet:
            sample = sample + mid_block_additional_residuals

        # 5. up path
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        reversed_heads = tuple(reversed(cfg.num_attention_heads))
        output_channel = reversed_channels[0]
        for i, block_type in enumerate(cfg.up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, len(cfg.block_out_channels) - 1)]
            is_final = i == len(cfg.block_out_channels) - 1

            num_res = cfg.layers_per_block + 1
            res_samples = down_block_res_samples[-num_res:]
            down_block_res_samples = down_block_res_samples[:-num_res]

            if block_type == "CrossAttnUpBlockSpatioTemporal":
                block = maybe_remat(CrossAttnUpBlockSpatioTemporal)(
                    remat_sub=remat_sub,
                    in_channels=input_channel,
                    prev_output_channel=prev_output_channel,
                    out_channels=output_channel,
                    num_layers=num_res,
                    transformer_layers_per_block=cfg.transformer_layers_per_block,
                    num_attention_heads=reversed_heads[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_upsample=not is_final,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )
                sample = block(
                    sample, res_samples, emb, encoder_hidden_states, image_only_indicator
                )
            elif block_type == "UpBlockSpatioTemporal":
                block = maybe_remat(UpBlockSpatioTemporal)(
                    remat_sub=remat_sub,
                    in_channels=input_channel,
                    prev_output_channel=prev_output_channel,
                    out_channels=output_channel,
                    num_layers=num_res,
                    add_upsample=not is_final,
                    dtype=self.dtype,
                    name=f"up_blocks_{i}",
                )
                sample = block(sample, res_samples, emb, image_only_indicator)
            else:
                raise ValueError(block_type)

        # 6. post-process
        sample = GroupNorm(
            num_groups=32, epsilon=1e-5, name="conv_norm_out"
        )(sample).astype(self.dtype)
        sample = nn.silu(sample)
        sample = nn.Conv(
            cfg.out_channels,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv_out",
        )(sample)

        return sample.reshape((batch_size, num_frames) + sample.shape[1:])


class UNetSpatioTemporalConditionModelWithBBoxCond(UNetSpatioTemporalConditionModel):
    """UNet-ST + rezero BBOXFrameAttention conditioning-frame encoder.

    Behavioral parity: UNetSpatioTemporalConditionModel_with_bbox_cond
    (/root/reference/src/ctrlv/models/unet_spatio_temporal_condition.py:
    173-243): an 8-layer BBOXFrameAttention (heads=num_frames,
    head_dim=out_channels) maps the first-frame latent + encoded object
    tokens to per-frame conditioning latents via `encode_bbox_frame`.
    """

    num_bbox_attn_layers: int = 8

    @nn.compact
    def encode_bbox_frame(
        self, frame_latent: jnp.ndarray, encoded_objects: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """(B,h,w,4) + (B,F,O,D) -> (B,F,h,w,4) conditioning latents."""
        from .bbox_attention import BBOXFrameAttention

        cfg = self.config
        b, h, w, c = frame_latent.shape
        tokens = None
        if encoded_objects is not None:
            bb, f, o, d = encoded_objects.shape
            tokens = encoded_objects.reshape(bb, f * o, d)
        out = BBOXFrameAttention(
            num_frames=cfg.num_frames,
            in_channels=cfg.out_channels,
            out_channels=cfg.out_channels * cfg.num_frames,
            num_layers=self.num_bbox_attn_layers,
            cross_attention_dim=None,
            norm_num_groups=4,
            dtype=self.dtype,
            name="bbox_frame_attention",
        )(frame_latent, tokens)
        # (B, h, w, 4*F) -> (B, F, h, w, 4) (channel-major frame split,
        # matching the reference's reshape(b, F, C, H, W))
        out = out.reshape(b, h, w, cfg.num_frames, c)
        return out.transpose(0, 3, 1, 2, 4)
