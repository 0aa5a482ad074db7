"""Core Flax building blocks for the SVD spatio-temporal architecture.

Channel layout is TPU-native NHWC / (B, F, H, W, C) throughout — unlike the
reference's NCHW torch modules. Parameter names mirror the HF diffusers
state_dict structure (to_q/to_k/to_v/to_out, norm1/conv1/..., net_0/net_2)
so the HF->flax checkpoint converter (ctrlv_tpu.train.hf_import) is a pure
rename + transpose.

Behavioral spec sources (studied, not copied):
  /root/reference/src/ctrlv/models/unet_spatio_temporal_condition.py (usage)
  SURVEY.md §2.8 (external diffusers components the rebuild must provide).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, get_attention_impl
from ..ops.geglu_ff import gelu_erf
from ..ops.group_norm import group_norm as fused_group_norm
from ..ops.layer_norm import layer_norm as fused_layer_norm
from ..ops.mha import (
    mha_attention,
    mha_supported,
    small_mha_attention,
    small_mha_attention_fm,
    small_mha_fm_supported,
    small_mha_supported,
    xla_fm_attention,
)

Dtype = jnp.dtype


class GroupNorm(nn.Module):
    """GroupNorm with f32 statistics, lane-preserving stats math.

    Drop-in for `nn.GroupNorm(dtype=f32)` on channels-last inputs with the
    identical param tree (scale/bias, f32) and identical f32 output. The
    group statistics never split the channel (lane) axis: flax reshapes
    x to (..., groups, C/g); here per-CHANNEL spatial sums are reduced
    first ([8,128]-native column reduction, one multi-output fusion for
    sum and sum-of-squares), then aggregated channel->group with a tiny
    one-hot matmul — pure XLA, no custom-call fusion boundary.

    Measured on the flagship denoise step (PERF.md round-3): step time is
    UNCHANGED vs flax nn.GroupNorm — XLA already folds the lane-splitting
    reshape into its convert+reduce fusions, and the isolated stats
    microbench runs at copy-roofline for both formulations. Kept because
    it (a) pins the stats layout explicitly instead of relying on that
    fusion behavior, and (b) is the single hook point for any future
    producer-fused stats routing.

    Replaces torch.nn.GroupNorm everywhere the reference's diffusers stack
    uses it (ResnetBlock2D/temporal, transformer proj_in norms, VAE
    conv_norm_out — SURVEY.md §2.8/§2.9 cuDNN GroupNorm row).
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32  # return dtype (stats are always f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        y = x.astype(jnp.float32)
        red_axes = tuple(range(1, y.ndim - 1))  # all spatial dims
        s1 = jnp.sum(y, axis=red_axes)  # (B, C)
        s2 = jnp.sum(y * y, axis=red_axes)  # (B, C) — same fusion as s1
        from ..ops.group_norm import _group_map

        gmap = _group_map(c, g)  # (C, G) one-hot, shared grouping convention
        count = (y.size // y.shape[0] // c) * (c // g)
        mean_g = (s1 @ gmap) / count  # (B, G)
        var_g = jnp.maximum((s2 @ gmap) / count - mean_g * mean_g, 0.0)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)
        # broadcast group stats back to channels (exact: one-hot gather)
        mean_c = mean_g @ gmap.T  # (B, C)
        inv_c = inv_g @ gmap.T
        shape = (y.shape[0],) + (1,) * (y.ndim - 2) + (c,)
        out = (y - mean_c.reshape(shape)) * (inv_c.reshape(shape) * scale) + bias
        return out.astype(self.dtype)


class FusedLayerNorm(nn.Module):
    """LayerNorm backed by the fused Pallas kernel (ops/layer_norm.py).

    Drop-in for `nn.LayerNorm(dtype=f32)(x).astype(out_dtype)`: identical
    param tree (scale/bias), f32 statistics, single fused pass on TPU.
    """

    epsilon: float = 1e-6
    out_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # out_dtype threads into the op so the result is rounded exactly
        # once (f32 stats -> out_dtype), never via an x.dtype round-trip.
        return fused_layer_norm(x, scale, bias, eps=self.epsilon, out_dtype=self.out_dtype)


class FusedGroupNorm(nn.Module):
    """GroupNorm(+optional SiLU) backed by the Pallas fused kernel.

    Drop-in for `nn.GroupNorm(dtype=f32)(x).astype(dtype)` (+ `nn.silu`):
    identical param tree (scale/bias), f32 statistics, output cast to
    out_dtype. Falls back to the XLA path off-TPU or for oversized slabs
    (ctrlv_tpu.ops.group_norm routing).
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    act: Optional[str] = None
    out_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return fused_group_norm(
            x, scale, bias, num_groups=self.num_groups, eps=self.epsilon,
            act=self.act, out_dtype=self.out_dtype,
        )


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings (diffusers `Timesteps` semantics).

    Always computed in fp32 — the reference relies on this for numerics
    (t_emb cast happens after the table lookup).
    """
    timesteps = jnp.asarray(timesteps, dtype=jnp.float32)
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps[:, None] * emb[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """2-layer SiLU MLP lifting a sinusoidal embedding to time_embed_dim."""

    time_embed_dim: int
    out_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        out_dim = self.out_dim or self.time_embed_dim
        sample = nn.Dense(out_dim, dtype=self.dtype, name="linear_2")(sample)
        return sample


class AlphaBlender(nn.Module):
    """Learned spatial/temporal mix: x = a*spatial + (1-a)*temporal.

    merge_strategy:
      "learned_with_images" — a = sigmoid(mix_factor), forced to 1 where
        image_only_indicator is set (UNet blocks).
      "learned" — a = sigmoid(mix_factor) unconditionally (VAE decoder).
    switch_spatial_to_temporal_mix swaps the roles (ResBlocks use it).
    """

    alpha: float = 0.5
    merge_strategy: str = "learned_with_images"
    switch_spatial_to_temporal_mix: bool = False

    @nn.compact
    def __call__(
        self,
        x_spatial: jnp.ndarray,
        x_temporal: jnp.ndarray,
        image_only_indicator: Optional[jnp.ndarray] = None,
        ndims_after_batch_frames: int = 0,
    ) -> jnp.ndarray:
        mix_factor = self.param(
            "mix_factor", lambda rng: jnp.array([self.alpha], dtype=jnp.float32)
        )
        alpha = jax.nn.sigmoid(mix_factor.astype(jnp.float32))[0]
        if self.merge_strategy == "learned_with_images":
            assert image_only_indicator is not None
            # (B, F) bool-ish -> broadcast over flattened (B*F, ...) leading dim
            is_image = image_only_indicator.reshape(-1).astype(bool)
            alpha = jnp.where(is_image, 1.0, alpha)
            alpha = alpha.reshape(alpha.shape + (1,) * ndims_after_batch_frames)
        elif self.merge_strategy != "learned":
            raise ValueError(self.merge_strategy)
        alpha = alpha.astype(x_spatial.dtype)
        if self.switch_spatial_to_temporal_mix:
            alpha = 1.0 - alpha
        return alpha * x_spatial + (1.0 - alpha) * x_temporal


class Attention(nn.Module):
    """Multi-head attention matching diffusers' `Attention` semantics.

    Input (B, S, C); optional context (B, T, C_ctx) for cross-attention.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    qkv_bias: bool = False
    out_bias: bool = True
    residual_connection: bool = False
    norm_num_groups: Optional[int] = None  # VAE-style pre-GN
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        temporal_frames: Optional[int] = None,
    ) -> jnp.ndarray:
        """`temporal_frames=F` marks frames-major temporal self-attention:
        hidden_states is (B*F, S, C) and attention runs over the F axis per
        pixel WITHOUT the (B*S, F, C) relayout (ops/mha.py frames-major
        kernel; XLA fallback transposes explicitly)."""
        residual = hidden_states
        inner_dim = self.heads * self.dim_head

        if self.norm_num_groups is not None:
            hidden_states = GroupNorm(
                num_groups=self.norm_num_groups,
                epsilon=self.eps,
                name="group_norm",
            )(hidden_states).astype(self.dtype)

        ctx = hidden_states if context is None else context
        b, sq = hidden_states.shape[0], hidden_states.shape[1]

        if context is not None and context.shape[1] == 1:
            # Cross-attention to a single token (SVD's CLIP conditioning):
            # softmax over one key is identically 1, so attention == V and
            # the whole block collapses to broadcast(to_out(to_v(ctx))).
            # Exact — including gradients: d softmax(single)/d logit == 0,
            # so to_q/to_k get zero grads either way. The 1-token calls
            # below exist to keep the diffusers-compatible param tree.
            _ = nn.Dense(inner_dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(
                hidden_states[:, :1]
            )
            _ = nn.Dense(inner_dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")(ctx)
            v1 = nn.Dense(inner_dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")(ctx)
            out1 = nn.Dense(
                self.query_dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0"
            )(v1)
            out = jnp.broadcast_to(out1, (b, sq, self.query_dim))
            if self.residual_connection:
                out = out + residual
            return out

        q = nn.Dense(inner_dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(
            hidden_states
        )
        k = nn.Dense(inner_dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner_dim, use_bias=self.qkv_bias, dtype=self.dtype, name="to_v")(ctx)

        sk = k.shape[1]
        scale = self.dim_head**-0.5
        itemsize = jnp.dtype(self.dtype).itemsize
        if temporal_frames is not None:
            # Frames-major temporal self-attention over (B*F, S, C).
            assert context is None and sk == sq
            if get_attention_impl() != "xla" and small_mha_fm_supported(
                b, sq, inner_dim, self.heads, temporal_frames, itemsize
            ):
                out = small_mha_attention_fm(
                    q, k, v, self.heads, scale, temporal_frames
                )
            else:
                out = xla_fm_attention(q, k, v, self.heads, scale, temporal_frames)
        elif get_attention_impl() != "xla" and mha_supported(
            sq, sk, inner_dim, self.heads, itemsize
        ):
            # layout-native kernel: consumes the Dense outputs directly,
            # no (B,S,H,D) relayout ever reaches HBM (ops/mha.py)
            out = mha_attention(q, k, v, self.heads, scale)
        elif get_attention_impl() != "xla" and small_mha_supported(
            b, sq, sk, inner_dim, self.heads, itemsize
        ):
            # temporal attention: tiny frame sequence, huge pixel batch
            out = small_mha_attention(q, k, v, self.heads, scale)
        else:
            q = q.reshape(b, sq, self.heads, self.dim_head)
            k = k.reshape(b, sk, self.heads, self.dim_head)
            v = v.reshape(b, sk, self.heads, self.dim_head)
            out = dot_product_attention(q, k, v).reshape(b, sq, inner_dim)
        out = nn.Dense(
            self.query_dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0"
        )(out)
        if self.residual_connection:
            out = out + residual
        return out


class _DenseParams(nn.Module):
    """Declares nn.Dense-identical params ({kernel, bias}, same inits/paths)
    without computing — lets FeedForward hand raw weights to the fused
    Pallas MLP kernel while keeping the exact nn.Dense param tree."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.linear.default_kernel_init,
            (in_features, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        w, b = _DenseParams(self.dim_out * 2, name="proj")(x.shape[-1])
        if return_params:
            return w, b
        # manual dense == nn.Dense(dtype): cast params to compute dtype,
        # dot, add bias
        h = jnp.dot(x, w.astype(self.dtype)) + b.astype(self.dtype)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact erf gelu (torch F.gelu default, used by diffusers' GEGLU) via
        # the cheap polynomial erf — see ops/geglu_ff.py::gelu_erf. The flax
        # default (tanh approximation) was a silent parity drift.
        return h * gelu_erf(gate)


class FeedForward(nn.Module):
    """diffusers FeedForward: GEGLU -> Dense, mult=4.

    When the fused GEGLU-MLP kernel is enabled and the (rows, C) shape
    passes its gate (ops/geglu_ff.py — opt-in, shape-gated to the
    HBM-bound low-C/high-token FF sites), the whole proj->gelu-gate->out
    chain runs as one Pallas program with both weight matrices
    VMEM-resident; otherwise the standard XLA path. Identical param tree
    either way."""

    dim: int
    dim_out: Optional[int] = None
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.geglu_ff import geglu_ff, geglu_ff_supported

        inner = self.dim * self.mult
        dout = self.dim_out or self.dim
        geglu = GEGLU(inner, dtype=self.dtype, name="net_0")
        m = 1
        for s in x.shape[:-1]:
            m *= s
        if geglu_ff_supported(m, x.shape[-1], inner, dout, x.dtype.itemsize):
            w1, b1 = geglu(x, return_params=True)
            w2, b2 = _DenseParams(dout, name="net_2")(inner)
            y = geglu_ff(x.reshape(m, x.shape[-1]), w1, b1, w2, b2)
            return y.reshape(x.shape[:-1] + (dout,))
        x = geglu(x)
        return nn.Dense(dout, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """Pre-LN transformer block: self-attn, (cross-attn), GEGLU FF."""

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    cross_attention_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, hidden_states: jnp.ndarray, encoder_hidden_states: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        def ln(name):
            # eps 1e-5: torch nn.LayerNorm default, used by the diffusers
            # BasicTransformerBlock (reference attention.py:124 norm_eps=1e-5);
            # the flax default 1e-6 was a silent parity drift.
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)

        attn_kwargs = dict(
            query_dim=self.dim,
            heads=self.num_attention_heads,
            dim_head=self.attention_head_dim,
            dtype=self.dtype,
        )
        h = ln("norm1")(hidden_states).astype(self.dtype)
        hidden_states = Attention(name="attn1", **attn_kwargs)(h) + hidden_states

        if self.cross_attention_dim is not None:
            h = ln("norm2")(hidden_states).astype(self.dtype)
            hidden_states = (
                Attention(
                    cross_attention_dim=self.cross_attention_dim,
                    name="attn2",
                    **attn_kwargs,
                )(h, context=encoder_hidden_states)
                + hidden_states
            )

        h = ln("norm3")(hidden_states).astype(self.dtype)
        hidden_states = FeedForward(self.dim, dtype=self.dtype, name="ff")(h) + hidden_states
        return hidden_states


class TemporalBasicTransformerBlock(nn.Module):
    """Temporal transformer block operating over the frame axis.

    Input (B*S, F, C) — pixels batched, frames as sequence. Mirrors the
    reference semantics: ff_in residual, self-attn over frames, cross-attn
    to the first-frame CLIP context, FF out (SURVEY.md §2.8).

    With `frames_major=F` the input is instead (B*F, S, C) — the UNet's
    native layout. LN/FF/cross-attn are layout-agnostic (last-axis ops);
    only the frame self-attention needs the frame axis, and it runs via
    the frames-major kernel (ops/mha.py) — the (B*S, F, C) HBM relayout
    pair never exists. encoder_hidden_states must then be batched (B*F,…).
    """

    dim: int
    num_attention_heads: int
    attention_head_dim: int
    cross_attention_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        frames_major: Optional[int] = None,
    ) -> jnp.ndarray:
        def ln(name):
            # eps 1e-5: torch nn.LayerNorm default, used by the diffusers
            # BasicTransformerBlock (reference attention.py:124 norm_eps=1e-5);
            # the flax default 1e-6 was a silent parity drift.
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)

        attn_kwargs = dict(
            query_dim=self.dim,
            heads=self.num_attention_heads,
            dim_head=self.attention_head_dim,
            dtype=self.dtype,
        )

        residual = hidden_states
        h = ln("norm_in")(hidden_states).astype(self.dtype)
        hidden_states = FeedForward(self.dim, dtype=self.dtype, name="ff_in")(h) + residual

        h = ln("norm1")(hidden_states).astype(self.dtype)
        hidden_states = (
            Attention(name="attn1", **attn_kwargs)(h, temporal_frames=frames_major)
            + hidden_states
        )

        if self.cross_attention_dim is not None:
            h = ln("norm2")(hidden_states).astype(self.dtype)
            hidden_states = (
                Attention(
                    cross_attention_dim=self.cross_attention_dim,
                    name="attn2",
                    **attn_kwargs,
                )(h, context=encoder_hidden_states)
                + hidden_states
            )

        h = ln("norm3")(hidden_states).astype(self.dtype)
        hidden_states = FeedForward(self.dim, dtype=self.dtype, name="ff")(h) + hidden_states
        return hidden_states


class Downsample2D(nn.Module):
    """3x3 stride-2 conv downsampler (padding=1, diffusers UNet flavor)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)


class DownsampleVAE2D(nn.Module):
    """VAE-encoder downsampler: asymmetric pad (0,1) then 3x3 stride-2, pad=0."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    """2x nearest upsample + 3x3 conv."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)
