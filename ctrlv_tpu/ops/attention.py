"""Attention ops: XLA reference path + Pallas TPU flash kernel dispatch.

The reference gets its fused attention from xformers CUDA kernels
(/root/reference/tools/train_video_diffusion.py:142-153). Here the hot path
is a Pallas TPU flash-attention kernel (``ctrlv_tpu.ops.flash_attention``)
with an XLA fallback that lets XLA fuse softmax into the matmuls itself.

Layout convention: (batch, seq, heads, head_dim) — "BSHD".
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Global attention implementation selector:
#   "xla"    — plain einsum + softmax (XLA fuses); always correct.
#   "pallas" — Pallas TPU flash kernel (ctrlv_tpu.ops.flash_attention).
#   "auto"   — pallas on TPU when shapes qualify, else xla.
_ATTENTION_IMPL = "auto"


def set_attention_impl(impl: str) -> None:
    global _ATTENTION_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _ATTENTION_IMPL = impl


def get_attention_impl() -> str:
    return _ATTENTION_IMPL


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Reference attention. fp32 softmax for bf16 stability; MXU matmuls."""
    dtype = q.dtype
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out


def _pallas_qualifies(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    # Measured on TPU v5e at the hot SVD spatial shape (b=50, s=2560, h=5,
    # d=64, bf16): XLA 31.7ms vs pallas 33.1ms — XLA's fused attention wins
    # today, so "auto" routes to XLA and the pallas kernel stays an explicit
    # opt-in ("pallas") until it's tuned past XLA (kernel is numerically
    # validated on hardware: max rel err 2e-3 bf16 / 4e-4 fp32).
    return False


def _pallas_supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    head_dim = q.shape[-1]
    kv_len = k.shape[1]
    return head_dim in (64, 128) and kv_len >= 128 and q.shape[1] >= 128


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head attention, (B, S, H, D) layout, no masking (dense video attn).

    Ctrl-V's attention is always unmasked: spatial self-attn over H*W/64
    tokens, temporal self-attn over num_frames tokens, and cross-attn to a
    single CLIP image token.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = _ATTENTION_IMPL
    if (impl == "pallas" and _pallas_supported(q, k)) or (
        impl == "auto" and _pallas_qualifies(q, k)
    ):
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)
