"""Pallas TPU attention kernel for SVD's spatial self-attention.

Ctrl-V's hot attention shapes (512x320 clips, 25 frames):
  - spatial self-attn: seq = H*W/64 in {2560, 640, 160, 40}, head_dim 64,
    batch = B*25 frames * heads in {5,10,20,20}
  - temporal self-attn: seq = 25 (handled by XLA — too small to tile)
  - cross-attn: kv_len = 1 CLIP token (XLA)

For these modest sequence lengths the full K/V for one (batch, head) fits in
VMEM, so the kernel is a single-pass blocked softmax-attention: each grid
step loads one Q tile plus the whole K/V, computes fp32 logits on the MXU,
does a numerically-stable softmax on the VPU, and writes one output tile.
This keeps the entire score matrix out of HBM (the win over naive XLA when
XLA fails to fuse) while avoiding flash-style running-max bookkeeping that
only pays off at much longer sequence lengths.

Backward pass: custom_vjp that recomputes attention with the XLA reference
implementation — the backward matmuls are MXU-bound either way, and
recompute-from-inputs is the standard rematerialization tradeoff on TPU.

Replaces the reference's xformers CUDA attention
(/root/reference/tools/train_video_diffusion.py:142-153).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (block_q, d)
    k = k_ref[0]  # (kv_len, d)
    v = v_ref[0]  # (kv_len, d)
    logits = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    logits = logits * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / denom).astype(v.dtype)
    o_ref[0] = jnp.dot(w, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pick_block_q(seq_q: int) -> int:
    for cand in (512, 256, 128):
        if seq_q % cand == 0:
            return cand
    return 0  # caller falls back to XLA


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    """Attention over (B, S, H, D) tensors via a Pallas TPU kernel."""
    return _flash_forward(q, k, v, scale)


def _flash_forward(q, k, v, scale):
    b, sq, h, d = q.shape
    sk = k.shape[1]
    block_q = _pick_block_q(sq)
    if block_q == 0:
        from .attention import _xla_attention

        return _xla_attention(q, k, v, scale)

    # (B, S, H, D) -> (B*H, S, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    grid = (b * h, sq // block_q)
    # off-TPU (tests, CPU dry runs) the kernel runs in interpreter mode
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


def _flash_fwd_rule(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _flash_bwd_rule(scale, residuals, g):
    from .attention import _xla_attention

    q, k, v = residuals
    _, vjp_fn = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v)
    return vjp_fn(g)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
