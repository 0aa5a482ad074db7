"""Fused LayerNorm Pallas TPU kernel.

PERF.md "Per-fusion profile": the transformer LayerNorms cost ~73 ms of the
543 ms denoise step under XLA (separate f32 stats reductions + apply pass,
~3 activation reads). Token rows are independent, so the kernel flattens
(B, S, C) -> (T, C), computes per-row mean/var over the lane axis, and
normalizes in one pass: 1 read + 1 write.

Activations here are Dense outputs in default layout, so — unlike the
conv-adjacent GroupNorms (see ops/group_norm.py docstring) — the
custom-call boundary introduces no relayout copies.

Backward: custom_vjp recompute via the XLA reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# OFF by default: a hardware trace (2026-08-17, PERF.md round-2 addendum)
# showed in-graph LN custom calls cost MORE than XLA's fused LNs — the
# call boundary strips the fusion anchors, so residual adds / AlphaBlender
# / LN-apply chains that previously fused into matmul operand reads
# materialize as ~78 ms/step of standalone elementwise passes, plus
# flatten/unflatten copies. The kernel IS faster in isolation; it loses
# in-graph. Re-enable only with a trace that beats 462 ms/step.
_FUSED_LN = False


def set_fused_layer_norm(on: bool) -> None:
    global _FUSED_LN
    _FUSED_LN = on


def _reference_layer_norm(x, gamma, beta, eps):
    """flax nn.LayerNorm semantics (fast variance), f32 math."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)


def _ln_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, eps):
    xf = x_ref[:].astype(jnp.float32)  # (bt, C)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd * gamma_ref[:] + beta_ref[:]
    o_ref[:] = y.astype(o_ref.dtype)


def _pick_block(t: int) -> int:
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8):
        if t % cand == 0:
            return cand
    return 0


def _fused_forward(x2, gamma, beta, eps, out_dtype=None):
    t, c = x2.shape
    bt = _pick_block(t)
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((t, c), out_dtype or x2.dtype),
        grid=(t // bt,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((bt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * t * c,
            bytes_accessed=2 * t * c * x2.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2, gamma.astype(jnp.float32).reshape(1, c), beta.astype(jnp.float32).reshape(1, c))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_ln(x2, gamma, beta, eps, out_dtype):
    return _fused_forward(x2, gamma, beta, eps, out_dtype)


def _fused_ln_fwd(x2, gamma, beta, eps, out_dtype):
    return _fused_forward(x2, gamma, beta, eps, out_dtype), (x2, gamma, beta)


def _fused_ln_bwd(eps, out_dtype, res, g):
    x2, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x_, ga_, be_: _reference_layer_norm(x_, ga_, be_, eps).astype(out_dtype),
        x2,
        gamma,
        beta,
    )
    return vjp(g)


_fused_ln.defvjp(_fused_ln_fwd, _fused_ln_bwd)


def layer_norm(x, gamma, beta, eps: float = 1e-6, out_dtype=None):
    """LayerNorm over the last axis, f32 statistics, returned in out_dtype.

    out_dtype=None (default) returns in x.dtype. Matches
    `nn.LayerNorm(dtype=f32)(x).astype(out_dtype)` up to rounding order
    (single rounding at the end — no intermediate x.dtype round-trip).
    """
    shape = x.shape
    c = shape[-1]
    t = 1
    for d in shape[:-1]:
        t *= d
    out_dtype = x.dtype if out_dtype is None else jnp.dtype(out_dtype)
    x2 = x.reshape(t, c)
    if not _FUSED_LN or _pick_block(t) == 0:
        return _reference_layer_norm(x2, gamma, beta, eps).astype(out_dtype).reshape(shape)
    return _fused_ln(x2, gamma, beta, eps, out_dtype).reshape(shape)
