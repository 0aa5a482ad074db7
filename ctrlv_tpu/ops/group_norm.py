"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Why this kernel exists: a per-fusion profile of the Box2Video denoise step
(PERF.md "Per-fusion profile") shows XLA spends ~170 ms/step (of 543 ms) in
GroupNorm stats/apply fusions — it converts to f32, runs 3-4 partial
reductions per norm, and re-reads the activation for the normalize pass.
One sample's (L, C) slab fits VMEM for every spatial GroupNorm in the
SVD UNet/ControlNet (L = H*W <= 2560, C <= 1280), so a single-pass kernel
reads the activation once, computes group statistics on-chip, and writes
the normalized (optionally SiLU'd) result: 1 read + 1 write instead of
XLA's ~3 passes.

The group reduction (C -> G and back) is done with two tiny MXU matmuls
against a one-hot group map, which avoids cross-lane reshapes.

Backward: custom_vjp recomputes through the XLA reference implementation
(standard rematerialization; GroupNorm backward is memory-bound either way).

Replaces: the reference's torch.nn.GroupNorm inside every diffusers
ResnetBlock2D / TransformerSpatioTemporalModel (SURVEY.md §2.8).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max bf16 slab bytes for the single-pass kernel (block + f32 temps + out
# must fit the ~16 MB VMEM; 2 MB slab => <10 MB live).
_MAX_SLAB_BYTES = 2 * 1024 * 1024

# OFF by default: same in-graph fusion-boundary regression as the LN
# kernel (see ops/layer_norm.py) plus conv-layout relayouts (PERF.md).
_FUSED_GN = False


def set_fused_group_norm(on: bool) -> None:
    global _FUSED_GN
    _FUSED_GN = on


def _reference_group_norm(x, gamma, beta, num_groups, eps, act, out_dtype=None):
    """XLA reference: flax GroupNorm semantics (fast variance), f32 math."""
    orig_dtype = out_dtype or x.dtype
    b, l, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, l, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, l, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig_dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, m_ref, mt_ref, o_ref, *, eps, act, count):
    x = x_ref[0]  # (L, C)
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)  # (1, C)
    gs = jnp.dot(s, m_ref[:], preferred_element_type=jnp.float32)  # (1, G)
    gs2 = jnp.dot(s2, m_ref[:], preferred_element_type=jnp.float32)
    mean_g = gs / count
    var_g = gs2 / count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels via the transposed map
    mean_c = jnp.dot(mean_g, mt_ref[:], preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, mt_ref[:], preferred_element_type=jnp.float32)
    a = rstd_c * gamma_ref[:]  # (1, C)
    bias = beta_ref[:] - mean_c * a
    y = xf * a + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _group_map(c: int, g: int, dtype=jnp.float32):
    gs = c // g
    ch = jnp.arange(c) // gs  # group id per channel
    return (ch[:, None] == jnp.arange(g)[None, :]).astype(dtype)  # (C, G)


def _fused_forward(x, gamma, beta, num_groups, eps, act, out_dtype=None):
    b, l, c = x.shape
    m = _group_map(c, num_groups)
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _gn_kernel, eps=eps, act=act, count=float(l * (c // num_groups))
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, l, c), out_dtype or x.dtype),
        grid=(b,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_groups, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * l * c,
            bytes_accessed=2 * b * l * c * x.dtype.itemsize,
            transcendentals=b * l * c if act == "silu" else 0,
        ),
    )(
        x,
        gamma.astype(jnp.float32).reshape(1, c),
        beta.astype(jnp.float32).reshape(1, c),
        m,
        m.T,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_gn(x, gamma, beta, num_groups, eps, act, out_dtype):
    return _fused_forward(x, gamma, beta, num_groups, eps, act, out_dtype)


def _fused_gn_fwd(x, gamma, beta, num_groups, eps, act, out_dtype):
    return _fused_forward(x, gamma, beta, num_groups, eps, act, out_dtype), (x, gamma, beta)


def _fused_gn_bwd(num_groups, eps, act, out_dtype, residuals, g):
    x, gamma, beta = residuals
    _, vjp = jax.vjp(
        lambda x_, ga_, be_: _reference_group_norm(
            x_, ga_, be_, num_groups, eps, act, out_dtype
        ),
        x,
        gamma,
        beta,
    )
    return vjp(g)


_fused_gn.defvjp(_fused_gn_fwd, _fused_gn_bwd)


def group_norm(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    act: Optional[str] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """GroupNorm(+activation) over (B, ..., C); normalizes per leading dim.

    f32 statistics; output in `out_dtype` (default x.dtype), rounded once.
    Routes to the fused Pallas kernel when the per-sample slab fits VMEM,
    else to the XLA reference path. `act` in {None, "silu"}.
    """
    assert act in (None, "silu"), act
    shape = x.shape
    b, c = shape[0], shape[-1]
    l = 1
    for d in shape[1:-1]:
        l *= d
    out_dtype = x.dtype if out_dtype is None else jnp.dtype(out_dtype)
    x2 = x.reshape(b, l, c)
    slab = l * c * x.dtype.itemsize
    if not _FUSED_GN or slab > _MAX_SLAB_BYTES or c % num_groups:
        return _reference_group_norm(
            x2, gamma, beta, num_groups, eps, act, out_dtype
        ).reshape(shape)
    return _fused_gn(x2, gamma, beta, num_groups, eps, act, out_dtype).reshape(shape)
