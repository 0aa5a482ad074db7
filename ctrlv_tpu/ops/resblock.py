"""Fused spatial ResNet block (GN-SiLU-conv3x3 x2 + temb + residual) kernel.

Why: the denoise step's dominant pool is GroupNorm statistics + the
elementwise glue around the ResBlock convs (~145 ms of 462, PERF.md
round-2 addendum) — XLA's convert+reduce runs ~15x over the bandwidth
roofline and every norm/silu/add is a separate HBM pass. Standalone norm
kernels lose: the custom-call boundary next to XLA's convs inserts layout
copies (measured +110 ms). The only placement that wins is a kernel that
SPANS the convs: one program per (batch*frame) sample holds the whole
(H*W, C) activation in VMEM, computes both GroupNorms' f32 statistics
on-chip, and runs each 3x3 conv as 9 masked-roll matmuls on the MXU with
an f32 accumulator. HBM traffic collapses to x + weights + y.

The 3x3 conv over the flattened (H*W, C) sample: a (dy, dx) tap is a roll
by dy*W+dx rows with rows/cols that fall off the image masked to zero —
boundary semantics identical to padding=1. Group statistics use the
one-hot group-map matmul trick from ops/group_norm.py (no cross-lane
reshapes).

Replaces: torch ResnetBlock2D (diffusers) inside every SVD UNet/ControlNet
block — the cuDNN conv + GroupNorm path of the reference (SURVEY.md §2.8,
§2.9 "cuDNN conv / GroupNorm / SiLU in ResBlocks").

Backward: custom_vjp recompute through the XLA reference path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# OFF by default: hardware-validated but net-NEGATIVE in-graph (2026-08-17
# trace): the kernel itself hits the conv roofline (2.4 ms/instance — GN
# stats & glue become free), but the custom-call boundary stops XLA from
# fusing the ResBlock tail into the temporal block's reads, displacing
# ~10 ms of fusions; step 462 -> ~478 ms. Kept opt-in as the vehicle for
# any future layout-domain work and as the negative-result record.
_enabled = False

# Per-sample slab limit: x + h + acc(f32) + 2 weight sets + double-buffered
# io must fit ~16 MB VMEM. 1.75 MB bf16 slab covers 40x64x320 (full-res
# C=320) and 20x32x640 is 0.8 MB (weights are the limit there instead).
_MAX_SLAB_BYTES = int(1.75 * 1024 * 1024)
_MAX_W_BYTES = 5 * 1024 * 1024  # both (9, C, C) weight stacks together
# below this the shapes are unit-test/dryrun-sized: XLA wins and the
# custom call only complicates SPMD partitioning — don't route.
_MIN_SLAB_BYTES = 256 * 1024


def set_fused_resblock(on: bool) -> None:
    global _enabled
    _enabled = bool(on)


def resblock_supported(hw: int, c: int, groups: int, itemsize: int) -> bool:
    # c need not be 128-aligned (320/640 pad lanes); hw needs block align.
    return (
        _enabled
        and c % groups == 0
        and hw % 64 == 0
        and _MIN_SLAB_BYTES <= hw * c * itemsize <= _MAX_SLAB_BYTES
        and 2 * 9 * c * c * itemsize <= _MAX_W_BYTES
    )


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _group_map(c: int, g: int):
    gs = c // g
    ch = jnp.arange(c) // gs
    return (ch[:, None] == jnp.arange(g)[None, :]).astype(jnp.float32)  # (C, G)


def _gn_affine(s, s2, gamma_ref, beta_ref, m_ref, mt_ref, count, eps):
    """Turn channel sums into per-channel (scale, shift) for the norm."""
    gs = jnp.dot(s, m_ref[:], preferred_element_type=jnp.float32)  # (1, G)
    gs2 = jnp.dot(s2, m_ref[:], preferred_element_type=jnp.float32)
    mean_g = gs / count
    var_g = gs2 / count - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, mt_ref[:], preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, mt_ref[:], preferred_element_type=jnp.float32)
    a = rstd_c * gamma_ref[:]
    b = beta_ref[:] - mean_c * a
    return a, b


def _conv3x3_block(h_ref, i, blk, pad, w_ref, col_l, col_r, width):
    """One output row-block of the 3x3 conv. The ref slice is 8-aligned
    (offset i*blk, length blk+2*pad); the misaligned +-1 tap offsets are
    VALUE-level slices of the loaded halo block — Mosaic lowers those as
    vector shifts, while misaligned *ref* slices are rejected. Column
    masks kill cross-row wraps; row padding is physical zeros."""
    c = h_ref.shape[-1]
    hb = h_ref[pl.ds(i * blk, blk + 2 * pad), :]
    acc = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            off = pad + dy * width + dx
            tap = jax.lax.slice(hb, (off, 0), (off + blk, c))
            if dx == -1:
                tap = jnp.where(col_l, tap, jnp.zeros_like(tap))
            elif dx == 1:
                tap = jnp.where(col_r, tap, jnp.zeros_like(tap))
            part = jax.lax.dot_general(
                tap,
                w_ref[(dy + 1) * 3 + (dx + 1)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc


def _resblock_kernel(
    x_ref, g1_ref, b1_ref, w1_ref, wb1_ref, temb_ref, g2_ref, b2_ref, w2_ref,
    wb2_ref, m_ref, mt_ref, o_ref, h1_ref, h2_ref, *,
    height, width, groups, eps, blk, pad,
):
    """Streaming fused ResBlock: full-sample GN statistics on-chip, convs
    as 9-tap matmuls over `blk`-row tiles read from zero-padded VMEM
    scratch. Every pass is a fori_loop so Mosaic allocates ONE block of
    temporaries per pass (unrolled loops blew the VMEM stack: 29.6 MB)."""
    hw = height * width
    c = x_ref.shape[-1]
    count = float(hw * (c // groups))
    dtype = o_ref.dtype
    nb = hw // blk
    zeros_c = (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32))

    def col_masks(i):
        rows = jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0) + i * blk
        ww = rows % width
        return ww >= 1, ww < width - 1

    # ---- pass 1: GN1 statistics over x ---------------------------------
    def stats1(i, carry):
        s, s2 = carry
        xb = x_ref[0, pl.ds(i * blk, blk), :].astype(jnp.float32)
        return (
            s + jnp.sum(xb, axis=0, keepdims=True),
            s2 + jnp.sum(xb * xb, axis=0, keepdims=True),
        )

    s, s2 = jax.lax.fori_loop(0, nb, stats1, zeros_c)
    a1, b1 = _gn_affine(s, s2, g1_ref, b1_ref, m_ref, mt_ref, count, eps)

    # ---- pass 2: h1 = silu(gn1(x)) into padded scratch -----------------
    h1_ref[0:pad, :] = jnp.zeros((pad, c), dtype)
    h1_ref[pad + hw : pad + hw + pad, :] = jnp.zeros((pad, c), dtype)

    def norm1(i, _):
        xb = x_ref[0, pl.ds(i * blk, blk), :].astype(jnp.float32)
        h1_ref[pl.ds(pad + i * blk, blk), :] = _silu(xb * a1 + b1).astype(dtype)
        return 0

    jax.lax.fori_loop(0, nb, norm1, 0)

    # ---- pass 3: conv1 + bias + temb -> h2 scratch (+ GN2 stats) -------
    # conv output is quantized to the compute dtype before norm2's stats,
    # exactly like the XLA fallback (nn.Conv emits dtype, GN re-upcasts).
    h2_ref[0:pad, :] = jnp.zeros((pad, c), dtype)
    h2_ref[pad + hw : pad + hw + pad, :] = jnp.zeros((pad, c), dtype)
    t1 = wb1_ref[:] + temb_ref[0]

    def conv1(i, carry):
        s, s2 = carry
        col_l, col_r = col_masks(i)
        acc = _conv3x3_block(h1_ref, i, blk, pad, w1_ref, col_l, col_r, width)
        hb = (acc + t1).astype(dtype)
        h2_ref[pl.ds(pad + i * blk, blk), :] = hb
        hf = hb.astype(jnp.float32)
        return (
            s + jnp.sum(hf, axis=0, keepdims=True),
            s2 + jnp.sum(hf * hf, axis=0, keepdims=True),
        )

    s, s2 = jax.lax.fori_loop(0, nb, conv1, zeros_c)
    a2, b2 = _gn_affine(s, s2, g2_ref, b2_ref, m_ref, mt_ref, count, eps)

    # ---- pass 4: h2 <- silu(gn2(h2)) in place (pads stay zero) ---------
    def norm2(i, _):
        hb = h2_ref[pl.ds(pad + i * blk, blk), :].astype(jnp.float32)
        h2_ref[pl.ds(pad + i * blk, blk), :] = _silu(hb * a2 + b2).astype(dtype)
        return 0

    jax.lax.fori_loop(0, nb, norm2, 0)

    # ---- pass 5: conv2 + bias + residual -> out ------------------------
    def conv2(i, _):
        col_l, col_r = col_masks(i)
        acc = _conv3x3_block(h2_ref, i, blk, pad, w2_ref, col_l, col_r, width)
        xb = x_ref[0, pl.ds(i * blk, blk), :].astype(jnp.float32)
        o_ref[0, pl.ds(i * blk, blk), :] = (acc + wb2_ref[:] + xb).astype(dtype)
        return 0

    jax.lax.fori_loop(0, nb, conv2, 0)


def _reference_resblock(x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2, groups, eps):
    """XLA reference: flax GroupNorm(f32) + silu + 3x3 same conv, x2."""
    n, hh, ww, c = x.shape
    dtype = x.dtype

    def gn(z, gamma, beta):
        zf = z.astype(jnp.float32).reshape(n, hh * ww, groups, c // groups)
        mean = jnp.mean(zf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(zf), axis=(1, 3), keepdims=True) - jnp.square(mean)
        y = (zf - mean) * jax.lax.rsqrt(var + eps)
        return y.reshape(n, hh, ww, c) * gamma + beta

    def conv(z, wk, wb):
        return (
            jax.lax.conv_general_dilated(
                z.astype(dtype),
                wk.astype(dtype),
                (1, 1),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            + wb
        )

    h = conv(_silu(gn(x, g1, b1)).astype(dtype), w1, wb1)
    h = h + temb[:, None, None, :]
    h = conv(_silu(gn(h, g2, b2)).astype(dtype), w2, wb2)
    return (h + x.astype(jnp.float32)).astype(dtype)


def _pick_blk(hw: int) -> int:
    for cand in (512, 256, 128, 64):
        if hw % cand == 0:
            return cand
    return 0


def _forward(x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2, groups, eps):
    n, height, width, c = x.shape
    hw = height * width
    dtype = x.dtype
    m = _group_map(c, groups)
    interpret = jax.default_backend() != "tpu"
    blk = _pick_blk(hw)
    pad = ((width + 1 + 7) // 8) * 8  # covers the widest tap shift, 8-aligned
    kernel = functools.partial(
        _resblock_kernel,
        height=height, width=width, groups=groups, eps=eps, blk=blk, pad=pad,
    )
    row = lambda v: v.reshape(1, c).astype(jnp.float32)
    wstack = lambda wk: wk.reshape(9, c, c).astype(dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), dtype),
        grid=(n,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, groups), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((pad + hw + pad, c), dtype),  # h1 (zero-padded)
            pltpu.VMEM((pad + hw + pad, c), dtype),  # h2 (zero-padded)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * hw * c * c * 9,
            bytes_accessed=(2 * n * hw * c + 2 * 9 * c * c) * x.dtype.itemsize,
            transcendentals=2 * n * hw * c,
        ),
    )(
        x.reshape(n, hw, c),
        row(g1),
        row(b1),
        wstack(w1),
        row(wb1),
        temb.reshape(n, 1, c).astype(jnp.float32),
        row(g2),
        row(b2),
        wstack(w2),
        row(wb2),
        m,
        m.T,
    )
    return out.reshape(n, height, width, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_resblock2d(x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2, groups, eps):
    """y = conv2(silu(gn2(conv1(silu(gn1(x))) + temb))) + x, one kernel.

    x: (N, H, W, C); w1/w2: (3, 3, C, C) HWIO; temb: (N, C) — the
    time-embedding already SiLU'd and projected (the (N,1280)@(1280,C)
    Dense is left to XLA; it is tiny). Same-channel blocks only.
    """
    return _forward(x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2, groups, eps)


def _fwd(x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2, groups, eps):
    y = _forward(x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2, groups, eps)
    return y, (x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2)


def _bwd(groups, eps, res, g):
    x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2 = res
    _, vjp = jax.vjp(
        lambda *a: _reference_resblock(*a, groups, eps),
        x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2,
    )
    return vjp(g.astype(x.dtype))


fused_resblock2d.defvjp(_fwd, _bwd)
