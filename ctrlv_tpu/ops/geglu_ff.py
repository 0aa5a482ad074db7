"""Fused GEGLU feed-forward (Dense -> geglu -> Dense) Pallas kernel.

STATUS: measured SLOWER than XLA on hardware — routed OFF by default.

The hypothesis (PERF.md round-2 pools) was that the ~96 ms/step FF pool was
memory-bound on the (M, 4C) expanded intermediate. A hardware trace of the
kernel-routed step (2026-08-17) refuted it: summed over all 69 FF
instances the pool is ~21.7 TFLOP of irreducible MXU work — XLA was
already at ~70% of bf16 peak — and the kernel ran the same instances at
149 ms (per-program (bm, 320)x(320, 2560) matmuls pipeline worse than one
flat matmul) while the custom-call boundary materialized ~40 ms of layout
copies that XLA had fused into the adjacent matmuls for free. Net: step
462 -> 549 ms. Kept opt-in (`set_fused_geglu_ff(True)`) as the vehicle for
the LN-fusion experiment and as documentation of the negative result;
don't re-enable without beating that trace.

gelu flavor is exact erf, matching torch.nn.functional.gelu's default used
by diffusers' GEGLU (tests/test_torch_parity.py::test_gelu_geglu_match_torch).

Backward: custom_vjp recomputes through the XLA reference path (standard
remat — the backward is matmul-bound and XLA handles flat matmuls fine).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Soft VMEM budget per program (bytes). v5e has ~16 MB/core; weight chunks
# are double-buffered across grid steps, which _plan accounts for.
_VMEM_BUDGET = 13 * 1024 * 1024

_enabled = False  # measured slower than XLA at the SVD shapes; see docstring
# Shape gate: route only FF sites with c_in <= _max_cin. The r2 negative
# result came from routing ALL 69 FF instances — the high-C instances are
# MXU-bound (tokens×C² constant per instance => FLOPs constant, but HBM
# traffic ∝ tokens×C = const/C), so only the low-C/high-token instances
# can beat XLA's flat matmuls on memory traffic. None = no gate.
_max_cin: int | None = None


def set_fused_geglu_ff(on: bool, max_cin: int | None = None) -> None:
    global _enabled, _max_cin
    _enabled = bool(on)
    _max_cin = max_cin


def _plan(m: int, c_in: int, inner: int, c_out: int, itemsize: int):
    """Pick (token block, inner chunk) or None if shapes don't fit/align."""
    if min(c_in, inner, c_out) < 128:
        return None
    sublane = 32 // itemsize  # min tile: (16,128) bf16, (8,128) f32
    for bm in (512, 400, 256, 200, 128):
        if m % bm or bm % sublane:
            continue
        for ch in range(inner, 127, -128):  # 128-aligned divisors, big first
            if ch % 128 or inner % ch:
                continue
            # wa/wg/w2 chunks are double-buffered along the chunk grid dim;
            # x/out blocks are double-buffered along the token grid dim
            w = 2 * (2 * c_in * ch + ch * c_out) * itemsize
            x_io = 2 * bm * (c_in + c_out) * itemsize
            scratch = 2 * bm * ch * itemsize + bm * c_out * 4
            if w + x_io + scratch <= _VMEM_BUDGET:
                return bm, ch
    return None


def geglu_ff_supported(m: int, c_in: int, inner: int, c_out: int, itemsize: int) -> bool:
    if not _enabled or (_max_cin is not None and c_in > _max_cin):
        return False
    return _plan(m, c_in, inner, c_out, itemsize) is not None


def _erf(x):
    """erf from elementwise primitives (exp + rational), VPU-cheap.

    Abramowitz & Stegun 7.1.26 rational approximation, |err| <= 1.5e-7 —
    below bf16 resolution and below the f32 tolerance of the parity tests.
    Used both inside Mosaic kernels (which have no erf/erfc lowering) and
    in the XLA model paths: XLA's own erfc lowering measured ~3x the cost
    of this polynomial in the geglu fusions (+22 ms/step, PERF.md).
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_erf(x):
    """erf-gelu (torch F.gelu default semantics) at minimum VPU cost.

    This is the gelu for every GEGLU FF in the model — diffusers uses
    torch's erf gelu, not flax's default tanh approximation.

    bf16 compute: the tanh form IS the erf form at bf16 precision — max
    |tanh-gelu − erf-gelu| = 4.7e-4, i.e. at most one bf16 ulp on ~1.2%
    of all bf16 inputs (measured exhaustively), while the f32 erf
    polynomial's upcast internals cost ~20 ms/step on the VPU.
    f32 compute: A&S erf, |err| <= 1.5e-7 (f32-exact for all practical
    purposes, and lowerable inside Mosaic kernels unlike lax.erfc).
    """
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))).astype(x.dtype)


def _gelu_exact(x):
    """Kernel-internal exact-erf gelu (f32 internals regardless of dtype)."""
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))).astype(x.dtype)


def _ff_body(x, wa_ref, ba_ref, wg_ref, bg_ref, w2_ref, b2_ref, o_ref, acc_ref):
    k = pl.program_id(1)
    nk = pl.num_programs(1)
    # f32 MXU accumulation, cast to compute dtype — matching what the XLA
    # Dense(dtype=bf16) path produces for the expanded intermediate.
    a = (
        jnp.dot(x, wa_ref[:], preferred_element_type=jnp.float32)
        + ba_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    g = (
        jnp.dot(x, wg_ref[:], preferred_element_type=jnp.float32)
        + bg_ref[:].astype(jnp.float32)
    ).astype(x.dtype)
    act = a * _gelu_exact(g)  # (bm, ch) — VMEM only
    part = jnp.dot(act, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = part + b2_ref[:].astype(jnp.float32)

    @pl.when(k > 0)
    def _():
        acc_ref[:] = acc_ref[:] + part

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _ff_kernel(x_ref, wa_ref, ba_ref, wg_ref, bg_ref, w2_ref, b2_ref, o_ref, acc_ref):
    _ff_body(x_ref[:], wa_ref, ba_ref, wg_ref, bg_ref, w2_ref, b2_ref, o_ref, acc_ref)


def _ff_ln_kernel(
    x_ref, lng_ref, lnb_ref, wa_ref, ba_ref, wg_ref, bg_ref, w2_ref, b2_ref,
    o_ref, acc_ref, *, eps,
):
    """Pre-LayerNorm fused in: per-row f32 stats over the lane axis, then
    the same GEGLU MLP body. Removes the LN stats+apply passes (and their
    HBM round-trip) at every norm->FF site. Recomputed per inner chunk —
    VPU-cheap next to the matmuls."""
    xf = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)) * lng_ref[:] + lnb_ref[:]
    _ff_body(
        xn.astype(x_ref.dtype), wa_ref, ba_ref, wg_ref, bg_ref, w2_ref, b2_ref,
        o_ref, acc_ref,
    )


def _xla_ff(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1.astype(x.dtype)) + b1.astype(x.dtype)
    inner = w2.shape[0]
    a, g = h[:, :inner], h[:, inner:]
    act = a * gelu_erf(g)
    return jnp.dot(act, w2.astype(x.dtype)) + b2.astype(x.dtype)


def _xla_ln(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def _xla_ln_ff(x, lng, lnb, w1, b1, w2, b2, eps):
    return _xla_ff(_xla_ln(x, lng, lnb, eps), w1, b1, w2, b2)


def _ff_forward(x, w1, b1, w2, b2, ln=None):
    m, c_in = x.shape
    inner, c_out = w2.shape
    plan = _plan(m, c_in, inner, c_out, x.dtype.itemsize)
    if plan is None:
        # No VMEM-feasible tiling for this shape: fall back to the XLA path
        # (numerically the custom_vjp's backward reference) instead of
        # failing on tuple-unpack. Callers need not pre-check
        # geglu_ff_supported for correctness — only for routing decisions.
        if ln is None:
            return _xla_ff(x, w1, b1, w2, b2)
        lng, lnb, eps = ln
        return _xla_ln_ff(x, lng, lnb, w1, b1, w2, b2, eps)
    bm, ch = plan
    nk = inner // ch
    interpret = jax.default_backend() != "tpu"
    wdt = x.dtype
    wa, wg = w1[:, :inner].astype(wdt), w1[:, inner:].astype(wdt)
    ba, bg = b1[:inner].reshape(1, -1).astype(wdt), b1[inner:].reshape(1, -1).astype(wdt)
    ln_specs, ln_args = [], []
    if ln is None:
        kernel = _ff_kernel
    else:
        lng, lnb, eps = ln
        kernel = functools.partial(_ff_ln_kernel, eps=eps)
        ln_specs = [
            pl.BlockSpec((1, c_in), lambda i, k: (0, 0), memory_space=pltpu.VMEM)
        ] * 2
        ln_args = [
            lng.reshape(1, c_in).astype(jnp.float32),
            lnb.reshape(1, c_in).astype(jnp.float32),
        ]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, c_out), x.dtype),
        grid=(m // bm, nk),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((bm, c_in), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
            *ln_specs,
            pl.BlockSpec((c_in, ch), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, ch), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch), lambda i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((ch, c_out), lambda i, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, c_out), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, c_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * c_in * 2 * inner + 2 * m * inner * c_out,
            bytes_accessed=(
                m * c_in * (1 + (nk - 1)) + c_in * 2 * inner + inner * c_out + m * c_out
            )
            * x.dtype.itemsize,
            transcendentals=m * inner,
        ),
    )(x, *ln_args, wa, ba, wg, bg, w2.astype(wdt), b2.reshape(1, -1).astype(wdt))


@jax.custom_vjp
def geglu_ff(x, w1, b1, w2, b2):
    """Fused y = (a * gelu(g)) @ w2 + b2 with [a|g] = x @ w1 + b1.

    x: (M, C_in); w1: (C_in, 2*inner); w2: (inner, C_out). Weights may be
    f32 (flax param_dtype) — they are cast to x.dtype for compute, exactly
    like nn.Dense(dtype=x.dtype) would.
    """
    return _ff_forward(x, w1, b1, w2, b2)


def _ff_fwd(x, w1, b1, w2, b2):
    return _ff_forward(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ff_bwd(res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(_xla_ff, x, w1, b1, w2, b2)
    return vjp(g.astype(x.dtype))


geglu_ff.defvjp(_ff_fwd, _ff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def geglu_ff_ln(x, lng, lnb, w1, b1, w2, b2, eps):
    """LayerNorm -> GEGLU MLP, fully fused: y = ff(ln(x)).

    Semantics match `nn.LayerNorm(dtype=f32)(x).astype(x.dtype)` followed
    by the diffusers FeedForward, with f32 LN statistics computed in VMEM.
    """
    return _ff_forward(x, w1, b1, w2, b2, ln=(lng, lnb, eps))


def _ff_ln_fwd(x, lng, lnb, w1, b1, w2, b2, eps):
    y = _ff_forward(x, w1, b1, w2, b2, ln=(lng, lnb, eps))
    return y, (x, lng, lnb, w1, b1, w2, b2)


def _ff_ln_bwd(eps, res, g):
    x, lng, lnb, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_ln_ff(*a, eps), x, lng, lnb, w1, b1, w2, b2
    )
    return vjp(g.astype(x.dtype))


geglu_ff_ln.defvjp(_ff_ln_fwd, _ff_ln_bwd)
