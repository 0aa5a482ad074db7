"""Layout-native fused multi-head attention Pallas kernel.

Motivation (PERF.md "Per-fusion profile"): XLA's attention at the SVD hot
spatial shape (B=50, S=2560, heads=5, d=64) materializes a pathological
[B,S,H,D]->[B,H,D,S] relayout costing 5.7 ms per attention (~40 ms/step
across the 7 full-res attentions) because the einsum path wants K/V in
head-major layout. This kernel consumes Q/K/V exactly as the QKV Dense
layers produce them — (B, S, H*D), default layout — and loops heads via
static lane slices inside VMEM, so no HBM relayout exists at all. Scores
live only in VMEM (never written to HBM).

Backward: custom_vjp recomputes with the XLA reference path (standard
remat; backward matmuls are MXU-bound either way).

Replaces the reference's xformers CUDA attention
(/root/reference/tools/train_video_diffusion.py:142-153) for the spatial
self-attention shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for K+V residency (bytes) — one (Sk, HD) pair per program.
_MAX_KV_BYTES = 8 * 1024 * 1024
# Total live-VMEM budget per program: K+V slabs + the f32 logits/exp tiles
# kept alive by the head-pipelined softmax (leaves headroom of v5e's ~16 MB
# for q/o blocks and double-buffering).
_MAX_LIVE_BYTES = 12 * 1024 * 1024


# Scheduling/tiling tune knobs for the spatial kernel, settable for A/B
# profiling (tools/profile_denoise.py --mha_sched/--mha_block_q):
#   sched "pipe3": issue head h+1's logits BEFORE head h's softmax — max
#     MXU/VPU overlap, but THREE live (bq, Sk) f32 tiles (l_cur, l_next, p).
#   sched "pipe2": issue head h+1's logits AFTER head h's exp, so l_cur is
#     dead by then — TWO live tiles, freeing VMEM for block_q 256 (fewer,
#     larger programs; the exp still overlaps the PREVIOUS head's AV matmul).
_MHA_TUNE = {"sched": "pipe3", "block_q": 0}  # block_q 0 = auto


def set_mha_tuning(sched: str = "pipe3", block_q: int = 0) -> None:
    assert sched in ("pipe3", "pipe2"), sched
    _MHA_TUNE["sched"] = sched
    _MHA_TUNE["block_q"] = block_q


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float, sched: str):
    """One-pass blocked attention, heads packed in the lane axis.

    K/V stay fully VMEM-resident per (batch, q-tile) program; each head's
    (block_q, Sk) score tile lives only in VMEM. Measured faster than a
    flash-style running-max k-block loop at the SVD shapes (fori overhead
    + rescale traffic outweigh the pipelining win when K fits VMEM).

    Two scheduling tricks vs the naive loop:
    - the softmax normalization divide is folded into the (bq, D) output
      (one multiply per output element instead of one divide per score);
    - head h+1's logits matmul is issued around head h's softmax (see
      _MHA_TUNE for the pipe3/pipe2 placement trade-off), giving the
      scheduler an independent MXU op to overlap with the VPU exp pass.
    """
    q = q_ref[0]  # (bq, H*D)
    k = k_ref[0]  # (Sk, H*D)
    v = v_ref[0]
    hd = q.shape[-1]
    d = hd // heads

    # log2(e) folded into the logits scale: softmax_e(s*z) == softmax_2
    # (s*log2e*z), so the exp pass is a bare exp2. Measured NEUTRAL vs
    # jnp.exp at the hot shape (37.8 vs 37.7 ms pool — the exp lowering
    # was not the bottleneck); kept for the marginally smaller op count.
    scale2 = scale * 1.4426950408889634

    def logits(h):
        sl = slice(h * d, (h + 1) * d)
        return jax.lax.dot_general(
            q[:, sl],
            k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale2  # (bq, Sk), base-2 domain

    l_cur = logits(0)
    for h in range(heads):
        if sched == "pipe3":
            l_next = logits(h + 1) if h + 1 < heads else None  # MXU, independent
        m = jnp.max(l_cur, axis=-1, keepdims=True)
        p = jnp.exp2(l_cur - m)  # VPU — overlaps an in-flight matmul
        if sched == "pipe2":
            # l_cur is dead here; only p + l_next alive (2 f32 tiles)
            l_next = logits(h + 1) if h + 1 < heads else None
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)  # (bq, 1)
        sl = slice(h * d, (h + 1) * d)
        o = jnp.dot(p.astype(o_ref.dtype), v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o * r).astype(o_ref.dtype)
        l_cur = l_next


def _live_logit_tiles() -> int:
    return 3 if _MHA_TUNE["sched"] == "pipe3" else 2


def _pick_block_q(seq_q: int) -> int:
    override = _MHA_TUNE["block_q"]
    if override and seq_q % override == 0:
        return override
    # 128 first for pipe3: it keeps two (bq, Sk) f32 logits tiles + one exp
    # tile alive; 256 blocks overflow VMEM by ~0.3 MB. pipe2's two live
    # tiles admit 256 (fewer, larger programs).
    cands = (128, 256, 512) if _MHA_TUNE["sched"] == "pipe3" else (256, 128, 512)
    for cand in cands:
        if seq_q % cand == 0:
            return cand
    return 0


def mha_supported(sq: int, sk: int, hd: int, heads: int, itemsize: int) -> bool:
    d = hd // heads
    # Route to the kernel only where XLA's einsum path is pathological
    # (the [B,S,H,D]->[B,H,D,S] relayout at long S); XLA wins at S<=640.
    bq = _pick_block_q(sq)
    if not (hd % heads == 0 and d in (64, 128) and sq >= 1024 and sk >= 1024
            and sk % 128 == 0 and bq > 0):
        return False
    # VMEM residency: K+V slabs plus the live f32 (block_q, Sk) score/exp
    # tiles of the head-pipelined softmax (3 for pipe3, 2 for pipe2).
    # Small-hd/long-Sk shapes pass a KV-only gate yet blow VMEM.
    kv_bytes = 2 * sk * hd * itemsize
    logits_bytes = _live_logit_tiles() * bq * sk * 4
    return kv_bytes <= _MAX_KV_BYTES and kv_bytes + logits_bytes <= _MAX_LIVE_BYTES


def _xla_mha(q3, k3, v3, heads, scale):
    b, sq, hd = q3.shape
    sk = k3.shape[1]
    d = hd // heads
    q = q3.reshape(b, sq, heads, d)
    k = k3.reshape(b, sk, heads, d)
    v = v3.reshape(b, sk, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * scale, axis=-1).astype(q3.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    return out.reshape(b, sq, hd)


def _xla_mha_sliced(q3, k3, v3, heads, scale):
    """Head-sliced XLA attention: identical math to `_xla_mha`, but each
    head is a lane-slice (B, S, d) batched dot instead of one BSHD einsum.

    Used as the custom-vjp RECOMPUTE path: the einsum form's vjp
    materializes the [B,S,H,D]<->[B,H,*,S] relayouts in the backward —
    the r5 training profile shows ~170 ms/step of exactly those pools
    (`fusion bf16[25,5,2560,64]` etc., PERF.md round-5 training profile).
    Slices and concats have no relayout; per-head logits are the same
    f32 (B, Sq, Sk) XLA materializes anyway."""
    hd = q3.shape[-1]
    d = hd // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jnp.einsum(
            "bqd,bkd->bqk", q3[..., sl], k3[..., sl],
            preferred_element_type=jnp.float32,
        )
        w = jax.nn.softmax(logits * scale, axis=-1).astype(q3.dtype)
        outs.append(jnp.einsum("bqk,bkd->bqd", w, v3[..., sl]))
    return jnp.concatenate(outs, axis=-1)


def _mha_forward(q3, k3, v3, heads, scale):
    b, sq, hd = q3.shape
    sk = k3.shape[1]
    block_q = _pick_block_q(sq)
    interpret = jax.default_backend() != "tpu"
    grid = (b, sq // block_q)
    d = hd // heads
    return pl.pallas_call(
        functools.partial(_mha_kernel, heads=heads, scale=scale, sched=_MHA_TUNE["sched"]),
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q3.dtype),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * hd,
            bytes_accessed=2 * (q3.size + k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=b * heads * sq * sk,
        ),
    )(q3, k3, v3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mha_attention(q3, k3, v3, heads: int, scale: float):
    """Multi-head attention over (B, S, H*D) tensors, heads packed in lanes."""
    return _mha_forward(q3, k3, v3, heads, scale)


def _mha_fwd(q3, k3, v3, heads, scale):
    return _mha_forward(q3, k3, v3, heads, scale), (q3, k3, v3)


def _mha_bwd(heads, scale, res, g):
    q3, k3, v3 = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_mha_sliced(q_, k_, v_, heads, scale), q3, k3, v3
    )
    return vjp(g)


mha_attention.defvjp(_mha_fwd, _mha_bwd)


# ---------------------------------------------------------------------------
# Batched small-sequence attention (the SVD temporal attention: seq = 25
# frames, huge batch = B*H*W pixels). XLA lowers this to thousands of
# sub-MXU-tile (25,64)@(64,25) matmuls in f32 plus BSHD relayout copies
# (~60 ms/step measured, PERF.md). This kernel blocks the batch axis into
# VMEM-resident tiles and keeps scores on-chip.
# ---------------------------------------------------------------------------

# Keep blocks small: each head's (nb, F, F) f32 score tile pads F->(32,128)
# on TPU, and the unrolled head loop holds several such tiles live.
_SMALL_BLOCK_BYTES = 512 * 1024


def _pick_block_n(n: int, f: int, hd: int, itemsize: int) -> int:
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if n % cand == 0 and cand * f * hd * itemsize <= _SMALL_BLOCK_BYTES:
            return cand
    return 0


def small_mha_supported(n: int, sq: int, sk: int, hd: int, heads: int, itemsize: int) -> bool:
    return (
        sq == sk
        and 2 <= sq <= 64
        and hd % heads == 0
        and (hd // heads) in (64, 128)
        and n >= 256
        and _pick_block_n(n, sq, hd, itemsize) > 0
    )


def _small_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    q = q_ref[:]  # (nb, F, H*D)
    k = k_ref[:]
    v = v_ref[:]
    hd = q.shape[-1]
    d = hd // heads
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, :, sl],
            k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (nb, F, F)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
        o_ref[:, :, sl] = jax.lax.dot_general(
            w,
            v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


# NOTE(r4): a head-packed (block-diagonal) variant that computed all heads
# in one MXU pass was built and measured in r3 (commit 1f0a0b0) and DELETED
# in r4: Mosaic on the real v5e toolchain rejects its lane->row concat, a
# batch-packed reformulation compiled but measured slower, and the whole
# temporal pool is <20 ms of the 457 ms step (~2% ceiling). PERF.md
# "head-packed temporal attention — CLOSED" holds the evidence.


def _small_forward(q3, k3, v3, heads, scale):
    n, f, hd = q3.shape
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_small_kernel, heads=heads, scale=scale)
    nb = _pick_block_n(n, f, hd, q3.dtype.itemsize)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, f, hd), q3.dtype),
        grid=(n // nb,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((nb, f, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec((nb, f, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * f * f * hd,
            bytes_accessed=2 * (q3.size + k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=n * heads * f * f,
        ),
    )(q3, k3, v3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def small_mha_attention(q3, k3, v3, heads: int, scale: float):
    """Attention over (N, F, H*D) with tiny F and huge N (temporal attn)."""
    return _small_forward(q3, k3, v3, heads, scale)


def _small_fwd(q3, k3, v3, heads, scale):
    return _small_forward(q3, k3, v3, heads, scale), (q3, k3, v3)


def _small_bwd(heads, scale, res, g):
    q3, k3, v3 = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_mha_sliced(q_, k_, v_, heads, scale), q3, k3, v3
    )
    return vjp(g)


small_mha_attention.defvjp(_small_fwd, _small_bwd)


# ---------------------------------------------------------------------------
# Frames-major temporal attention: same math as small_mha_attention, but the
# operands stay in the UNet's native (B*F, S, H*D) layout — frames major,
# pixels as the middle axis. XLA needs an HBM transpose pair per temporal
# transformer to get the (B*S, F, H*D) layout (7.7 ms/step of pure `copy`
# at the top level alone, PERF.md round-3); here the kernel's BlockSpec
# reads the (F, nb, HD) slab for one batch element directly — the "frame
# gather" is strided DMA, and the tiny transpose to (nb, F, HD) happens in
# VMEM where it is bandwidth-free relative to HBM.
# ---------------------------------------------------------------------------


def _pick_block_n_fm(s: int, f: int, hd: int, itemsize: int) -> int:
    # Tile (F, nb, HD) ≤ ~512 KB per operand. Mosaic allocates the unrolled
    # head loop's f32 score/exp tiles on the VMEM stack; a 1 MB operand
    # budget measured 30 MB of stack at (50,2560,320)/F=25 — keep blocks
    # small enough that slabs + per-head tiles + double buffering fit 16 MB.
    for cand in (64, 32, 16, 8):
        if s % cand == 0 and f * cand * hd * itemsize <= 512 * 1024:
            return cand
    return 0


def small_mha_fm_supported(
    bf: int, s: int, hd: int, heads: int, f: int, itemsize: int
) -> bool:
    return (
        f >= 2
        and f <= 64
        and bf % f == 0
        and hd % heads == 0
        and (hd // heads) in (64, 128)
        and (bf // f) * s >= 256
        and _pick_block_n_fm(s, f, hd, itemsize) > 0
    )


def _small_fm_kernel(q_ref, k_ref, v_ref, o_ref, o_scratch, *, heads: int, scale: float):
    # refs: (F, nb, HD) — all frames of one batch element's pixel block.
    # No slab transposes: each head's batched dots consume the frames-major
    # tiles directly (batch dim nb at axis 1), and only the accumulated
    # output is transposed once from scratch — this keeps the VMEM stack
    # small enough for Mosaic's unrolled-loop allocation.
    hd = q_ref.shape[-1]
    d = hd // heads
    # One whole-slab (F, nb, HD) -> (nb, F, HD) transpose per operand
    # (Mosaic batched matmuls require the batch dim at position 0; per-head
    # transposes measured 5.4 ms/instance vs ~1.4 for the seq-layout kernel)
    q = jnp.swapaxes(q_ref[:], 0, 1)
    k = jnp.swapaxes(k_ref[:], 0, 1)
    v = jnp.swapaxes(v_ref[:], 0, 1)
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, :, sl],
            k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # (nb, Fq, Fk)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)
        o = jax.lax.dot_general(
            w,
            v[:, :, sl],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (nb, F, d)
        o_scratch[:, :, sl] = o.astype(o_ref.dtype)
    o_ref[:] = jnp.swapaxes(o_scratch[:], 0, 1)  # (F, nb, HD)


def _xla_fm(q3, k3, v3, heads, scale, f):
    """Reference path: explicit transposes + batched attention."""
    bf, s, hd = q3.shape
    b = bf // f
    to_seq = lambda x: (
        x.reshape(b, f, s, hd).transpose(0, 2, 1, 3).reshape(b * s, f, hd)
    )
    out = _xla_mha(to_seq(q3), to_seq(k3), to_seq(v3), heads, scale)
    return out.reshape(b, s, f, hd).transpose(0, 2, 1, 3).reshape(bf, s, hd)


xla_fm_attention = _xla_fm  # public fallback path (used by models.layers)


def _small_fm_forward(q3, k3, v3, heads, scale, f):
    bf, s, hd = q3.shape
    b = bf // f
    nb = _pick_block_n_fm(s, f, hd, q3.dtype.itemsize)
    interpret = jax.default_backend() != "tpu"
    spec = pl.BlockSpec((f, nb, hd), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_small_fm_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bf, s, hd), q3.dtype),
        grid=(b, s // nb),
        interpret=interpret,
        in_specs=[spec] * 3,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((nb, f, hd), q3.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * bf * s * f * hd,
            bytes_accessed=2 * (q3.size + k3.size + v3.size) * q3.dtype.itemsize,
            transcendentals=bf * heads * s * f,
        ),
    )(q3, k3, v3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def small_mha_attention_fm(q3, k3, v3, heads: int, scale: float, num_frames: int):
    """Temporal attention over (B*F, S, H*D) without leaving frames-major."""
    return _small_fm_forward(q3, k3, v3, heads, scale, num_frames)


def _small_fm_fwd(q3, k3, v3, heads, scale, f):
    return _small_fm_forward(q3, k3, v3, heads, scale, f), (q3, k3, v3)


def _small_fm_bwd(heads, scale, f, res, g):
    q3, k3, v3 = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_fm(q_, k_, v_, heads, scale, f), q3, k3, v3
    )
    return vjp(g)


small_mha_attention_fm.defvjp(_small_fm_fwd, _small_fm_bwd)
