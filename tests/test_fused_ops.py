"""Numerical parity of the Pallas fused ops against their XLA references.

Covers ops/mha.py (layout-native spatial attention + batched temporal
attention), ops/layer_norm.py, ops/group_norm.py, and the exact
single-token cross-attention collapse in models/layers.py (softmax over
one key is identically 1). Kernels run in interpreter mode on CPU; the
same code path compiles via Mosaic on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.ops.group_norm import _reference_group_norm, group_norm
from ctrlv_tpu.ops.layer_norm import _reference_layer_norm, layer_norm
from ctrlv_tpu.ops.mha import (
    _xla_mha,
    mha_attention,
    mha_supported,
    small_mha_attention,
    small_mha_supported,
)


@pytest.fixture(autouse=True)
def _reset_fused_toggles():
    """The fused elementwise kernels are opt-in (measured net-negative
    in-graph, see ops/*.py docstrings); restore defaults after each test."""
    yield
    from ctrlv_tpu.ops.geglu_ff import set_fused_geglu_ff
    from ctrlv_tpu.ops.group_norm import set_fused_group_norm
    from ctrlv_tpu.ops.layer_norm import set_fused_layer_norm

    set_fused_geglu_ff(False)
    set_fused_group_norm(False)
    set_fused_layer_norm(False)


def _qkv(b, s, hd, dtype, sk=None):
    sk = sk or s
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return (
        jax.random.normal(ks[0], (b, s, hd), dtype),
        jax.random.normal(ks[1], (b, sk, hd), dtype),
        jax.random.normal(ks[2], (b, sk, hd), dtype),
    )


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 6e-3)])
def test_mha_matches_xla(dtype, atol):
    q, k, v = _qkv(2, 1024, 128, dtype)
    assert mha_supported(1024, 1024, 128, 2, jnp.dtype(dtype).itemsize)
    o = mha_attention(q, k, v, 2, 64**-0.5)
    r = _xla_mha(q, k, v, 2, 64**-0.5)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(r, np.float32), atol=atol
    )


@pytest.mark.parametrize("sched,block_q", [("pipe2", 0), ("pipe2", 256), ("pipe3", 256)])
def test_mha_tuning_variants_match_xla(sched, block_q):
    """The schedule/tile knobs (set_mha_tuning) only reorder the head
    pipeline — numerics must be identical to the default kernel."""
    from ctrlv_tpu.ops.mha import set_mha_tuning

    q, k, v = _qkv(2, 1024, 128, jnp.float32)
    try:
        set_mha_tuning(sched, block_q)
        o = mha_attention(q, k, v, 2, 64**-0.5)
    finally:
        set_mha_tuning()
    r = _xla_mha(q, k, v, 2, 64**-0.5)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(r, np.float32), atol=2e-5
    )


def test_mha_routing_rejects_small_seq():
    # XLA wins below S=1024 (PERF.md); make sure we don't route there.
    assert not mha_supported(640, 640, 640, 10, 2)
    assert not mha_supported(2560, 1, 320, 5, 2)  # cross-attn


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 6e-3)])
def test_small_mha_matches_xla(dtype, atol):
    q, k, v = _qkv(512, 25, 320, dtype)
    assert small_mha_supported(512, 25, 25, 320, 5, jnp.dtype(dtype).itemsize)
    o = small_mha_attention(q, k, v, 5, 64**-0.5)
    r = _xla_mha(q, k, v, 5, 64**-0.5)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(r, np.float32), atol=atol
    )


def test_mha_grads_match_xla():
    q, k, v = _qkv(1, 256, 128, jnp.float32)
    # force the kernel path (sq>=1024 gate bypassed by calling directly)
    f = lambda q_, k_, v_: jnp.sum(mha_attention(q_, k_, v_, 2, 64**-0.5) ** 2)
    r = lambda q_, k_, v_: jnp.sum(_xla_mha(q_, k_, v_, 2, 64**-0.5) ** 2)
    g1 = jax.grad(f, (0, 1, 2))(q, k, v)
    g2 = jax.grad(r, (0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_single_token_cross_attention_collapse_exact():
    """softmax over one key == 1, so attention output == V exactly."""
    from ctrlv_tpu.models.layers import Attention

    attn = Attention(query_dim=32, heads=2, dim_head=16, cross_attention_dim=48)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (3, 1, 48))
    params = attn.init(jax.random.PRNGKey(0), x, ctx)
    out = attn.apply(params, x, ctx)

    # reference: the full softmax path on the same params
    p = params["params"]
    v = ctx @ p["to_v"]["kernel"]
    ref = v @ p["to_out_0"]["kernel"] + p["to_out_0"]["bias"]
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(ref), out.shape), rtol=1e-6
    )
    # param tree keeps the diffusers names (checkpoint compatibility)
    assert set(p.keys()) == {"to_q", "to_k", "to_v", "to_out_0"}


def test_layer_norm_matches_reference():
    from ctrlv_tpu.ops.layer_norm import set_fused_layer_norm

    set_fused_layer_norm(True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 320), jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(1), (320,)) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (320,)) * 0.1
    y = layer_norm(x, g, b)
    r = _reference_layer_norm(x.reshape(-1, 320), g, b, 1e-6).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(-1, 320), np.asarray(r, np.float32), atol=2e-2
    )


def test_group_norm_matches_reference():
    from ctrlv_tpu.ops.group_norm import set_fused_group_norm

    set_fused_group_norm(True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8, 320))
    g = jax.random.normal(jax.random.PRNGKey(1), (320,)) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (320,)) * 0.1
    for act in (None, "silu"):
        y = group_norm(x, g, b, 32, 1e-6, act)
        r = _reference_group_norm(x.reshape(4, 48, 320), g, b, 32, 1e-6, act)
        np.testing.assert_allclose(
            np.asarray(y).reshape(4, 48, 320), np.asarray(r), atol=1e-5
        )


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_geglu_ff_matches_xla(dtype, atol):
    from ctrlv_tpu.ops.geglu_ff import _xla_ff, geglu_ff, geglu_ff_supported, set_fused_geglu_ff

    set_fused_geglu_ff(True)

    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    m, c, inner, out = 256, 128, 512, 128
    x = jax.random.normal(ks[0], (m, c), dtype)
    w1 = jax.random.normal(ks[1], (c, 2 * inner)) * 0.05
    b1 = jax.random.normal(ks[2], (2 * inner,)) * 0.1
    w2 = jax.random.normal(ks[3], (inner, out)) * 0.05
    b2 = jax.random.normal(ks[4], (out,)) * 0.1
    assert geglu_ff_supported(m, c, inner, out, jnp.dtype(dtype).itemsize)
    y = geglu_ff(x, w1, b1, w2, b2)
    r = _xla_ff(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(r, np.float32), atol=atol
    )


def test_geglu_ff_grads_match_xla():
    from ctrlv_tpu.ops.geglu_ff import _xla_ff, geglu_ff

    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    m, c, inner, out = 128, 128, 512, 128
    x = jax.random.normal(ks[0], (m, c))
    w1 = jax.random.normal(ks[1], (c, 2 * inner)) * 0.05
    b1 = jnp.zeros((2 * inner,))
    w2 = jax.random.normal(ks[3], (inner, out)) * 0.05
    b2 = jnp.zeros((out,))
    f = lambda *a: jnp.sum(geglu_ff(*a) ** 2)
    r = lambda *a: jnp.sum(_xla_ff(*a) ** 2)
    g1 = jax.grad(f, tuple(range(5)))(x, w1, b1, w2, b2)
    g2 = jax.grad(r, tuple(range(5)))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gelu_erf_matches_exact():
    """f32: the cheap-erf gelu == jax.nn.gelu(approximate=False) to ~1e-7;
    bf16: within one bf16 ulp of the exact erf gelu (4.7e-4 max)."""
    from ctrlv_tpu.ops.geglu_ff import gelu_erf

    x = jnp.linspace(-6.0, 6.0, 4001)
    np.testing.assert_allclose(
        np.asarray(gelu_erf(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
        atol=5e-7,
    )
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(gelu_erf(xb), np.float32),
        np.asarray(jax.nn.gelu(x, approximate=False)),
        atol=0.03,  # bf16 resolution at |gelu| up to 6
    )


def test_geglu_ff_routing_rejects_misaligned():
    from ctrlv_tpu.ops.geglu_ff import geglu_ff_supported, set_fused_geglu_ff

    set_fused_geglu_ff(False)
    assert not geglu_ff_supported(128000, 320, 1280, 320, 2)  # off by default
    set_fused_geglu_ff(True)
    assert not geglu_ff_supported(100, 128, 512, 128, 2)  # m not blockable
    assert not geglu_ff_supported(256, 96, 512, 128, 2)  # c too narrow
    # all three SVD channel levels route (C=1280 via inner-dim chunking)
    assert geglu_ff_supported(128000, 320, 1280, 320, 2)
    assert geglu_ff_supported(32000, 640, 2560, 640, 2)
    assert geglu_ff_supported(8000, 1280, 5120, 1280, 2)


def test_geglu_ff_chunked_matches_xla():
    """Inner-dim chunked path (C wide enough that weights don't fit VMEM)."""
    from ctrlv_tpu.ops.geglu_ff import _plan, _xla_ff, geglu_ff

    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    m, c, inner, out = 128, 1280, 5120, 1280
    assert _plan(m, c, inner, out, 4)[1] < inner  # actually chunked
    x = jax.random.normal(ks[0], (m, c))
    w1 = jax.random.normal(ks[1], (c, 2 * inner)) * 0.02
    b1 = jax.random.normal(ks[2], (2 * inner,)) * 0.1
    w2 = jax.random.normal(ks[3], (inner, out)) * 0.02
    b2 = jax.random.normal(ks[4], (out,)) * 0.1
    y = geglu_ff(x, w1, b1, w2, b2)
    r = _xla_ff(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(r, np.float32), atol=5e-5
    )


def test_geglu_ff_ln_matches_xla():
    """Pre-LayerNorm fused into the FF kernel == LN then FF, incl. grads."""
    from ctrlv_tpu.ops.geglu_ff import _xla_ln_ff, geglu_ff_ln

    ks = jax.random.split(jax.random.PRNGKey(3), 7)
    m, c, inner, out = 256, 128, 512, 128
    x = jax.random.normal(ks[0], (m, c)) * 3.0 + 0.5
    lng = jax.random.normal(ks[5], (c,)) * 0.2 + 1.0
    lnb = jax.random.normal(ks[6], (c,)) * 0.1
    w1 = jax.random.normal(ks[1], (c, 2 * inner)) * 0.05
    b1 = jax.random.normal(ks[2], (2 * inner,)) * 0.1
    w2 = jax.random.normal(ks[3], (inner, out)) * 0.05
    b2 = jax.random.normal(ks[4], (out,)) * 0.1
    y = geglu_ff_ln(x, lng, lnb, w1, b1, w2, b2, 1e-5)
    r = _xla_ln_ff(x, lng, lnb, w1, b1, w2, b2, 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r), atol=2e-5)
    f = lambda *a: jnp.sum(geglu_ff_ln(*a, 1e-5) ** 2)
    g = lambda *a: jnp.sum(_xla_ln_ff(*a, 1e-5) ** 2)
    g1 = jax.grad(f, tuple(range(7)))(x, lng, lnb, w1, b1, w2, b2)
    g2 = jax.grad(g, tuple(range(7)))(x, lng, lnb, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_transformer_block_keeps_diffusers_param_tree():
    """norm3/norm_in params stay at their diffusers paths after LN fusion."""
    from ctrlv_tpu.models.layers import BasicTransformerBlock, TemporalBasicTransformerBlock

    blk = BasicTransformerBlock(
        dim=64, num_attention_heads=2, attention_head_dim=32, cross_attention_dim=48
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 48))
    p = blk.init(jax.random.PRNGKey(2), x, ctx)["params"]
    assert set(p["norm3"].keys()) == {"scale", "bias"}
    assert {"norm1", "norm2", "norm3", "attn1", "attn2", "ff"} <= set(p.keys())

    tblk = TemporalBasicTransformerBlock(
        dim=64, num_attention_heads=2, attention_head_dim=32, cross_attention_dim=48
    )
    tp = tblk.init(jax.random.PRNGKey(3), x, ctx)["params"]
    assert set(tp["norm_in"].keys()) == {"scale", "bias"}
    assert {"norm_in", "ff_in", "norm1", "norm2", "norm3", "attn1", "attn2", "ff"} <= set(
        tp.keys()
    )


def test_feedforward_module_matches_geglu_ff_kernel():
    """The opt-in fused kernel == the shipped nn.Dense FeedForward module
    on the same params (validates the kernel against the real module)."""
    from ctrlv_tpu.models.layers import FeedForward
    from ctrlv_tpu.ops.geglu_ff import geglu_ff

    ff = FeedForward(dim=128)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128))
    params = ff.init(jax.random.PRNGKey(1), x)
    # diffusers-compatible param tree (checkpoint parity)
    p = params["params"]
    assert set(p.keys()) == {"net_0", "net_2"}
    assert set(p["net_0"]["proj"].keys()) == {"kernel", "bias"}
    assert set(p["net_2"].keys()) == {"kernel", "bias"}
    y_mod = ff.apply(params, x)
    y_kern = geglu_ff(
        x.reshape(-1, 128),
        p["net_0"]["proj"]["kernel"],
        p["net_0"]["proj"]["bias"],
        p["net_2"]["kernel"],
        p["net_2"]["bias"],
    ).reshape(y_mod.shape)
    np.testing.assert_allclose(np.asarray(y_kern), np.asarray(y_mod), atol=2e-5)


@pytest.mark.heavy
def test_batched_chunk_decode_matches_sequential():
    """decode_latents batches equal-size chunks into one VAE call; equal to
    the reference's sequential chunk loop up to fp reassociation (the
    batched program reduces in a different order)."""
    from ctrlv_tpu.models import AutoencoderKLTemporalDecoder, VAEConfig
    from ctrlv_tpu.pipelines.common import decode_latents

    vae = AutoencoderKLTemporalDecoder(config=VAEConfig.tiny())
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8, 8, 4))
    params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    out = decode_latents(vae, params, lat, 0.18, decode_chunk_size=2)
    outs = []
    for s in range(0, 5, 2):
        p = lat[:, s : s + 2] / 0.18
        n = p.shape[1]
        d = vae.apply(params, p.reshape((n,) + p.shape[2:]), n, method=vae.decode)
        outs.append(d.reshape((1, n) + d.shape[1:]))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.concatenate(outs, axis=1)), atol=2e-5
    )


@pytest.mark.heavy
def test_decode_latents_max_frames_per_call_matches_unbounded():
    """ADVICE r2: max_frames_per_call bounds per-call decode memory while
    producing the same frames as the unbounded batched call."""
    from ctrlv_tpu.models import AutoencoderKLTemporalDecoder, VAEConfig
    from ctrlv_tpu.pipelines.common import decode_latents

    vae = AutoencoderKLTemporalDecoder(config=VAEConfig.tiny())
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 8, 8, 4))
    params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    ref = decode_latents(vae, params, lat, 0.18, decode_chunk_size=2)
    # cap at 2 frames per call -> one 2-frame chunk per vae.apply
    capped = decode_latents(
        vae, params, lat, 0.18, decode_chunk_size=2, max_frames_per_call=2
    )
    np.testing.assert_allclose(np.asarray(capped), np.asarray(ref), atol=2e-5)
    # a cap below one chunk still decodes whole chunks (min one per call)
    tiny_cap = decode_latents(
        vae, params, lat, 0.18, decode_chunk_size=2, max_frames_per_call=1
    )
    np.testing.assert_allclose(np.asarray(tiny_cap), np.asarray(ref), atol=2e-5)


def test_geglu_ff_falls_back_when_no_plan():
    """ADVICE r2: shapes with no VMEM-feasible tiling fall back to the XLA
    path instead of raising on tuple-unpack."""
    from ctrlv_tpu.ops.geglu_ff import _plan, _xla_ff, geglu_ff

    # c_in < 128 has no plan by construction
    assert _plan(64, 64, 256, 64, 4) is None
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    w1 = jax.random.normal(jax.random.PRNGKey(1), (64, 512)) * 0.02
    b1 = jnp.zeros((512,))
    w2 = jax.random.normal(jax.random.PRNGKey(2), (256, 64)) * 0.02
    b2 = jnp.zeros((64,))
    y = geglu_ff(x, w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(_xla_ff(x, w1, b1, w2, b2)), atol=1e-5
    )


def test_mha_supported_rejects_oversized_logits_tiles():
    """ADVICE r2: the VMEM gate accounts for the live f32 logits tiles, not
    just K+V residency (small-hd/long-Sk shapes used to slip through)."""
    from ctrlv_tpu.ops.mha import mha_supported

    # hot SVD spatial shape still routes to the kernel
    assert mha_supported(2560, 2560, 320, 5, 2)
    # hd=64, Sk=8192: KV = 2*8192*64*2 = 2 MB (passes the old KV-only gate)
    # but logits tiles = 3*128*8192*4 = 12.6 MB -> must be rejected now
    assert not mha_supported(8192, 8192, 64, 1, 2)


def test_fused_norm_out_dtype_single_rounding():
    """ADVICE r2: layer_norm/group_norm accept out_dtype so a bf16 input
    with out_dtype=f32 is not double-rounded through bf16."""
    from ctrlv_tpu.ops.group_norm import _reference_group_norm, group_norm
    from ctrlv_tpu.ops.layer_norm import _reference_layer_norm, layer_norm

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 64)).astype(jnp.bfloat16)
    g = jnp.ones((64,))
    b = jnp.zeros((64,))
    y = layer_norm(x, g, b, out_dtype=jnp.float32)
    assert y.dtype == jnp.float32
    ref = _reference_layer_norm(x.reshape(-1, 64), g, b, 1e-6).reshape(x.shape)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    y2 = group_norm(x, g, b, num_groups=8, out_dtype=jnp.float32)
    assert y2.dtype == jnp.float32
    ref2 = _reference_group_norm(
        x.reshape(4, 8, 64), g, b, 8, 1e-6, None, jnp.float32
    ).reshape(x.shape)
    np.testing.assert_array_equal(np.asarray(y2), np.asarray(ref2))


class TestLanePreservingGroupNorm:
    """models/layers.py GroupNorm: per-channel-then-group stats must equal
    flax nn.GroupNorm (which reshapes C into (G, C/G)) bit-closely in f32,
    across ranks (4D spatial, 5D temporal) and both torch eps values."""

    @pytest.mark.parametrize(
        "shape,groups,eps",
        [
            ((3, 8, 10, 64), 32, 1e-6),
            ((2, 5, 6, 8, 64), 32, 1e-5),
            ((4, 7, 96), 32, 1e-6),  # non-128-aligned channels
            ((2, 16, 8), 4, 1e-6),
        ],
    )
    def test_matches_flax(self, shape, groups, eps):
        import flax.linen as fnn

        from ctrlv_tpu.models.layers import GroupNorm

        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32) * 3 + 1.5
        ref_mod = fnn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
        new_mod = GroupNorm(num_groups=groups, epsilon=eps)
        rp = ref_mod.init(jax.random.PRNGKey(1), x)
        # param trees must be identical (checkpoint-compat: scale/bias names)
        np_ = new_mod.init(jax.random.PRNGKey(1), x)
        assert jax.tree.structure(rp) == jax.tree.structure(np_)
        # non-trivial affine params
        rp = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape), rp
        )
        ref = ref_mod.apply(rp, x)
        out = new_mod.apply(rp, x)
        assert out.dtype == ref.dtype
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_bf16_input_f32_out(self):
        import flax.linen as fnn

        from ctrlv_tpu.models.layers import GroupNorm

        x = (jax.random.normal(jax.random.PRNGKey(3), (2, 6, 6, 64)) * 2).astype(
            jnp.bfloat16
        )
        rp = fnn.GroupNorm(num_groups=8, epsilon=1e-6, dtype=jnp.float32).init(
            jax.random.PRNGKey(1), x
        )
        ref = fnn.GroupNorm(num_groups=8, epsilon=1e-6, dtype=jnp.float32).apply(rp, x)
        out = GroupNorm(num_groups=8, epsilon=1e-6).apply(rp, x)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


class TestFramesMajorTemporalAttention:
    """ops/mha.py frames-major kernel: attention over the F axis of
    (B*F, S, H*D) without the (B*S, F, H*D) relayout (PERF.md round-3:
    the relayout pair cost 7.7 ms/step of HBM `copy` at the top level)."""

    @pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 6e-3)])
    def test_matches_explicit_transpose_path(self, dtype, atol):
        from ctrlv_tpu.ops.mha import (
            small_mha_attention_fm,
            small_mha_fm_supported,
            xla_fm_attention,
        )

        b, f, s, hd, heads = 2, 25, 256, 320, 5
        q, k, v = _qkv(b * f, s, hd, dtype)
        assert small_mha_fm_supported(b * f, s, hd, heads, f, jnp.dtype(dtype).itemsize)
        o = small_mha_attention_fm(q, k, v, heads, 64**-0.5, f)
        r = xla_fm_attention(q, k, v, heads, 64**-0.5, f)
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(r, np.float32), atol=atol
        )

    def test_grads_match_explicit_transpose_path(self):
        from ctrlv_tpu.ops.mha import small_mha_attention_fm, xla_fm_attention

        b, f, s, hd, heads = 1, 5, 64, 128, 2
        q, k, v = _qkv(b * f, s, hd, jnp.float32)
        fk = lambda q_, k_, v_: jnp.sum(
            small_mha_attention_fm(q_, k_, v_, heads, 64**-0.5, f) ** 2
        )
        fr = lambda q_, k_, v_: jnp.sum(
            xla_fm_attention(q_, k_, v_, heads, 64**-0.5, f) ** 2
        )
        g1 = jax.grad(fk, (0, 1, 2))(q, k, v)
        g2 = jax.grad(fr, (0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)

    def test_temporal_block_frames_major_matches_seq_layout(self):
        """TemporalBasicTransformerBlock(frames_major=F) on (B*F, S, C) must
        equal the legacy (B*S, F, C) call transposed — same params."""
        from ctrlv_tpu.models.layers import TemporalBasicTransformerBlock

        b, f, s, c = 2, 5, 8, 64
        blk = TemporalBasicTransformerBlock(
            dim=c, num_attention_heads=2, attention_head_dim=32,
            cross_attention_dim=48,
        )
        x_fm = jax.random.normal(jax.random.PRNGKey(3), (b * f, s, c))
        ctx_fm = jax.random.normal(jax.random.PRNGKey(4), (b, 1, 1, 48))
        ctx_fm_b = jnp.broadcast_to(ctx_fm, (b, f, 1, 48)).reshape(b * f, 1, 48)
        params = blk.init(jax.random.PRNGKey(0), x_fm, ctx_fm_b, frames_major=f)

        out_fm = blk.apply(params, x_fm, ctx_fm_b, frames_major=f)

        # legacy layout: (B*S, F, C) with per-pixel context
        x_seq = (
            x_fm.reshape(b, f, s, c).transpose(0, 2, 1, 3).reshape(b * s, f, c)
        )
        ctx_seq = jnp.broadcast_to(ctx_fm, (b, s, 1, 48)).reshape(b * s, 1, 48)
        out_seq = blk.apply(params, x_seq, ctx_seq)
        out_seq_fm = (
            out_seq.reshape(b, s, f, c).transpose(0, 2, 1, 3).reshape(b * f, s, c)
        )
        np.testing.assert_allclose(
            np.asarray(out_fm), np.asarray(out_seq_fm), atol=2e-5
        )

    def test_transformer_st_layouts_agree(self):
        """TransformerSpatioTemporalModel: temporal_layout="frames_major"
        must match the default seq layout (same params, same input)."""
        from ctrlv_tpu.models.transformer_st import TransformerSpatioTemporalModel

        b, f, hgt, wdt, c = 1, 3, 4, 4, 64
        x = jax.random.normal(jax.random.PRNGKey(5), (b * f, hgt, wdt, c))
        ehs = jax.random.normal(jax.random.PRNGKey(6), (b * f, 1, 48))
        ioi = jnp.zeros((b, f))
        kw = dict(
            num_attention_heads=2, attention_head_dim=32, in_channels=c,
            cross_attention_dim=48,
        )
        m_seq = TransformerSpatioTemporalModel(**kw)
        m_fm = TransformerSpatioTemporalModel(temporal_layout="frames_major", **kw)
        params = m_seq.init(jax.random.PRNGKey(0), x, ehs, ioi)
        assert jax.tree.structure(params) == jax.tree.structure(
            m_fm.init(jax.random.PRNGKey(0), x, ehs, ioi)
        )
        out_seq = m_seq.apply(params, x, ehs, ioi)
        out_fm = m_fm.apply(params, x, ehs, ioi)
        np.testing.assert_allclose(
            np.asarray(out_fm), np.asarray(out_seq), atol=2e-5
        )
