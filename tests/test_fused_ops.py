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
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 320), jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(1), (320,)) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (320,)) * 0.1
    y = layer_norm(x, g, b)
    r = _reference_layer_norm(x.reshape(-1, 320), g, b, 1e-6).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(-1, 320), np.asarray(r, np.float32), atol=2e-2
    )


def test_group_norm_matches_reference():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8, 320))
    g = jax.random.normal(jax.random.PRNGKey(1), (320,)) * 0.2 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (320,)) * 0.1
    for act in (None, "silu"):
        y = group_norm(x, g, b, 32, 1e-6, act)
        r = _reference_group_norm(x.reshape(4, 48, 320), g, b, 32, 1e-6, act)
        np.testing.assert_allclose(
            np.asarray(y).reshape(4, 48, 320), np.asarray(r), atol=1e-5
        )


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
