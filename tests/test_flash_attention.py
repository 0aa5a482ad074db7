"""Pallas flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.ops.attention import _xla_attention, dot_product_attention
from ctrlv_tpu.ops.flash_attention import _pick_block_q, flash_attention


@pytest.mark.parametrize("sq,sk,d", [(256, 256, 64), (128, 384, 64)])
def test_flash_matches_xla(sq, sk, d):
    rng = jax.random.PRNGKey(0)
    b, h = 2, 2
    q = jax.random.normal(rng, (b, sq, h, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, sk, h, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, sk, h, d), jnp.float32)
    scale = d**-0.5
    ref = _xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_gradient_matches_xla():
    rng = jax.random.PRNGKey(0)
    b, s, h, d = 1, 128, 1, 64
    q = jax.random.normal(rng, (b, s, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    scale = d**-0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3)


def test_block_q_selection():
    assert _pick_block_q(2560) == 512
    assert _pick_block_q(640) == 128
    assert _pick_block_q(40) == 0  # falls back to XLA


def test_dispatcher_fallback_small_seq():
    """Tiny temporal attention (25 tokens) must use the XLA path."""
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (4, 25, 2, 64))
    out = dot_product_attention(q, q, q)
    assert out.shape == q.shape
