"""Parity of the fused spatial ResBlock kernel (ops/resblock.py) against
its XLA reference, and of the routed ResnetBlock2D module against the
original nn.GroupNorm/nn.Conv composition. Kernels run in interpreter mode
on CPU; the same code compiles via Mosaic on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctrlv_tpu.ops.resblock import (
    _reference_resblock,
    fused_resblock2d,
    resblock_supported,
    set_fused_resblock,
)


@pytest.fixture(autouse=True)
def _restore_toggle():
    # opt-in kernel (pending hardware validation); exercise it here, restore
    set_fused_resblock(True)
    yield
    set_fused_resblock(False)


def _inputs(n, h, w, c, dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 11)
    x = jax.random.normal(ks[0], (n, h, w, c), dtype)
    g1 = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
    b1 = jax.random.normal(ks[2], (c,)) * 0.1
    w1 = jax.random.normal(ks[3], (3, 3, c, c)) * (1.0 / np.sqrt(9 * c))
    wb1 = jax.random.normal(ks[4], (c,)) * 0.1
    temb = jax.random.normal(ks[5], (n, c))
    g2 = jax.random.normal(ks[6], (c,)) * 0.2 + 1.0
    b2 = jax.random.normal(ks[7], (c,)) * 0.1
    w2 = jax.random.normal(ks[8], (3, 3, c, c)) * (1.0 / np.sqrt(9 * c))
    wb2 = jax.random.normal(ks[9], (c,)) * 0.1
    return x, g1, b1, w1, wb1, temb, g2, b2, w2, wb2


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 5e-5), (jnp.bfloat16, 5e-2)])
def test_fused_resblock_matches_reference(dtype, atol):
    args = _inputs(2, 8, 16, 64, dtype)
    y = fused_resblock2d(*args, 8, 1e-6)
    r = _reference_resblock(*args, 8, 1e-6)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(r, np.float32), atol=atol
    )


def test_fused_resblock_boundary_masks():
    """Same-pad semantics: compare against lax.conv on an impulse image so
    every border tap is exercised."""
    n, h, w, c = 1, 8, 16, 64
    x = jnp.zeros((n, h, w, c))
    # impulses at the four corners and center
    for (i, j) in [(0, 0), (0, w - 1), (h - 1, 0), (h - 1, w - 1), (h // 2, w // 2)]:
        x = x.at[0, i, j, :].set(1.0)
    args = (x,) + _inputs(n, h, w, c, jnp.float32)[1:]
    y = fused_resblock2d(*args, 8, 1e-6)
    r = _reference_resblock(*args, 8, 1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(r), atol=5e-5)


def test_fused_resblock_grads_match_reference():
    args = _inputs(1, 8, 8, 64, jnp.float32)
    f = lambda *a: jnp.sum(fused_resblock2d(*a, 8, 1e-6) ** 2)
    r = lambda *a: jnp.sum(_reference_resblock(*a, 8, 1e-6) ** 2)
    g1 = jax.grad(f, tuple(range(10)))(*args)
    g2 = jax.grad(r, tuple(range(10)))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)


def test_routing_bounds():
    assert resblock_supported(2560, 320, 32, 2)  # full-res C=320
    assert not resblock_supported(640, 640, 32, 2)  # C=640 weights (14.7 MB)
    assert not resblock_supported(160, 1280, 32, 2)  # weights too big
    assert not resblock_supported(64, 64, 32, 2)  # unit-test sized: XLA
    assert not resblock_supported(2560 * 4, 320, 32, 2)  # slab too big
    set_fused_resblock(False)
    assert not resblock_supported(2560, 320, 32, 2)


def test_kernel_matches_resnetblock2d_module():
    """The opt-in fused kernel == the shipped nn-module ResnetBlock2D on
    the same params (same-channel block with temb). Differences are only
    rounding order (kernel keeps the conv accumulator f32 through the
    residual add)."""
    import flax.linen as nn

    from ctrlv_tpu.models.resnet import ResnetBlock2D

    blk = ResnetBlock2D(in_channels=64, out_channels=64, temb_channels=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 64))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    params = blk.init(jax.random.PRNGKey(2), x, temb)
    p = params["params"]
    assert {"norm1", "conv1", "time_emb_proj", "norm2", "conv2"} == set(p.keys())
    assert p["conv1"]["kernel"].shape == (3, 3, 64, 64)
    assert p["norm1"]["scale"].shape == (64,)
    assert resblock_supported(32 * 32, 64, 32, 4)
    y_mod = blk.apply(params, x, temb)
    tproj = nn.silu(temb) @ p["time_emb_proj"]["kernel"] + p["time_emb_proj"]["bias"]
    y_kern = fused_resblock2d(
        x,
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["conv1"]["kernel"], p["conv1"]["bias"],
        tproj,
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["conv2"]["kernel"], p["conv2"]["bias"],
        32, 1e-6,
    )
    np.testing.assert_allclose(np.asarray(y_kern), np.asarray(y_mod), atol=2e-4)


def test_module_channel_change_keeps_shortcut():
    from ctrlv_tpu.models.resnet import ResnetBlock2D

    blk = ResnetBlock2D(in_channels=32, out_channels=64, temb_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    params = blk.init(jax.random.PRNGKey(2), x, temb)
    assert "conv_shortcut" in params["params"]
    y = blk.apply(params, x, temb)
    assert y.shape == (2, 8, 8, 64)
    assert np.isfinite(np.asarray(y)).all()
