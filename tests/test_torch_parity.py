"""Numerical parity of core flax layers vs torch (CPU) with converted weights.

These pin down the assumptions the HF checkpoint importer relies on:
GroupNorm channel-grouping order, conv weight layout transforms, SAME-style
padding conventions, LayerNorm/GELU numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import flax.linen as fnn


def _np(x):
    return x.detach().numpy()


def test_groupnorm_grouping_order():
    """flax GroupNorm must group channels in the same consecutive chunks
    as torch.nn.GroupNorm (importer copies scale/bias verbatim)."""
    torch.manual_seed(0)
    C, G = 12, 4
    tg = torch.nn.GroupNorm(G, C)
    with torch.no_grad():
        tg.weight.copy_(torch.randn(C))
        tg.bias.copy_(torch.randn(C))
    x = torch.randn(2, C, 5, 7)

    ref = _np(tg(x)).transpose(0, 2, 3, 1)  # NCHW -> NHWC

    fg = fnn.GroupNorm(num_groups=G, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(_np(tg.weight)), "bias": jnp.asarray(_np(tg.bias))}}
    out = np.asarray(fg.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_conv2d_weight_transform():
    """torch OIHW conv weights -> flax HWIO via the importer transpose."""
    torch.manual_seed(0)
    tc = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = torch.randn(2, 3, 10, 12)
    ref = _np(tc(x)).transpose(0, 2, 3, 1)

    fc = fnn.Conv(8, (3, 3), padding=((1, 1), (1, 1)))
    kernel = _np(tc.weight).transpose(2, 3, 1, 0)  # OIHW -> HWIO
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(_np(tc.bias))}}
    out = np.asarray(fc.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_conv3d_temporal_weight_transform():
    """(3,1,1) temporal conv: torch OIdhw -> flax dhwIO."""
    torch.manual_seed(0)
    tc = torch.nn.Conv3d(4, 6, (3, 1, 1), padding=(1, 0, 0))
    x = torch.randn(1, 4, 5, 6, 7)  # N C T H W
    ref = _np(tc(x)).transpose(0, 2, 3, 4, 1)  # -> N T H W C

    fc = fnn.Conv(6, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)))
    kernel = _np(tc.weight).transpose(2, 3, 4, 1, 0)
    params = {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(_np(tc.bias))}}
    out = np.asarray(fc.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 4, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_vae_downsample_padding():
    """VAE encoder downsampler: asymmetric (0,1) pad + stride-2 VALID conv
    must equal torch's pad(0,1,0,1) + Conv2d(stride=2, padding=0)."""
    from ctrlv_tpu.models.layers import DownsampleVAE2D

    torch.manual_seed(0)
    tc = torch.nn.Conv2d(4, 8, 3, stride=2, padding=0)
    x = torch.randn(1, 4, 9, 11)
    xp = torch.nn.functional.pad(x, (0, 1, 0, 1))
    ref = _np(tc(xp)).transpose(0, 2, 3, 1)

    ds = DownsampleVAE2D(8)
    kernel = _np(tc.weight).transpose(2, 3, 1, 0)
    params = {"params": {"conv": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(_np(tc.bias))}}}
    out = np.asarray(ds.apply(params, jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_timestep_embedding_flip_order():
    """flip_sin_to_cos=True puts cos first (diffusers Timesteps semantics)."""
    from ctrlv_tpu.models.layers import get_timestep_embedding

    emb = np.asarray(get_timestep_embedding(jnp.asarray([0.0]), 8))
    # t=0: cos(0)=1 in first half, sin(0)=0 in second half
    np.testing.assert_allclose(emb[0, :4], 1.0)
    np.testing.assert_allclose(emb[0, 4:], 0.0)

    # spot value: t=5, dim 8, half=4, freq_i = exp(-ln(10000)*i/4)
    emb5 = np.asarray(get_timestep_embedding(jnp.asarray([5.0]), 8))
    freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4)
    np.testing.assert_allclose(emb5[0, :4], np.cos(5 * freqs), atol=1e-6)
    np.testing.assert_allclose(emb5[0, 4:], np.sin(5 * freqs), atol=1e-6)


def test_gelu_geglu_match_torch():
    torch.manual_seed(0)
    x = torch.randn(4, 16)
    ref = _np(torch.nn.functional.gelu(x))
    out = np.asarray(fnn.gelu(jnp.asarray(_np(x)), approximate=False))
    np.testing.assert_allclose(out, ref, atol=1e-6)
