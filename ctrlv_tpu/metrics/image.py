"""SSIM / PSNR image metrics (jnp, channels-last).

Parity target: the skimage-based per-frame SSIM/PSNR in the reference's
offline video eval (/root/reference/src/ctrlv/metrics/fvd.py:187-289).
SSIM uses the standard Wang et al. gaussian-window formulation
(win 11, sigma 1.5, K1=0.01, K2=0.03), averaged over channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return g


def _filter2d_sep(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode gaussian filter over (H, W, C)."""
    k = kernel.shape[0]
    # rows
    img = jax.vmap(
        lambda c: jnp.apply_along_axis(
            lambda row: jnp.convolve(row, kernel, mode="valid"), 1, c
        ),
        in_axes=2,
        out_axes=2,
    )(img)
    img = jax.vmap(
        lambda c: jnp.apply_along_axis(
            lambda col: jnp.convolve(col, kernel, mode="valid"), 0, c
        ),
        in_axes=2,
        out_axes=2,
    )(img)
    return img


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """SSIM over one (H, W, C) image pair; returns scalar mean SSIM."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    kernel = _gaussian_kernel(win_size, sigma)
    mu_a = _filter2d_sep(a, kernel)
    mu_b = _filter2d_sep(b, kernel)
    mu_aa = _filter2d_sep(a * a, kernel)
    mu_bb = _filter2d_sep(b * b, kernel)
    mu_ab = _filter2d_sep(a * b, kernel)
    var_a = mu_aa - mu_a**2
    var_b = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
