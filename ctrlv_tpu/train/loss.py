"""EDM training loss + conditioning dropout (pure jnp).

Behavioral parity: /root/reference/tools/train_video_diffusion.py:463-531 —
uniform random index into the 1000-entry training sigma table, VE noising,
c_in scaling of the model input, v-prediction combined as
denoised = c_out*pred + c_skip*x_t, MSE against the clean latents with
weight (1+s^2)/s^2, per-sample mean then batch mean; InstructPix2Pix-style
conditioning dropout (:489-508): CLIP context zeroed when rp < 2p, VAE
conditioning zeroed when p <= rp < 3p.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion import edm_scalings, training_sigma_table


def sample_training_sigmas(
    rng: jax.Array, batch_size: int, sigmas_table: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform random sigma draws; returns (sigma (B,), c_noise timestep (B,))."""
    table = (
        sigmas_table if sigmas_table is not None else jnp.asarray(training_sigma_table())
    )
    idx = jax.random.randint(rng, (batch_size,), 0, table.shape[0])
    sigma = table[idx]
    return sigma, 0.25 * jnp.log(sigma)


def conditioning_dropout(
    rng: jax.Array,
    clip_emb: jnp.ndarray,  # (B, 1, D)
    cond_latents: jnp.ndarray,  # (B, F, h, w, 4)
    prob: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    batch = clip_emb.shape[0]
    rp = jax.random.uniform(rng, (batch,))
    drop_prompt = (rp < 2 * prob)[:, None, None]
    clip_emb = jnp.where(drop_prompt, 0.0, clip_emb)
    keep_image = 1.0 - ((rp >= prob) & (rp < 3 * prob)).astype(cond_latents.dtype)
    cond_latents = cond_latents * keep_image[:, None, None, None, None]
    return clip_emb, cond_latents


def edm_denoising_loss(
    model_pred: jnp.ndarray,  # (B, F, h, w, 4) v-prediction
    noisy_latents: jnp.ndarray,
    target_latents: jnp.ndarray,
    sigma: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    sigma5 = sigma[:, None, None, None, None]
    c_skip, c_out, weighting = edm_scalings(sigma5)
    denoised = model_pred.astype(jnp.float32) * c_out + c_skip * noisy_latents.astype(
        jnp.float32
    )
    sq = (denoised - target_latents.astype(jnp.float32)) ** 2
    per_sample = jnp.mean(
        (weighting * sq).reshape(target_latents.shape[0], -1), axis=1
    )
    return jnp.mean(per_sample)
