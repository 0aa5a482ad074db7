"""EDM / Euler-discrete scheduler for Stable Video Diffusion, TPU-native.

Re-implements (from behavioral spec, not code) the scheduler semantics the
reference relies on via diffusers' ``EulerDiscreteScheduler`` with SVD's
config (continuous timesteps, v-prediction, Karras sigmas):

- inference sigma schedule = Karras (rho=7) from sigma_max=700 to
  sigma_min=0.002 (reference usage: /root/reference/src/ctrlv/pipelines/
  pipeline_video_control.py:259-260, 295-343),
- timestep fed to the UNet is the EDM c_noise = 0.25*ln(sigma),
- ``scale_model_input`` = x / sqrt(sigma^2 + 1)  (EDM c_in),
- Euler step with v-prediction: pred_x0 = c_out*model_out + c_skip*x_t,
  c_out = -sigma/sqrt(sigma^2+1), c_skip = 1/(sigma^2+1)
  (training usage: /root/reference/tools/train_video_diffusion.py:521-531),
- training sigma table derived from the scaled-linear beta schedule
  (beta in [0.00085, 0.012], 1000 steps), descending
  (/root/reference/tools/train_video_diffusion.py:463-470).

Everything here is a pure function over a small, statically-shaped
``SchedulerState`` pytree so the whole denoise loop stays inside one
``jax.lax.scan`` under jit (no host round-trips per step).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def karras_sigmas(
    num_steps: int,
    sigma_min: float = 0.002,
    sigma_max: float = 700.0,
    rho: float = 7.0,
) -> np.ndarray:
    """Karras et al. (2022) noise schedule, descending, with terminal 0 appended.

    Returns ``num_steps + 1`` sigmas: [sigma_max, ..., sigma_min, 0.0].
    """
    ramp = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho
    return np.concatenate([sigmas, [0.0]]).astype(np.float32)


def training_sigma_table(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
) -> np.ndarray:
    """Sigma table for training, from the scaled-linear beta schedule.

    sigma_t = sqrt((1 - alpha_cumprod_t) / alpha_cumprod_t), returned in
    *descending* order (index 0 = noisiest), matching the reference's
    ``noise_scheduler.timesteps`` indexing for random-index draws.
    """
    betas = (
        np.linspace(
            beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
        )
        ** 2
    )
    alphas_cumprod = np.cumprod(1.0 - betas)
    sigmas = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)
    return sigmas[::-1].astype(np.float32)


def sigma_to_timestep(sigma: jnp.ndarray) -> jnp.ndarray:
    """EDM c_noise: the continuous 'timestep' the UNet is conditioned on."""
    return 0.25 * jnp.log(sigma)


def scale_model_input(sample: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """EDM c_in preconditioning: x / sqrt(sigma^2 + 1)."""
    return sample / jnp.sqrt(sigma**2 + 1.0)


def add_noise(
    sample: jnp.ndarray, noise: jnp.ndarray, sigma: jnp.ndarray
) -> jnp.ndarray:
    """Forward diffusion at noise level sigma (VE parameterization)."""
    sigma = jnp.asarray(sigma, dtype=sample.dtype)
    while sigma.ndim < sample.ndim:
        sigma = sigma[..., None]
    return sample + noise * sigma


def edm_scalings(sigma: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(c_skip, c_out, weighting) for v-prediction EDM training.

    denoised = c_out * model_out + c_skip * x_t ;  loss weight = (1+s^2)/s^2.
    """
    c_skip = 1.0 / (sigma**2 + 1.0)
    c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
    weighting = (1.0 + sigma**2) / sigma**2
    return c_skip, c_out, weighting


def euler_step(
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    sigma: jnp.ndarray,
    sigma_next: jnp.ndarray,
) -> jnp.ndarray:
    """One Euler step x_t -> x_{t-1} with v-prediction.

    pred_x0 = -sigma/sqrt(sigma^2+1) * model_out + x_t/(sigma^2+1)
    d       = (x_t - pred_x0) / sigma
    x_next  = x_t + d * (sigma_next - sigma)
    """
    c_skip, c_out, _ = edm_scalings(sigma)
    pred_original = model_output * c_out + sample * c_skip
    derivative = (sample - pred_original) / sigma
    return sample + derivative * (sigma_next - sigma)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SchedulerState:
    """Static sigma/timestep tables for one sampling run (pytree of arrays)."""

    sigmas: jnp.ndarray  # (num_steps + 1,) descending, terminal 0
    timesteps: jnp.ndarray  # (num_steps,) = 0.25*log(sigma)
    init_noise_sigma: jnp.ndarray  # scalar: sqrt(sigma_max^2 + 1)

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


@dataclasses.dataclass(frozen=True)
class EulerDiscreteScheduler:
    """Stateless scheduler factory mirroring SVD's EulerDiscreteScheduler config."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0
    prediction_type: str = "v_prediction"

    def set_timesteps(self, num_inference_steps: int) -> SchedulerState:
        sigmas = karras_sigmas(
            num_inference_steps, self.sigma_min, self.sigma_max, self.rho
        )
        timesteps = 0.25 * np.log(sigmas[:-1])
        init_noise_sigma = np.sqrt(sigmas[0] ** 2 + 1.0).astype(np.float32)
        return SchedulerState(
            sigmas=jnp.asarray(sigmas),
            timesteps=jnp.asarray(timesteps.astype(np.float32)),
            init_noise_sigma=jnp.asarray(init_noise_sigma),
        )

    def training_tables(self) -> Tuple[np.ndarray, np.ndarray]:
        """(sigmas, timesteps) over the full 1000-entry training schedule."""
        sigmas = training_sigma_table(
            self.num_train_timesteps, self.beta_start, self.beta_end
        )
        timesteps = (0.25 * np.log(sigmas)).astype(np.float32)
        return sigmas, timesteps

    # Convenience passthroughs (pure fns) -------------------------------
    scale_model_input = staticmethod(scale_model_input)
    add_noise = staticmethod(add_noise)
    step = staticmethod(euler_step)
