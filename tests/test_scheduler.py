"""Golden-value tests for the EDM/Euler scheduler.

Golden values are hand-derived from the published EDM / Karras formulas with
SVD's config (sigma in [0.002, 700], rho 7, scaled-linear betas 8.5e-4..1.2e-2).
"""

import jax.numpy as jnp
import numpy as np

from ctrlv_tpu.diffusion import (
    EulerDiscreteScheduler,
    add_noise,
    edm_scalings,
    euler_step,
    karras_sigmas,
    scale_model_input,
    training_sigma_table,
)


def test_karras_endpoints():
    s = karras_sigmas(25)
    assert s.shape == (26,)
    assert np.isclose(s[0], 700.0, rtol=1e-5)
    assert np.isclose(s[24], 0.002, rtol=1e-4)
    assert s[25] == 0.0
    assert np.all(np.diff(s) < 0)  # strictly decreasing


def test_karras_formula_midpoint():
    # ramp=0.5 for 3 steps -> sigma = ((700^(1/7) + 0.002^(1/7))/2)^7
    s = karras_sigmas(3)
    expected = ((700.0 ** (1 / 7) + 0.002 ** (1 / 7)) / 2) ** 7
    assert np.isclose(s[1], expected, rtol=1e-5)


def test_training_sigma_table():
    s = training_sigma_table()
    assert s.shape == (1000,)
    # index 0 = t=999 (noisiest). alpha_cumprod math checked at both ends.
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    acp = np.cumprod(1 - betas)
    assert np.isclose(s[0], np.sqrt((1 - acp[-1]) / acp[-1]), rtol=1e-5)
    assert np.isclose(s[-1], np.sqrt((1 - acp[0]) / acp[0]), rtol=1e-5)
    assert np.all(np.diff(s) < 0)


def test_scale_model_input():
    x = jnp.ones((2, 3))
    out = scale_model_input(x, jnp.asarray(700.0))
    assert np.allclose(out, 1.0 / np.sqrt(700.0**2 + 1), rtol=1e-6)


def test_add_noise_broadcast():
    x = jnp.zeros((2, 4, 4))
    n = jnp.ones((2, 4, 4))
    sig = jnp.asarray([1.0, 2.0])
    out = add_noise(x, n, sig)
    assert np.allclose(out[0], 1.0) and np.allclose(out[1], 2.0)


def test_euler_step_perfect_model_converges():
    """With a model that outputs the exact v-target, one Euler step to sigma=0
    recovers x0 exactly (EDM identity)."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
    sigma = jnp.asarray(5.0)
    x_t = x0 + sigma * noise
    # v-target: denoised = c_out*v + c_skip*x_t == x0  =>  v = (x0 - c_skip*x_t)/c_out
    c_skip, c_out, _ = edm_scalings(sigma)
    v = (x0 - c_skip * x_t) / c_out
    x_prev = euler_step(v, x_t, sigma, jnp.asarray(0.0))
    assert np.allclose(x_prev, x0, atol=1e-4)


def test_scheduler_state():
    sched = EulerDiscreteScheduler()
    state = sched.set_timesteps(30)
    assert state.num_steps == 30
    assert np.isclose(float(state.init_noise_sigma), np.sqrt(700.0**2 + 1), rtol=1e-6)
    # continuous timesteps are 0.25*log(sigma)
    assert np.allclose(state.timesteps, 0.25 * np.log(state.sigmas[:-1]), atol=1e-5)


def test_full_euler_sampling_linear_model():
    """Sanity: sampling with the ideal denoiser for a Gaussian-mixture of one
    point mass returns that point (probability-flow ODE collapses to x0)."""
    sched = EulerDiscreteScheduler()
    state = sched.set_timesteps(50)
    x0 = jnp.asarray(np.full((2, 3), 0.7, np.float32))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3)).astype(np.float32))
    x = x * state.init_noise_sigma
    for i in range(state.num_steps):
        sigma = state.sigmas[i]
        c_skip, c_out, _ = edm_scalings(sigma)
        x_in = scale_model_input(x, sigma)
        # ideal v so that denoised == x0 given current x
        v = (x0 - c_skip * x) / c_out
        x = euler_step(v, x, sigma, state.sigmas[i + 1])
    assert np.allclose(x, x0, atol=1e-3)
