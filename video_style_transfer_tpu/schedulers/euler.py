"""Euler discrete sampler (karras-style sigma formulation) as pure
functions designed for lax.scan denoise loops.

Reference usage: EulerDiscreteScheduler drives both stage-2 training noise
(train_animatediff.py:160) and video inference
(inference_animatediff.py:104-131); the SDXL pipeline default. Matches
diffusers' "leading" timestep spacing with steps_offset=1 and linear sigma
interpolation.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def euler_timetable(sched, num_inference_steps: int, *,
                    timestep_spacing: str = "leading", steps_offset: int = 1):
    """Host-side (static) table builder.

    Returns dict with:
      timesteps  (steps,)   float32 — UNet conditioning timesteps
      sigmas     (steps+1,) float32 — final entry 0
      init_sigma scalar              — multiply initial noise by this
    """
    t_max = sched["num_train_timesteps"]
    acp = np.asarray(sched["alphas_cumprod"], np.float64)
    sigmas_full = np.sqrt((1 - acp) / acp)

    if timestep_spacing == "leading":
        ratio = t_max // num_inference_steps
        timesteps = (np.arange(num_inference_steps) * ratio).round()[::-1]
        timesteps = timesteps.astype(np.float64) + steps_offset
    elif timestep_spacing == "linspace":
        timesteps = np.linspace(0, t_max - 1, num_inference_steps)[::-1]
    elif timestep_spacing == "trailing":
        ratio = t_max / num_inference_steps
        timesteps = np.arange(t_max, 0, -ratio).round() - 1
        timesteps = timesteps.astype(np.float64)
    else:
        raise ValueError(timestep_spacing)

    sigmas = np.interp(timesteps, np.arange(t_max), sigmas_full)
    sigmas = np.concatenate([sigmas, [0.0]])
    if timestep_spacing in ("linspace", "trailing"):
        init_sigma = sigmas.max()
    else:
        init_sigma = float((sigmas.max() ** 2 + 1) ** 0.5)
    return {
        "timesteps": jnp.asarray(timesteps, jnp.float32),
        "sigmas": jnp.asarray(sigmas, jnp.float32),
        "init_sigma": jnp.float32(init_sigma),
    }


def scale_model_input(sample, sigma):
    """Pre-conditioning for the sigma-parameterized UNet input:
    x / sqrt(sigma^2 + 1)."""
    return sample / jnp.sqrt(sigma.astype(jnp.float32) ** 2 + 1.0).astype(
        sample.dtype)


def euler_step(sample, model_output, sigma, sigma_next, *,
               prediction_type: str = "epsilon"):
    """One deterministic Euler step (s_churn = 0).

    sample is the *unscaled* latent; model_output came from the UNet fed
    with scale_model_input(sample, sigma).
    """
    sigma = sigma.astype(jnp.float32)
    sigma_next = sigma_next.astype(jnp.float32)
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    if prediction_type == "epsilon":
        denoised = x - sigma * eps
    elif prediction_type == "v_prediction":
        denoised = x / (sigma ** 2 + 1) - eps * sigma / jnp.sqrt(sigma ** 2 + 1)
    elif prediction_type == "sample":
        denoised = eps
    else:
        raise ValueError(prediction_type)
    derivative = (x - denoised) / sigma
    return (x + derivative * (sigma_next - sigma)).astype(sample.dtype)
