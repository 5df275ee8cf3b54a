"""Diffusion noise schedule + DDPM training utilities as pure functions.

Reference usage: DDPMScheduler for stage-1/2 add_noise
(train_unziplora.py:1262, unziplora_unet/train_animatediff.py:127) with the
SDXL scaled_linear schedule (beta 0.00085 -> 0.012, 1000 steps).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def make_schedule(num_train_timesteps: int = 1000,
                  beta_start: float = 0.00085, beta_end: float = 0.012,
                  beta_schedule: str = "scaled_linear"):
    """Returns a dict of device-constant tables (fp64 setup, fp32 tables)."""
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    else:
        raise ValueError(beta_schedule)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    # host numpy constants: timetable builders run numpy math on these, so
    # they must stay concrete even when make_schedule is called under jit
    return {
        "num_train_timesteps": num_train_timesteps,
        "betas": betas.astype(np.float32),
        "alphas_cumprod": alphas_cumprod.astype(np.float32),
    }


def add_noise(sched, x0, noise, t):
    """x_t = sqrt(acp_t) x0 + sqrt(1 - acp_t) eps.  t: (B,) int."""
    acp = jnp.asarray(sched["alphas_cumprod"])[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(shape).astype(x0.dtype)
    sqrt_1m = jnp.sqrt(1.0 - acp).reshape(shape).astype(x0.dtype)
    return sqrt_acp * x0 + sqrt_1m * noise


def velocity_target(sched, x0, noise, t):
    """v = sqrt(acp) eps - sqrt(1-acp) x0 (v-prediction branch,
    reference train_animatediff.py:288-295)."""
    # schedule tables are host numpy (CLAUDE.md invariant); index with a
    # device array so traced timesteps work under jit (add_noise does the
    # same)
    acp = jnp.asarray(sched["alphas_cumprod"])[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    sqrt_acp = jnp.sqrt(acp).reshape(shape).astype(x0.dtype)
    sqrt_1m = jnp.sqrt(1.0 - acp).reshape(shape).astype(x0.dtype)
    return sqrt_acp * noise - sqrt_1m * x0
