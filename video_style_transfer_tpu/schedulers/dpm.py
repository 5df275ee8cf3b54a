"""DPM-Solver++ (2M, midpoint) as pure scan-friendly functions.

Reference usage: DPMSolverMultistepScheduler for stage-1 validation
sampling (train_unziplora.py:1913). VP formulation: alpha_t = sqrt(acp),
sigma_t = sqrt(1-acp), lambda = log(alpha/sigma).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def dpm_timetable(sched, num_inference_steps: int, *,
                  timestep_spacing: str = "leading", steps_offset: int = 1,
                  final_sigma: str = "zero"):
    """Tables of shape (steps,) for conditioning timesteps and (steps+1,)
    for the solver's alpha/sigma/lambda trajectory.

    Conventions (pinned by tests/fixtures/scheduler_golden.json):
      - "leading" follows diffusers' DPMSolverMultistepScheduler, which
        divides by num_inference_steps + 1 (NOT num_inference_steps like
        EulerDiscrete): step_ratio = T // (steps+1), timesteps =
        (arange(steps+1) * ratio).round()[::-1][:-1] + steps_offset — so
        e.g. 30 steps over T=1000 conditions at 961..33, never reaching
        t=1.
      - final_sigma="zero" ends the trajectory at (alpha=1, sigma=0) so
        the last update returns the x0 prediction exactly (diffusers
        final_sigmas_type="zero", the modern default; the 0.25-era
        behavior — terminal sigma = sigma(t=0) — is final_sigma=
        "sigma_min").
    """
    t_max = sched["num_train_timesteps"]
    acp_full = np.asarray(sched["alphas_cumprod"], np.float64)

    if timestep_spacing == "leading":
        ratio = t_max // (num_inference_steps + 1)
        timesteps = (np.arange(num_inference_steps + 1)
                     * ratio).round()[::-1][:-1]
        timesteps = timesteps.astype(np.int64) + steps_offset
    elif timestep_spacing == "linspace":
        timesteps = np.linspace(0, t_max - 1, num_inference_steps + 1) \
            .round().astype(np.int64)[::-1][:-1]
    else:
        raise ValueError(timestep_spacing)

    acp = acp_full[np.clip(timesteps, 0, t_max - 1)]
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1 - acp)
    if final_sigma == "zero":
        # terminal point: clean sample
        alpha = np.concatenate([alpha, [1.0]])
        sigma = np.concatenate([sigma, [0.0]])
    elif final_sigma == "sigma_min":
        alpha = np.concatenate([alpha, [np.sqrt(acp_full[0])]])
        sigma = np.concatenate([sigma, [np.sqrt(1 - acp_full[0])]])
    else:
        raise ValueError(final_sigma)
    with np.errstate(divide="ignore"):
        lam = np.log(alpha) - np.log(np.maximum(sigma, 1e-30))
    return {
        "timesteps": jnp.asarray(timesteps, jnp.float32),
        "alpha": jnp.asarray(alpha, jnp.float32),
        "sigma": jnp.asarray(sigma, jnp.float32),
        "lambda": jnp.asarray(lam, jnp.float32),
    }


def to_x0(sample, model_output, alpha_t, sigma_t, *,
          prediction_type: str = "epsilon"):
    if prediction_type == "epsilon":
        return (sample - sigma_t * model_output) / alpha_t
    if prediction_type == "v_prediction":
        return alpha_t * sample - sigma_t * model_output
    if prediction_type == "sample":
        return model_output
    raise ValueError(prediction_type)


def dpm_step(sample, x0, carry, idx, table):
    """One DPM-Solver++ update from trajectory point idx -> idx+1.

    carry: (prev_x0, prev_lambda, have_prev) multistep memory.
    Returns (new_sample, new_carry). First step and the terminal step fall
    back to first order; otherwise 2M midpoint.
    """
    prev_x0, prev_lam, have_prev = carry
    x = sample.astype(jnp.float32)
    x0 = x0.astype(jnp.float32)

    lam_s, lam_t = table["lambda"][idx], table["lambda"][idx + 1]
    sig_s, sig_t = table["sigma"][idx], table["sigma"][idx + 1]
    alp_t = table["alpha"][idx + 1]
    terminal = sig_t <= 0.0

    h = lam_t - lam_s
    h_prev = lam_s - prev_lam
    r = h_prev / jnp.where(h == 0, 1.0, h)

    # second-order midpoint correction
    d1 = (x0 - prev_x0) / jnp.where(r == 0, 1.0, r)
    use_2m = jnp.logical_and(have_prev, jnp.logical_not(terminal))
    d = x0 + jnp.where(use_2m, 0.5, 0.0) * d1

    ratio = jnp.where(terminal, 0.0, sig_t / jnp.where(sig_s == 0, 1.0, sig_s))
    phi = jnp.where(terminal, -1.0, jnp.expm1(-h))
    new_x = ratio * x - alp_t * phi * d
    new_carry = (x0, lam_s, jnp.asarray(True))
    return new_x.astype(sample.dtype), new_carry


def dpm_init_carry(shape, dtype=jnp.float32):
    return (jnp.zeros(shape, jnp.float32), jnp.float32(0.0),
            jnp.asarray(False))
