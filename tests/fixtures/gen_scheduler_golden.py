"""Generate scheduler golden fixtures (scheduler_golden.json).

Independent, stateful numpy re-derivations of the two samplers the
reference drives through diffusers (EulerDiscreteScheduler:
train_animatediff.py:160 and the SDXL pipeline default
pipeline_stable_diffusion_xl.py:564-626; DPMSolverMultistepScheduler:
train_unziplora.py:1913), written from the published algorithms — Karras
et al. 2022 Algorithm 1 (Euler, s_churn=0) and Lu et al. 2022
DPM-Solver++(2M) — with diffusers' table conventions spelled out
longhand. These classes deliberately mirror diffusers' *stateful* step
loop (step_index, multistep model-output memory) rather than the repo's
scan-form pure functions, so the golden trajectories are derived through
a different code structure than the implementation under test.

Conventions pinned here:
  - scaled_linear betas 0.00085..0.012, T=1000 (SDXL), fp64 setup.
  - Euler "leading": step_ratio = T // steps, timesteps =
    (arange(steps)*ratio).round()[::-1] + steps_offset(=1); sigmas
    linearly interpolated from sqrt((1-acp)/acp); terminal sigma 0;
    init_noise_sigma = sqrt(sigma_max^2 + 1); model input scaled by
    1/sqrt(sigma^2+1).
  - DPM++ 2M "leading": step_ratio = T // (steps + 1) — the multistep
    scheduler's off-by-one convention, distinct from Euler's — with
    timesteps = (arange(steps+1)*ratio).round()[::-1][:-1] + 1;
    init_noise_sigma = 1; first step first-order; final step first-order
    with terminal sigma 0 (final_sigmas_type="zero") so the last update
    returns the x0 prediction.

The toy denoiser couples weakly to the (scaled) sample so the trajectory
exercises input scaling and the 2M history without letting fp drift
between the fp64 golden and the fp32 implementation blow up.

Run: python tests/fixtures/gen_scheduler_golden.py
"""
import json
import os

import numpy as np

T = 1000
STEPS = (30, 50)
DIM = 8


def schedule():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, T,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def toy_eps(base, x_scaled):
    """Deterministic pseudo-denoiser: a fixed per-step draw plus a weak
    scalar coupling to the scaled model input."""
    return base + 0.1 * np.tanh(x_scaled.mean())


class EulerRef:
    """EulerDiscreteScheduler, leading spacing, steps_offset=1,
    interpolation_type='linear', s_churn=0, epsilon prediction."""

    def __init__(self, acp, steps):
        ratio = T // steps
        self.timesteps = ((np.arange(steps) * ratio).round()[::-1]
                          .astype(np.float64) + 1)
        sigmas_full = np.sqrt((1 - acp) / acp)
        sig = np.interp(self.timesteps, np.arange(T), sigmas_full)
        self.sigmas = np.concatenate([sig, [0.0]])
        self.init_noise_sigma = float(np.sqrt(self.sigmas.max() ** 2 + 1))

    def scale_model_input(self, x, i):
        return x / np.sqrt(self.sigmas[i] ** 2 + 1.0)

    def step(self, i, x, eps):
        sigma = self.sigmas[i]
        denoised = x - sigma * eps
        derivative = (x - denoised) / sigma
        return x + derivative * (self.sigmas[i + 1] - sigma)


class DPMRef:
    """DPMSolverMultistepScheduler: algorithm_type='dpmsolver++',
    solver_order=2, leading spacing with the (steps+1) ratio, epsilon
    prediction, final_sigmas_type='zero' (forces a first-order final
    update). Karras-sigma table; alpha_t = 1/sqrt(sigma^2+1)."""

    def __init__(self, acp, steps):
        ratio = T // (steps + 1)
        self.timesteps = ((np.arange(steps + 1) * ratio).round()[::-1][:-1]
                          .astype(np.int64) + 1)
        sigmas_full = np.sqrt((1 - acp) / acp)
        sig = np.interp(self.timesteps, np.arange(T), sigmas_full)
        self.sigmas = np.concatenate([sig, [0.0]])
        self.init_noise_sigma = 1.0
        self.prev = None  # (x0, lambda) multistep memory
        self.steps = steps

    @staticmethod
    def _alpha_sigma(s):
        alpha = 1.0 / np.sqrt(s * s + 1.0)
        return alpha, s * alpha

    def step(self, i, x, eps):
        a_s, s_s = self._alpha_sigma(self.sigmas[i])
        x0 = (x - s_s * eps) / a_s
        a_t, s_t = self._alpha_sigma(self.sigmas[i + 1])
        final = i == self.steps - 1
        if final:  # terminal sigma 0: x_{t-1} = x0 (first order, h=inf)
            new_x = x0
        else:
            lam_s = np.log(a_s) - np.log(s_s)
            lam_t = np.log(a_t) - np.log(s_t)
            h = lam_t - lam_s
            if self.prev is None:  # first step: first order
                d = x0
            else:  # 2M midpoint
                prev_x0, lam_s1 = self.prev
                r = (lam_s - lam_s1) / h
                d = x0 + 0.5 * (x0 - prev_x0) / r
            new_x = (s_t / s_s) * x - a_t * np.expm1(-h) * d
        if not final:
            lam_s = np.log(a_s) - np.log(s_s)
            self.prev = (x0, lam_s)
        return new_x


def run(ref_cls, acp, steps, scale_input):
    ref = ref_cls(acp, steps)
    rng = np.random.RandomState(123)
    base = rng.randn(steps, DIM)
    x = np.random.RandomState(7).randn(DIM) * ref.init_noise_sigma
    traj = [x.copy()]
    for i in range(steps):
        xin = ref.scale_model_input(x, i) if scale_input else x
        eps = toy_eps(base[i], xin)
        x = ref.step(i, x, eps)
        traj.append(x.copy())
    return {
        "timesteps": ref.timesteps.tolist(),
        "sigmas": ref.sigmas.tolist(),
        "init_noise_sigma": ref.init_noise_sigma,
        "trajectory": np.asarray(traj).tolist(),
    }


def main():
    acp = schedule()
    out = {"dim": DIM, "euler": {}, "dpm": {}}
    for steps in STEPS:
        out["euler"][str(steps)] = run(EulerRef, acp, steps, True)
        out["dpm"][str(steps)] = run(DPMRef, acp, steps, False)
    path = os.path.join(os.path.dirname(__file__), "scheduler_golden.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
