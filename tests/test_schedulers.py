"""Scheduler math tests: closed-form checks and perfect-denoiser
roundtrips (a model that predicts the exact noise must walk the exact
trajectory back to x0)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_style_transfer_tpu.schedulers import (
    add_noise, dpm_step, dpm_timetable, euler_step, euler_timetable,
    make_schedule, scale_model_input, velocity_target)
from video_style_transfer_tpu.schedulers.dpm import dpm_init_carry, to_x0


def test_schedule_tables():
    s = make_schedule()
    betas = np.asarray(s["betas"])
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-5)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-5)
    acp = np.asarray(s["alphas_cumprod"])
    assert np.all(np.diff(acp) < 0) and acp[-1] > 0


def test_add_noise_closed_form():
    s = make_schedule()
    x0 = jnp.ones((2, 4, 4, 3))
    eps = jnp.full((2, 4, 4, 3), 0.5)
    t = jnp.array([10, 500])
    xt = add_noise(s, x0, eps, t)
    acp = np.asarray(s["alphas_cumprod"])[np.array([10, 500])]
    want = (np.sqrt(acp)[:, None, None, None] * 1.0
            + np.sqrt(1 - acp)[:, None, None, None] * 0.5)
    np.testing.assert_allclose(np.asarray(xt),
                               np.broadcast_to(want, xt.shape), rtol=1e-5)


def test_velocity_target_norm():
    """v^2 + x0-recovery identity: alpha*x_t - sigma*v = ... sanity via
    alpha^2+sigma^2=1 algebra."""
    s = make_schedule()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    t = jnp.array([100, 700])
    xt = add_noise(s, x0, eps, t)
    v = velocity_target(s, x0, eps, t)
    acp = s["alphas_cumprod"][t][:, None]
    a, b = jnp.sqrt(acp), jnp.sqrt(1 - acp)
    np.testing.assert_allclose(np.asarray(a * xt - b * v), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


def test_euler_leading_spacing():
    s = make_schedule()
    t = euler_timetable(s, 25)
    ts = np.asarray(t["timesteps"])
    assert ts.shape == (25,)
    assert ts[0] == 961.0 and ts[-1] == 1.0  # 1000//25=40 spacing, offset 1
    sig = np.asarray(t["sigmas"])
    assert sig.shape == (26,) and sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)
    np.testing.assert_allclose(float(t["init_sigma"]),
                               float((sig.max() ** 2 + 1) ** 0.5), rtol=1e-6)


def test_euler_perfect_denoiser_recovers_x0():
    """x_sigma = x0 + sigma*eps. A model that returns exactly eps should
    land on x0 after the full sigma schedule."""
    s = make_schedule()
    table = euler_timetable(s, 30)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 8, 8, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    x = x0 + table["sigmas"][0] * eps
    for i in range(30):
        # model input scaling must not affect the ideal-eps experiment
        _ = scale_model_input(x, table["sigmas"][i])
        x = euler_step(x, eps, table["sigmas"][i], table["sigmas"][i + 1])
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3,
                               atol=1e-4)


def test_dpm_perfect_denoiser_recovers_x0():
    """With exact eps the VP trajectory x_t = alpha_t x0 + sigma_t eps is
    reproduced exactly by DPM-Solver++ (its exponential integrator is exact
    for constant x0 prediction)."""
    s = make_schedule()
    steps = 20
    table = dpm_timetable(s, steps)
    key = jax.random.PRNGKey(2)
    x0 = jax.random.normal(key, (1, 6, 6, 4))
    eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    x = table["alpha"][0] * x0 + table["sigma"][0] * eps
    carry = dpm_init_carry(x.shape)
    for i in range(steps):
        pred_x0 = to_x0(x, eps, table["alpha"][i], table["sigma"][i])
        np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0),
                                   rtol=2e-2, atol=2e-3)
        x, carry = dpm_step(x, pred_x0, carry, i, table)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3,
                               atol=1e-4)


def test_euler_scan_compatible():
    """The sampler must run as a lax.scan body (static-shape check)."""
    s = make_schedule()
    table = euler_timetable(s, 10)
    x0 = jnp.ones((1, 4, 4, 4))
    eps = jnp.full_like(x0, 0.3)
    x_init = x0 + table["sigmas"][0] * eps

    def body(x, i):
        return euler_step(x, eps, table["sigmas"][i],
                          table["sigmas"][i + 1]), None

    x_final, _ = jax.lax.scan(body, x_init, jnp.arange(10))
    np.testing.assert_allclose(np.asarray(x_final), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


def test_rescale_noise_cfg_formula():
    """Guidance rescale (reference pipeline_stable_diffusion_xl.py:40-54):
    std-match the CFG noise to the text-conditioned noise, then lerp."""
    from video_style_transfer_tpu.pipelines.sampling import rescale_noise_cfg
    rng = np.random.RandomState(0)
    cfgn = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32)) * 2.0
    text = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    g = 0.7
    got = np.asarray(rescale_noise_cfg(cfgn, text, g))
    cn, tn = np.asarray(cfgn), np.asarray(text)
    std_t = tn.std(axis=(1, 2, 3), keepdims=True)
    std_c = cn.std(axis=(1, 2, 3), keepdims=True)
    want = g * (cn * std_t / std_c) + (1 - g) * cn
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_default_time_ids():
    from video_style_transfer_tpu.pipelines.image import default_time_ids
    ids = np.asarray(default_time_ids(1024, 768, 3))
    assert ids.shape == (3, 6)
    np.testing.assert_array_equal(ids[0], [1024, 768, 0, 0, 1024, 768])


def test_velocity_target_under_jit():
    """Regression: velocity_target indexed the host-numpy schedule table
    with a traced timestep (TracerArrayConversionError under jit — the
    v-prediction training branch could never run jitted)."""
    from video_style_transfer_tpu.schedulers.ddpm import (
        make_schedule, velocity_target)
    sched = make_schedule()

    @jax.jit
    def go(x0, noise, key):
        t = jax.random.randint(key, (x0.shape[0],), 0,
                               sched["num_train_timesteps"])
        return velocity_target(sched, x0, noise, t)

    x0 = jnp.ones((2, 4, 4, 4))
    v = go(x0, x0 * 0.5, jax.random.PRNGKey(0))
    assert v.shape == x0.shape
    assert bool(jnp.all(jnp.isfinite(v)))


# ---------------------------------------------------------------------------
# Golden fixtures (tests/fixtures/scheduler_golden.json, generated by
# tests/fixtures/gen_scheduler_golden.py — an independent stateful numpy
# re-derivation of the published Euler/DPM++(2M) algorithms with
# diffusers' table conventions). These pin every convention the verdict
# called out: leading spacing (and DPM-multistep's steps+1 ratio
# quirk), steps_offset, sigma interpolation, init_noise_sigma, model
# input scaling, first/final-step order handling.
# ---------------------------------------------------------------------------

import json
import os

_GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures",
                       "scheduler_golden.json")


def _golden():
    with open(_GOLDEN) as f:
        return json.load(f)


def _toy_eps(base, x_scaled):
    return base + 0.1 * jnp.tanh(x_scaled.mean())


@pytest.mark.parametrize("steps", [30, 50])
def test_euler_golden_tables(steps):
    g = _golden()["euler"][str(steps)]
    table = euler_timetable(make_schedule(), steps)
    np.testing.assert_array_equal(np.asarray(table["timesteps"]),
                                  np.float32(g["timesteps"]))
    np.testing.assert_allclose(np.asarray(table["sigmas"]),
                               np.asarray(g["sigmas"], np.float64),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(table["init_sigma"]),
                               g["init_noise_sigma"], rtol=2e-5)


@pytest.mark.parametrize("steps", [30, 50])
def test_euler_golden_trajectory(steps):
    g = _golden()["euler"][str(steps)]
    table = euler_timetable(make_schedule(), steps)
    base = np.random.RandomState(123).randn(steps, int(_golden()["dim"]))
    x = jnp.asarray(np.random.RandomState(7).randn(int(_golden()["dim"])),
                    jnp.float32) * table["init_sigma"]
    want = np.asarray(g["trajectory"])
    np.testing.assert_allclose(np.asarray(x), want[0], rtol=2e-5, atol=2e-5)
    for i in range(steps):
        xin = scale_model_input(x, table["sigmas"][i])
        eps = _toy_eps(jnp.asarray(base[i], jnp.float32), xin)
        x = euler_step(x, eps, table["sigmas"][i], table["sigmas"][i + 1])
        np.testing.assert_allclose(np.asarray(x), want[i + 1], rtol=5e-4,
                                   atol=5e-4,
                                   err_msg=f"euler step {i}/{steps}")


@pytest.mark.parametrize("steps", [30, 50])
def test_dpm_golden_tables(steps):
    g = _golden()["dpm"][str(steps)]
    table = dpm_timetable(make_schedule(), steps)
    np.testing.assert_array_equal(np.asarray(table["timesteps"]),
                                  np.float32(g["timesteps"]))
    # the golden stores Karras sigmas; the table stores the VP pair
    # (alpha, sigma) — convert: sigma_vp = karras / sqrt(karras^2+1)
    kar = np.asarray(g["sigmas"], np.float64)
    np.testing.assert_allclose(np.asarray(table["sigma"]),
                               kar / np.sqrt(kar ** 2 + 1), rtol=2e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(table["alpha"]),
                               1 / np.sqrt(kar ** 2 + 1), rtol=2e-5)


@pytest.mark.parametrize("steps", [30, 50])
def test_dpm_golden_trajectory(steps):
    g = _golden()["dpm"][str(steps)]
    table = dpm_timetable(make_schedule(), steps)
    base = np.random.RandomState(123).randn(steps, int(_golden()["dim"]))
    x = jnp.asarray(np.random.RandomState(7).randn(int(_golden()["dim"])),
                    jnp.float32)  # init_noise_sigma = 1
    want = np.asarray(g["trajectory"])
    carry = dpm_init_carry(x.shape)
    for i in range(steps):
        eps = _toy_eps(jnp.asarray(base[i], jnp.float32), x)
        x0 = to_x0(x, eps, table["alpha"][i], table["sigma"][i])
        x, carry = dpm_step(x, x0, carry, i, table)
        np.testing.assert_allclose(np.asarray(x), want[i + 1], rtol=5e-4,
                                   atol=5e-4,
                                   err_msg=f"dpm step {i}/{steps}")
