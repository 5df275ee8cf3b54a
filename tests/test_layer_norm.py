"""Fused LayerNorm kernel vs the XLA reference formula.
Interpreter mode on CPU; compiled + measured on TPU."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.ops.layer_norm import layer_norm, _reference


def _mk(shape, dtype, seed=0, shift=0.0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, shape, dtype) + jnp.asarray(shift, dtype)
    s = 1.0 + 0.1 * jax.random.normal(k2, (shape[-1],), jnp.float32)
    b = 0.1 * jax.random.normal(k3, (shape[-1],), jnp.float32)
    return x, s, b


@pytest.mark.parametrize("shape,dtype", [
    ((32, 128), jnp.float32),          # single row-block, tiled
    ((4, 64, 256), jnp.bfloat16),      # leading dims collapse, tiled
    ((520, 384), jnp.float32),         # grid with padded tail block
    ((10, 24), jnp.float32),           # fallback: rows%8, C%128
    ((8, 77, 768), jnp.float32),       # CLIP-ish shape (fallback rows)
])
def test_matches_reference(shape, dtype):
    x, s, b = _mk(shape, dtype)
    got = layer_norm(x, s, b)
    want = _reference(x, s, b, 1e-5)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-6 if dtype == jnp.float32 else 2e-2,
                               atol=2e-6 if dtype == jnp.float32 else 2e-2)


def test_large_offset_numerics():
    # mean^2 >> var: the two-pass in-kernel variance must not cancel
    x, s, b = _mk((16, 128), jnp.float32, seed=3, shift=100.0)
    x = x * 0.01 + 100.0
    got = layer_norm(x, s, b)
    # vs the f32 XLA reference: same two-pass algorithm, must agree to
    # f32 roundoff of the shared statistics
    ref32 = _reference(x, s, b, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref32),
                               rtol=2e-3, atol=2e-3)
    # vs float64: bounded by the inherent f32 mean rounding at this
    # scale (eps_f32 * mean / std ~ 1e-3 in normalized units), NOT by
    # a catastrophic E[x^2]-E[x]^2 cancellation (which would be O(1))
    x64 = np.asarray(x, np.float64)
    m = x64.mean(-1, keepdims=True)
    v = ((x64 - m) ** 2).mean(-1, keepdims=True)
    want = (x64 - m) / np.sqrt(v + 1e-5) * np.asarray(s, np.float64) \
        + np.asarray(b, np.float64)
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               atol=5e-3)


def test_eps_threading():
    x, s, b = _mk((16, 128), jnp.float32, seed=4)
    got = layer_norm(x, s, b, eps=1e-3)
    want = _reference(x, s, b, 1e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_gradients_match_reference():
    x, s, b = _mk((32, 128), jnp.float32, seed=5)
    g1 = jax.grad(lambda *a: jnp.sum(layer_norm(*a) ** 2),
                  argnums=(0, 1, 2))(x, s, b)
    g2 = jax.grad(lambda *a: jnp.sum(_reference(*a, 1e-5) ** 2),
                  argnums=(0, 1, 2))(x, s, b)
    for a, w in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w),
                                   rtol=1e-5, atol=1e-5)


def test_layers_entrypoint_matches():
    # layers.layer_norm deliberately keeps the XLA formula (the kernel
    # measured slower e2e — see ops/layer_norm.py docstring); it must
    # still agree with the op's reference for tiled + fallback shapes
    for shape in ((32, 128), (5, 24)):
        x, s, b = _mk(shape, jnp.float32, seed=6)
        p = {"scale": s, "bias": b}
        got = layers.layer_norm(p, x)
        want = _reference(x, s, b, 1e-5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-6, atol=2e-6)
