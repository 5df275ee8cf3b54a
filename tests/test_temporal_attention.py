"""Pixel-lanes temporal-attention kernel equivalence + gradients
(SURVEY.md §4 test plan item b). Interpreter mode on CPU; the same
kernel compiles for TPU (verified on hardware at the full motion
shapes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_style_transfer_tpu.ops.temporal_attention import (
    temporal_attention_frames)


def _mk(i, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(i), shape, dtype)


@pytest.mark.parametrize("f,p,n,h", [
    (16, 320, 256, 8),    # level-0 motion shape (D=40)
    (8, 640, 128, 8),     # level-1, training frame count (D=80)
    (4, 64, 384, 4),      # tiny-config shape, ragged n vs block
])
def test_matches_reference(f, p, n, h):
    qs = [_mk(3 * i + 0, (p, n)) for i in range(f)]
    ks = [_mk(3 * i + 1, (p, n)) for i in range(f)]
    vs = [_mk(3 * i + 2, (p, n)) for i in range(f)]
    got = temporal_attention_frames(qs, ks, vs, num_heads=h, block_n=128)
    want = temporal_attention_frames(qs, ks, vs, num_heads=h, impl="xla")
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=2e-4, atol=2e-5)


def test_per_pixel_independence():
    """Pixels must not mix: changing pixel j only changes outputs at j."""
    f, p, n, h = 4, 64, 128, 4
    qs = [_mk(i, (p, n)) for i in range(f)]
    ks = [_mk(10 + i, (p, n)) for i in range(f)]
    vs = [_mk(20 + i, (p, n)) for i in range(f)]
    base = temporal_attention_frames(qs, ks, vs, num_heads=h)
    ks2 = [k.at[:, 7].set(3.21) for k in ks]
    pert = temporal_attention_frames(qs, ks2, vs, num_heads=h)
    for b_, p_ in zip(base, pert):
        d = np.abs(np.asarray(b_) - np.asarray(p_))
        assert d[:, 7].max() > 0
        d[:, 7] = 0
        assert d.max() == 0


def test_head_independence():
    """Heads must not mix: per-head perturbation stays in its D rows."""
    f, p, n, h = 4, 128, 128, 4
    d = p // h
    qs = [_mk(i, (p, n)) for i in range(f)]
    ks = [_mk(10 + i, (p, n)) for i in range(f)]
    vs = [_mk(20 + i, (p, n)) for i in range(f)]
    base = temporal_attention_frames(qs, ks, vs, num_heads=h)
    vs2 = [v.at[d:2 * d].set(-v[d:2 * d]) for v in vs]
    pert = temporal_attention_frames(qs, ks, vs2, num_heads=h)
    for b_, p_ in zip(base, pert):
        diff = np.abs(np.asarray(b_) - np.asarray(p_))
        assert diff[d:2 * d].max() > 0
        diff[d:2 * d] = 0
        assert diff.max() == 0


def test_gradients_match_reference():
    f, p, n, h = 4, 64, 128, 4
    qs = [_mk(i, (p, n)) for i in range(f)]
    ks = [_mk(10 + i, (p, n)) for i in range(f)]
    vs = [_mk(20 + i, (p, n)) for i in range(f)]

    def loss(fn_impl):
        def go(qs_, ks_, vs_):
            out = temporal_attention_frames(qs_, ks_, vs_, num_heads=h,
                                            impl=fn_impl)
            return sum(jnp.sum(o ** 2) for o in out)
        return go

    g1 = jax.grad(loss("auto"), argnums=(0, 1, 2))(qs, ks, vs)
    g2 = jax.grad(loss("xla"), argnums=(0, 1, 2))(qs, ks, vs)
    for l1, l2 in zip(g1, g2):
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)


def test_bf16_io():
    f, p, n, h = 8, 320, 256, 8
    qs = [_mk(i, (p, n), jnp.bfloat16) for i in range(f)]
    ks = [_mk(10 + i, (p, n), jnp.bfloat16) for i in range(f)]
    vs = [_mk(20 + i, (p, n), jnp.bfloat16) for i in range(f)]
    got = temporal_attention_frames(qs, ks, vs, num_heads=h)
    want = temporal_attention_frames(qs, ks, vs, num_heads=h, impl="xla")
    for g_, w_ in zip(got, want):
        assert g_.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(g_, np.float32),
                                   np.asarray(w_, np.float32),
                                   rtol=3e-2, atol=3e-2)


def test_bwd_kernel_matches_xla_bwd_training_shape(monkeypatch):
    """Pallas backward vs the per-head XLA vjp fallback at the stage-2
    training shape (f=8, d=40), bf16 inputs."""
    f, p, n, h = 8, 320, 256, 8
    qs = [_mk(i, (p, n), jnp.bfloat16) for i in range(f)]
    ks = [_mk(10 + i, (p, n), jnp.bfloat16) for i in range(f)]
    vs = [_mk(20 + i, (p, n), jnp.bfloat16) for i in range(f)]

    def loss(qs_, ks_, vs_):
        out = temporal_attention_frames(qs_, ks_, vs_, num_heads=h)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out)

    g_kernel = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    monkeypatch.setenv("VST_TA_XLA_BWD", "1")
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(qs, ks, vs)
    for lk, lx in zip(g_kernel, g_xla):
        for a, b in zip(lk, lx):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=5e-2, atol=5e-2)


def test_vmem_budget_accounting_at_serving_f16():
    """Static accounting guard (VERDICT r2 weak #6): the 3F-in + F-out
    double-buffered block set at the F=16 serving instantiation must fit
    the kernel's declared vmem_limit_bytes — the Mosaic budget is only
    enforced at TPU compile time, so off-TPU this arithmetic is the
    regression signal for block_n/F/budget changes. Serving level-0
    shape: P=320 (8 heads x D=40), bf16, default block_n."""
    import inspect

    from video_style_transfer_tpu.ops import temporal_attention as ta

    src = inspect.getsource(ta._fwd_kernel_call)
    m = [int(s) for s in
         __import__("re").findall(r"vmem_limit_bytes=(\d+) \* 1024 \* 1024",
                                  src)]
    assert m, "vmem_limit_bytes literal not found in _fwd_kernel_call"
    budget = m[0] * 1024 * 1024

    f, heads, d = 16, 8, 40
    block_n = (inspect.signature(ta.temporal_attention_frames)
               .parameters["block_n"].default)
    itemsize = 2  # bf16 serving
    # per grid step: (3F in + F out) blocks of (d, block_n), double-
    # buffered by the pipeline
    blocks = (3 * f + f) * d * block_n * itemsize * 2
    # kernel f32 temps: stacked q/k/v heads-view + logits (f,f,n) + out
    temps = (3 * f * d * block_n + f * f * block_n + f * d * block_n) * 4
    assert blocks + temps <= budget, (
        f"F=16 serving instantiation needs ~{(blocks + temps) / 2**20:.0f}"
        f" MiB > declared {budget / 2**20:.0f} MiB vmem budget")


def test_kernel_compiles_interpret_at_serving_f16_bf16():
    """Full F=16 serving instantiation through the kernel path (bf16,
    default block specs) in interpret mode — entry() compiles at f=2 for
    watchdog reasons, so this is the off-TPU check that the F=16 kernel
    wiring itself stays sound."""
    f, p, n, h = 16, 320, 1024, 8
    qs = [_mk(3 * i + 0, (p, n), jnp.bfloat16) for i in range(f)]
    ks = [_mk(3 * i + 1, (p, n), jnp.bfloat16) for i in range(f)]
    vs = [_mk(3 * i + 2, (p, n), jnp.bfloat16) for i in range(f)]
    got = temporal_attention_frames(qs, ks, vs, num_heads=h)
    want = temporal_attention_frames(qs, ks, vs, num_heads=h, impl="xla")
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_, np.float32),
                                   np.asarray(w_, np.float32),
                                   rtol=2e-2, atol=2e-2)
