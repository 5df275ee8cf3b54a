"""Blockwise 8-bit AdamW (training/adam8bit.py) — the TPU-native
equivalent of the reference's bitsandbytes --use_8bit_adam option
(train_unziplora.py:1615-1626)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from video_style_transfer_tpu.training.adam8bit import (
    BLOCK, _deq, _quantize, adamw8bit, scale_by_adam8bit)


def test_quantize_roundtrip_error_bound():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 1000)) * 0.01
    back = _deq(_quantize(x), x.shape)
    # symmetric linear absmax: error <= absmax/127/2 per block
    b = np.asarray(x.reshape(-1))
    pad = np.pad(b, (0, -len(b) % BLOCK)).reshape(-1, BLOCK)
    bound = np.abs(pad).max(axis=1) / 127.0 / 2.0 + 1e-12
    err = np.abs(np.asarray(back).reshape(-1) - b)
    err_pad = np.pad(err, (0, -len(err) % BLOCK)).reshape(-1, BLOCK)
    assert (err_pad.max(axis=1) <= bound * 1.001).all()


def test_zero_blocks_stay_zero():
    x = jnp.zeros((2, BLOCK))
    st = _quantize(x)
    assert np.asarray(_deq(st, x.shape)).max() == 0.0


def test_small_leaves_exact_fp32():
    """Leaves under min_8bit_size must match optax.adam exactly."""
    params = {"w": jnp.ones((8, 8))}
    g = {"w": jnp.full((8, 8), 0.3)}
    tx8 = scale_by_adam8bit(min_8bit_size=4096)
    txf = optax.scale_by_adam()
    s8, sf = tx8.init(params), txf.init(params)
    p8, pf = params, params
    for _ in range(5):
        u8, s8 = tx8.update(g, s8, p8)
        uf, sf = txf.update(g, sf, pf)
        np.testing.assert_allclose(np.asarray(u8["w"]),
                                   np.asarray(uf["w"]), rtol=1e-6)


def test_update_close_to_fp32_adam():
    """Quantized path stays within a few absmax quanta of exact Adam."""
    key = jax.random.PRNGKey(1)
    n = BLOCK * 8
    params = {"w": jax.random.normal(key, (n,))}
    tx8 = scale_by_adam8bit(min_8bit_size=1)
    txf = optax.scale_by_adam()
    s8, sf = tx8.init(params), txf.init(params)
    for i in range(10):
        g = {"w": jax.random.normal(jax.random.PRNGKey(i + 2), (n,))}
        u8, s8 = tx8.update(g, s8, params)
        uf, sf = txf.update(g, sf, params)
        # normalized Adam updates are O(1). Blockwise absmax gives small
        # typical error but elements tiny relative to their block's
        # absmax can deviate more (bnb's linear mode shares this):
        # bound the mean tightly, the worst element loosely.
        err = np.abs(np.asarray(u8["w"]) - np.asarray(uf["w"]))
        assert err.mean() < 0.01, (i, err.mean())
        assert err.max() < 0.2, (i, err.max())


def test_converges_on_quadratic_like_fp32():
    """End-to-end convergence parity: min ||x - target||^2."""
    target = jax.random.normal(jax.random.PRNGKey(3), (BLOCK * 4,))

    def run(tx):
        x = jnp.zeros_like(target)
        st = tx.init(x)
        for _ in range(300):
            g = 2 * (x - target)
            u, st = tx.update(g, st, x)
            x = optax.apply_updates(x, u)
        return float(jnp.mean((x - target) ** 2))

    l8 = run(adamw8bit(1e-1, weight_decay=0.0, min_8bit_size=1))
    lf = run(optax.adamw(1e-1, weight_decay=0.0))
    assert l8 < 1e-3, l8
    assert l8 < max(lf * 10, 1e-4)


def test_state_is_int8():
    params = {"w": jnp.ones((BLOCK * 4,))}
    tx = scale_by_adam8bit(min_8bit_size=1)
    st = tx.init(params)
    g = {"w": jnp.ones((BLOCK * 4,)) * 0.1}
    _, st = tx.update(g, st, params)
    assert st.m["w"]["q"].dtype == jnp.int8
    # v's sqrt is non-negative on a log-spaced unsigned code
    assert st.v["w"]["q"].dtype == jnp.uint8
    assert st.m["w"]["s"].dtype == jnp.float32
    # storage: 1 byte + 4/BLOCK per element per moment
    bytes_q = st.m["w"]["q"].size + st.m["w"]["s"].size * 4
    assert bytes_q < params["w"].size * 4 / 3.5


def test_jit_and_grad_accum_compatible():
    """The transform works under jit with a padded (non-multiple) leaf."""
    params = {"w": jnp.ones((BLOCK + 7,))}
    tx = adamw8bit(1e-3, min_8bit_size=1)
    st = tx.init(params)

    @jax.jit
    def step(p, s):
        g = jax.tree.map(lambda x: 0.1 * x, p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    p, st = step(params, st)
    p, st = step(p, st)
    assert np.isfinite(np.asarray(p["w"])).all()


def test_sqrtv_log_code_roundtrip():
    """The v code has ~2.3% max relative error across 5 decades of
    sqrt(v) within one block, and exact zero survives."""
    from video_style_transfer_tpu.training.adam8bit import (
        _deq_sqrtv, _quantize_sqrtv)
    x = jnp.concatenate([
        jnp.zeros((8,)),
        jnp.logspace(-5, 0, BLOCK - 8)]).reshape(1, BLOCK)
    back = np.asarray(_deq_sqrtv(_quantize_sqrtv(x), x.shape))
    xb = np.asarray(x)
    assert (back[xb == 0] == 0).all()
    nz = xb > 0
    rel = np.abs(back[nz] - xb[nz]) / xb[nz]
    assert rel.max() < 0.025, rel.max()


def test_no_zero_collapse_in_outlier_block():
    """Regression: a coordinate with tiny v sharing a block with a v
    outlier must NOT have its second-moment history erased (the old
    linear absmax code rounded sqrt(v)=1e-5 in a block whose max was
    1e-2 to exactly 0, letting a retained first moment divide by ~eps —
    a ~1000x over-step vs exact Adam)."""
    tx8 = scale_by_adam8bit(min_8bit_size=1)
    txf = optax.scale_by_adam()
    n = BLOCK
    params = jnp.zeros((n,))
    s8, sf = tx8.init(params), txf.init(params)
    # build history: coordinate 0 sees large grads (the block outlier),
    # coordinate 1 sees small-but-real grads, then both go near-silent
    for i in range(20):
        g = jnp.zeros((n,)).at[0].set(1.0).at[1].set(1e-4)
        u8, s8 = tx8.update(g, s8, params)
        uf, sf = txf.update(g, sf, params)
    g = jnp.zeros((n,)).at[1].set(1e-7)  # momentum remains, v history must not vanish
    u8, s8 = tx8.update(g, s8, params)
    uf, sf = txf.update(g, sf, params)
    exact = float(np.abs(np.asarray(uf)[1]))
    got = float(np.abs(np.asarray(u8)[1]))
    assert got < exact * 2.0 + 1e-12, (got, exact, got / max(exact, 1e-30))
