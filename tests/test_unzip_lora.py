"""Golden-value tests for the UnZipLoRA layer math.

Oracles are independent numpy/torch implementations of the published
UnZipLoRA formulas (merge/mask gating, cone = W .* dW, top-k column
selection) in the reference's materialized-weight form; the framework uses
the factored rank-space form, so agreement here proves the refactor exact.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_style_transfer_tpu.lora import (
    apply_unzip_lora, cone_columns, cone_matrix, dual_linear,
    init_unzip_lora_params, init_unzip_lora_state, mergers_similarity,
    select_columns,
)

IN, OUT, R = 24, 40, 4


@pytest.fixture
def setup():
    key = jax.random.PRNGKey(0)
    params = init_unzip_lora_params(key, IN, OUT, rank=R)
    # randomize mergers away from the all-ones init so gating is visible
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(1), 4)
    params["merge_content"] = jax.random.uniform(k1, (OUT,))
    params["merge_style"] = jax.random.uniform(k2, (OUT,))
    state = init_unzip_lora_state(OUT)
    state["mask_content"] = jax.random.bernoulli(k3, 0.5, (OUT,))
    state["mask_style"] = jax.random.bernoulli(k4, 0.5, (OUT,))
    x_c = jax.random.normal(jax.random.PRNGKey(2), (3, 7, IN))
    x_s = jax.random.normal(jax.random.PRNGKey(3), (3, 7, IN))
    return params, state, x_c, x_s


def _np(t):
    return np.asarray(t, dtype=np.float64)


def oracle_forward(params, state, x_c, x_s, mode, use_mask):
    """Materialized-weight reference semantics
    (unziplora_linear_layer.py:221-263)."""
    p = {k: _np(v) for k, v in {
        "dc": params["content"]["down"], "uc": params["content"]["up"],
        "ds": params["style"]["down"], "us": params["style"]["up"],
        "mc": params["merge_content"], "ms": params["merge_style"],
    }.items()}
    mask_c = _np(state["mask_content"])
    mask_s = _np(state["mask_style"])
    x_c, x_s = _np(x_c), _np(x_s)
    wc = p["dc"] @ p["uc"]
    ws = p["ds"] @ p["us"]
    if mode == "both":
        wc = wc * p["mc"]
        ws = ws * p["ms"]
        if use_mask:
            wc = wc * mask_c
            ws = ws * mask_s
        return x_c @ wc + x_s @ ws
    if mode == "content":
        if use_mask:
            wc = wc * mask_c
        return x_c @ wc
    if mode == "style":
        if use_mask:
            ws = ws * mask_s
        return x_s @ ws
    raise ValueError(mode)


@pytest.mark.parametrize("mode", ["both", "content", "style"])
@pytest.mark.parametrize("use_mask", [False, True])
def test_forward_matches_materialized_oracle(setup, mode, use_mask):
    params, state, x_c, x_s = setup
    state = dict(state)
    state["use_mask_content"] = jnp.asarray(use_mask)
    state["use_mask_style"] = jnp.asarray(use_mask)
    got = apply_unzip_lora(params, x_c, x_s, mode=mode, state=state)
    want = oracle_forward(params, state, x_c, x_s, mode, use_mask)
    np.testing.assert_allclose(_np(got), want, rtol=1e-5, atol=1e-5)


def test_branch_gate_zeroes_branch(setup):
    """on_style=False must zero the style branch entirely (the inference
    block-separation semantics, unziplora_linear_layer.py:308-317)."""
    params, state, x_c, x_s = setup
    state = dict(state)
    state["on_style"] = jnp.asarray(False)
    got = apply_unzip_lora(params, x_c, x_s, mode="both", state=state)
    want = oracle_forward(params, state, x_c, jnp.zeros_like(x_s), "both",
                          False)
    np.testing.assert_allclose(_np(got), want, rtol=1e-5, atol=1e-5)


def test_dual_linear_adds_base(setup):
    params, state, x_c, _ = setup
    kernel = jax.random.normal(jax.random.PRNGKey(9), (IN, OUT)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(10), (OUT,)) * 0.1
    p = {"kernel": kernel, "bias": bias, "lora": params}
    y_base = dual_linear(p, x_c, mode="base")
    np.testing.assert_allclose(
        _np(y_base), _np(x_c) @ _np(kernel) + _np(bias), rtol=1e-5, atol=1e-5)
    y = dual_linear(p, x_c, mode="both", state=state)
    delta = apply_unzip_lora(params, x_c, x_c, mode="both", state=state)
    np.testing.assert_allclose(_np(y), _np(y_base) + _np(delta),
                               rtol=1e-5, atol=1e-5)


def test_mergers_similarity(setup):
    params, state, _, _ = setup
    plain = mergers_similarity(params, None)
    want = np.mean(np.abs(_np(params["merge_content"])
                          * _np(params["merge_style"])))
    np.testing.assert_allclose(float(plain), want, rtol=1e-6)

    state = dict(state)
    state["use_mask_content"] = jnp.asarray(True)
    state["use_mask_style"] = jnp.asarray(True)
    masked = mergers_similarity(params, state)
    want_masked = np.mean(np.abs(
        _np(params["merge_content"]) * _np(state["mask_content"])
        * _np(params["merge_style"]) * _np(state["mask_style"])))
    np.testing.assert_allclose(float(masked), want_masked, rtol=1e-6)


def test_cone_matches_product_rule_oracle(setup):
    """cone = W .* dW where the reference reconstructs dW from leaf grads by
    the product rule (unziplora_linear_layer.py:126-141):

        dW = (g_down @ up + down @ g_up) * merge + (down @ up) * g_merge

    (dW is the first-order change of the composed weight under a gradient
    step, not the true d(loss)/dW — we reproduce that exact quantity.)
    Leaf grads come from jax.grad through the factored forward; the oracle
    assembles the formula in float64 numpy.
    """
    params, _, x_c, x_s = setup

    def loss_fn(p):
        y = apply_unzip_lora(p, x_c, x_s, mode="both", state=None)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss_fn)(params)
    got = cone_matrix(params, grads, "content")

    down = _np(params["content"]["down"])
    up = _np(params["content"]["up"])
    g_down = _np(grads["content"]["down"])
    g_up = _np(grads["content"]["up"])
    m = _np(params["merge_content"])
    g_m = _np(grads["merge_content"])
    w = down @ up
    dw = (g_down @ up + down @ g_up) * m[None, :] + w * g_m[None, :]
    want = w * dw
    assert got.shape == (IN, OUT)
    np.testing.assert_allclose(_np(got), want, rtol=1e-4, atol=1e-7)


def test_cone_columns_sparsity(setup):
    params, _, x_c, x_s = setup

    def loss_fn(p):
        return jnp.sum(apply_unzip_lora(p, x_c, x_s, mode="both") ** 2)

    grads = jax.grad(loss_fn)(params)
    cols = cone_columns(params, grads, "style", threshold=1e-5)
    cone = _np(cone_matrix(params, grads, "style"))
    want = (np.abs(cone) > 1e-5).sum(axis=0) / cone.shape[0]
    np.testing.assert_allclose(_np(cols), want, rtol=1e-6)


def test_select_columns_topk_and_avoid():
    rng = np.random.RandomState(0)
    sc = jnp.asarray(rng.rand(OUT).astype(np.float32))
    ss = jnp.asarray(rng.rand(OUT).astype(np.float32))
    prev_c = jnp.zeros((OUT,), jnp.bool_)
    prev_s = jnp.zeros((OUT,), jnp.bool_)
    mc, ms = select_columns(sc, ss, prev_c, prev_s, ratio=0.25, avoid=True)
    k = int(OUT * 0.25)
    # content: strictly above its k-th largest score (reference uses >,
    # unziplora_linear_layer.py:196) -> k-1 columns
    thresh = np.sort(_np(sc))[::-1][k - 1]
    np.testing.assert_array_equal(_np(mc).astype(bool), _np(sc) > thresh)
    # avoid: no overlap
    assert not np.any(_np(mc).astype(bool) & _np(ms).astype(bool))
    # masks OR with previous
    prev_c2 = jnp.zeros((OUT,), jnp.bool_).at[0].set(True)
    mc2, _ = select_columns(sc, ss, prev_c2, prev_s, ratio=0.25, avoid=True)
    assert bool(mc2[0])


def test_factored_cost_shapes(setup):
    """The factored path never materializes an (IN, OUT) product in the
    forward — smoke-check by jaxpr inspection."""
    params, state, x_c, x_s = setup
    jaxpr = jax.make_jaxpr(
        lambda p, xc, xs: apply_unzip_lora(p, xc, xs, mode="both",
                                           state=state))(params, x_c, x_s)
    for eqn in jaxpr.jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            shape = eqn.outvars[0].aval.shape
            assert shape[-2:] != (IN, OUT), "materialized delta found"
