"""Parity against the ACTUAL reference implementation.

The mounted reference repo's core layer (unziplora_unet/
unziplora_linear_layer.py) imports only torch, so where the reference
tree is available we can load it as a golden oracle and check our
functional math against the real thing — forward in every mode/mask
configuration, and the cone formula against torch autograd leaf grads.
Skipped cleanly when the reference isn't mounted (these tests are an
extra guarantee on top of the standalone numpy oracles in
test_unzip_lora.py).
"""
import importlib.util
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference/unziplora_unet/unziplora_linear_layer.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference repo not mounted")

from video_style_transfer_tpu.lora.unzip import (  # noqa: E402
    apply_unzip_lora, cone_matrix, init_unzip_lora_state)

IN, OUT, R = 24, 40, 4


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_unzip", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_layer():
    mod = _load_ref()
    torch.manual_seed(0)
    layer = mod.UnZipLoRALinearLayer(IN, OUT, rank=R,
                                     lora_matrix_key=["content", "style"])
    with torch.no_grad():
        layer.merge_content.uniform_(0.1, 0.9)
        layer.merge_style.uniform_(0.1, 0.9)
    layer.mask_content = torch.rand(OUT) > 0.5
    layer.mask_style = torch.rand(OUT) > 0.5
    return layer


def _params_from_ref(layer):
    """torch layer weights -> our pytree (transposed orientations)."""
    g = lambda t: jnp.asarray(t.detach().numpy())  # noqa: E731
    return {
        "content": {
            "down": g(layer.lora_matrix_dic["content_down"].weight).T,
            "up": g(layer.lora_matrix_dic["content_up"].weight).T},
        "style": {
            "down": g(layer.lora_matrix_dic["style_down"].weight).T,
            "up": g(layer.lora_matrix_dic["style_up"].weight).T},
        "merge_content": g(layer.merge_content),
        "merge_style": g(layer.merge_style),
    }


def _state_from_ref(layer, use_mask):
    st = init_unzip_lora_state(OUT)
    st["mask_content"] = jnp.asarray(layer.mask_content.numpy())
    st["mask_style"] = jnp.asarray(layer.mask_style.numpy())
    st["use_mask_content"] = jnp.asarray(use_mask)
    st["use_mask_style"] = jnp.asarray(use_mask)
    return st


@pytest.mark.parametrize("mode", ["both", "content", "style"])
@pytest.mark.parametrize("use_mask", [False, True])
def test_forward_parity_vs_reference(ref_layer, mode, use_mask):
    layer = ref_layer
    layer.set_forward(mode)
    layer.set_layer_mask("content", use_mask)
    layer.set_layer_mask("style", use_mask)

    rng = np.random.RandomState(1)
    x_c = rng.randn(2, 7, IN).astype(np.float32)
    x_s = rng.randn(2, 7, IN).astype(np.float32)
    with torch.no_grad():
        want = layer(torch.from_numpy(x_c), torch.from_numpy(x_s)).numpy()

    params = _params_from_ref(layer)
    state = _state_from_ref(layer, use_mask)
    got = apply_unzip_lora(params, jnp.asarray(x_c), jnp.asarray(x_s),
                           mode=mode, state=state)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_cone_parity_vs_reference(ref_layer):
    """Same loss on both sides; cone = W .* dW via the reference's
    get_unziplora_cone must match our cone_matrix from the jax grads."""
    layer = ref_layer
    layer.set_forward("both")
    layer.set_layer_mask("content", False)
    layer.set_layer_mask("style", False)
    for p in layer.parameters():
        p.grad = None

    rng = np.random.RandomState(2)
    x = rng.randn(3, 5, IN).astype(np.float32)

    tx = torch.from_numpy(x)
    loss = (layer(tx, tx) ** 2).sum()
    loss.backward()
    layer.set_cone_score("content")   # zero the accumulator
    layer.get_unziplora_cone("content", accumulate=True)
    want = layer.column_score_content.detach().numpy()  # (IN, OUT) matrix

    params = _params_from_ref(layer)

    def loss_fn(p):
        y = apply_unzip_lora(p, jnp.asarray(x), jnp.asarray(x),
                             mode="both", state=None)
        return jnp.sum(y ** 2)

    grads = jax.grad(loss_fn)(params)
    got = cone_matrix(params, grads, "content")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
