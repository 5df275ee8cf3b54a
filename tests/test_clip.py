"""CLIP text encoder parity vs transformers.CLIPTextModel (tiny config,
shared weights). This is the reference's actual encoder
(train_unziplora.py:52-57), so agreement here validates the whole text
conditioning path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from video_style_transfer_tpu.config import CLIPConfig  # noqa: E402
from video_style_transfer_tpu.models.clip import (  # noqa: E402
    clip_apply, encode_sdxl_prompt, init_clip)

# EOS must be the highest id in any sequence: HF's legacy pooled
# branch (eos_token_id==2 in config) uses argmax(input_ids), which matches
# the real CLIP vocab where EOT=49407 is the max id.
EOS = 98


def _tiny_hf(with_projection=False, hidden_act="quick_gelu"):
    cfg = transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act=hidden_act,
        eos_token_id=EOS, bos_token_id=0, pad_token_id=1, projection_dim=8)
    cls = (transformers.CLIPTextModelWithProjection if with_projection
           else transformers.CLIPTextModel)
    torch.manual_seed(0)
    return cls(cfg).eval(), cfg


def _convert(hf_model, with_projection=False):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    pre = "text_model."
    n_layers = 2
    p = {
        "token_embedding": jnp.asarray(
            sd[pre + "embeddings.token_embedding.weight"]),
        "position_embedding": jnp.asarray(
            sd[pre + "embeddings.position_embedding.weight"]),
        "final_layer_norm": {
            "scale": jnp.asarray(sd[pre + "final_layer_norm.weight"]),
            "bias": jnp.asarray(sd[pre + "final_layer_norm.bias"])},
    }
    per_layer = []
    for i in range(n_layers):
        lp = {}
        base = f"{pre}encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            lp[ln] = {"scale": jnp.asarray(sd[base + ln + ".weight"]),
                      "bias": jnp.asarray(sd[base + ln + ".bias"])}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lp[proj] = {
                "kernel": jnp.asarray(sd[base + "self_attn." + proj
                                         + ".weight"].T),
                "bias": jnp.asarray(sd[base + "self_attn." + proj + ".bias"])}
        for fc in ("fc1", "fc2"):
            lp[fc] = {"kernel": jnp.asarray(sd[base + "mlp." + fc
                                               + ".weight"].T),
                      "bias": jnp.asarray(sd[base + "mlp." + fc + ".bias"])}
        per_layer.append(lp)
    p["layers"] = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    if with_projection:
        p["text_projection"] = {
            "kernel": jnp.asarray(sd["text_projection.weight"].T)}
    return p


def _my_cfg(hidden_act="quick_gelu", projection_dim=None):
    return CLIPConfig(vocab_size=99, hidden_size=16, intermediate_size=32,
                      num_layers=2, num_heads=2, hidden_act=hidden_act,
                      projection_dim=projection_dim)


IDS = np.array([[0, 5, 7, 9, EOS, 1, 1, 1],
                [0, 42, EOS, 1, 1, 1, 1, 1]], np.int32)


def test_hidden_state_parity():
    hf, _ = _tiny_hf()
    params = _convert(hf)
    cfg = _my_cfg()
    pen, last, _ = clip_apply(params, cfg, jnp.asarray(IDS),
                              eos_token_id=EOS)
    with torch.no_grad():
        out = hf(torch.from_numpy(IDS.astype(np.int64)),
                 output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(pen),
                               out.hidden_states[-2].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(last),
                               out.last_hidden_state.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_pooled_projection_parity():
    hf, _ = _tiny_hf(with_projection=True)
    params = _convert(hf, with_projection=True)
    cfg = _my_cfg(projection_dim=8)
    _, _, pooled = clip_apply(params, cfg, jnp.asarray(IDS),
                              eos_token_id=EOS)
    with torch.no_grad():
        out = hf(torch.from_numpy(IDS.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(pooled), out.text_embeds.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_gelu_act_parity():
    """The big OpenCLIP encoder uses plain gelu."""
    hf, _ = _tiny_hf(hidden_act="gelu")
    params = _convert(hf)
    cfg = _my_cfg(hidden_act="gelu")
    pen, _, _ = clip_apply(params, cfg, jnp.asarray(IDS), eos_token_id=EOS)
    with torch.no_grad():
        out = hf(torch.from_numpy(IDS.astype(np.int64)),
                 output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(pen),
                               out.hidden_states[-2].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_encode_sdxl_prompt_shapes():
    k = jax.random.PRNGKey(0)
    cfg_l = _my_cfg()
    cfg_g = _my_cfg(projection_dim=8)
    pl = init_clip(jax.random.PRNGKey(1), cfg_l)
    pg = init_clip(jax.random.PRNGKey(2), cfg_g)
    emb, pooled = encode_sdxl_prompt(pl, cfg_l, pg, cfg_g,
                                     jnp.asarray(IDS), jnp.asarray(IDS),
                                     eos_l=EOS, eos_g=EOS)
    assert emb.shape == (2, 8, 32)
    assert pooled.shape == (2, 8)
