"""Checkpoint interop tests: HF-format round-trips and reference-format
LoRA artifact export/import (SURVEY.md §5 checkpoint row — formats must
interoperate both directions)."""
import numpy as np
import jax
import jax.numpy as jnp

from video_style_transfer_tpu.config import UNetConfig, VAEConfig
from video_style_transfer_tpu.lora import interop
from video_style_transfer_tpu.lora.surgery import (
    insert_unziplora, iter_spatial_attention_paths, tree_get)
from video_style_transfer_tpu.models.unet import init_unet, unet_apply
from video_style_transfer_tpu.models.vae import init_vae
from video_style_transfer_tpu.utils import hf_convert


def _zeros_like_tree(t):
    return jax.tree.map(lambda a: jnp.zeros_like(a), t)


def test_unet_state_dict_roundtrip():
    cfg = UNetConfig.tiny(use_motion_modules=False)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    sd = hf_convert.export_to_state_dict(params)
    # keys look like diffusers module names
    assert any(k.startswith("down_blocks.1.attentions.0.transformer_blocks"
                            ".0.attn1.to_q") for k in sd)
    assert any(k == "conv_in.weight" for k in sd)
    assert sd["conv_in.weight"].shape[1] == cfg.in_channels  # OIHW
    back = hf_convert.convert_to_pytree(sd, _zeros_like_tree(params))
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0,
                                   err_msg=str(p1))


def test_vae_state_dict_roundtrip():
    cfg = VAEConfig.tiny()
    params = init_vae(jax.random.PRNGKey(1), cfg)
    sd = hf_convert.export_to_state_dict(params)
    assert "encoder.conv_in.weight" in sd
    assert "quant_conv.weight" in sd
    assert "decoder.mid_block.attentions.0.to_q.weight" in sd
    back = hf_convert.convert_to_pytree(sd, _zeros_like_tree(params))
    chex = jax.tree.map(lambda a, b: np.allclose(a, b), params, back)
    assert all(jax.tree.leaves(chex))


def test_lora_artifact_roundtrip_and_inference_parity():
    """Export reference-format artifacts, re-import into a fresh base
    UNet, and check 'content'-mode forward parity (content mode uses only
    down/up + mask — exactly what the per-branch safetensors carry)."""
    cfg = UNetConfig.tiny()
    base = init_unet(jax.random.PRNGKey(0), cfg)
    params, state = insert_unziplora(base, jax.random.PRNGKey(1), rank=4)

    content_sd, merger_c = interop.export_state_dicts(params, state,
                                                      "content")
    style_sd, merger_s = interop.export_state_dicts(params, state, "style")
    assert content_sd and merger_c
    k = next(iter(content_sd))
    assert k.startswith("unet.") and k.endswith(".lora.up.weight")

    re_params, re_state = interop.import_state_dicts(
        base, content_sd, style_sd, merger_c, merger_s)

    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    sample = jax.random.normal(ks[0], (1, 16, 16, 4))
    t = jnp.array([3])
    emb = jax.random.normal(ks[1], (1, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (1, 32))
    tids = jnp.tile(jnp.array([[16, 16, 0, 0, 16, 16]]), (1, 1))

    out_orig = unet_apply(params, cfg, sample, t, (emb, None, None), pooled,
                          tids, mode="content", state=state)
    out_re = unet_apply(re_params, cfg, sample, t, (emb, None, None), pooled,
                        tids, mode="content", state=re_state)
    # without masks active the exported up folds the merger in; content
    # mode ignores mergers, so outputs match only when mergers are 1 —
    # they are at init
    np.testing.assert_allclose(np.asarray(out_re), np.asarray(out_orig),
                               rtol=1e-4, atol=1e-5)


def test_lora_export_folds_mask_when_active():
    cfg = UNetConfig.tiny()
    base = init_unet(jax.random.PRNGKey(0), cfg)
    params, state = insert_unziplora(base, jax.random.PRNGKey(1), rank=4)
    # activate masks on one stack
    path = next(iter_spatial_attention_paths(params)) + ("to_q",)
    st = tree_get(state, path)
    n_layers, out_f = st["mask_content"].shape
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(n_layers, out_f) > 0.5)
    from video_style_transfer_tpu.lora.surgery import tree_set
    state = tree_set(state, path + ("mask_content",), mask)
    state = tree_set(state, path + ("use_mask_content",),
                     jnp.ones((n_layers,), jnp.bool_))

    content_sd, _ = interop.export_state_dicts(params, state, "content")
    name = interop._module_name(path[:-1], "to_q", 0)
    up = content_sd[f"unet.{name}.lora.up.weight"]
    # masked columns of the exported up must be exactly zero
    zero_rows = np.asarray(~mask[0])
    assert np.all(up[zero_rows] == 0.0)
    lora = tree_get(params, path)["lora"]
    keep = np.asarray(mask[0])
    np.testing.assert_allclose(
        up[keep], np.asarray(lora["content"]["up"][0]).T[keep],
        rtol=1e-6)


def test_import_single_lora():
    """Plain single-LoRA loading (infer_single.sh path): one branch
    carries the adapter, content mode reproduces the exported math."""
    cfg = UNetConfig.tiny()
    base = init_unet(jax.random.PRNGKey(0), cfg)
    params, state = insert_unziplora(base, jax.random.PRNGKey(1), rank=4)
    content_sd, _ = interop.export_state_dicts(params, state, "content")

    re_params, re_state = interop.import_single_lora(base, content_sd,
                                                     branch="content")
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    sample = jax.random.normal(ks[0], (1, 16, 16, 4))
    t = jnp.array([3])
    emb = jax.random.normal(ks[1], (1, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[2], (1, 32))
    tids = jnp.tile(jnp.array([[16, 16, 0, 0, 16, 16]]), (1, 1))
    out_orig = unet_apply(params, cfg, sample, t, (emb, None, None), pooled,
                          tids, mode="content", state=state)
    out_re = unet_apply(re_params, cfg, sample, t, (emb, None, None),
                        pooled, tids, mode="content", state=re_state)
    np.testing.assert_allclose(np.asarray(out_re), np.asarray(out_orig),
                               rtol=1e-4, atol=1e-5)
    # style branch contributes nothing even in 'style' mode
    out_style = unet_apply(re_params, cfg, sample, t, (emb, None, None),
                           pooled, tids, mode="style", state=re_state)
    out_base = unet_apply(base, cfg, sample, t, (emb, None, None), pooled,
                          tids, mode="base")
    np.testing.assert_allclose(np.asarray(out_style), np.asarray(out_base),
                               rtol=1e-4, atol=1e-5)


def test_convert_strict_missing_keys():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    sd = hf_convert.export_to_state_dict(params)
    sd.pop("conv_in.weight")
    import pytest as _pytest
    with _pytest.raises(KeyError):
        hf_convert.convert_to_pytree(sd, _zeros_like_tree(params),
                                     strict=True)
    # non-strict fills what it can
    out = hf_convert.convert_to_pytree(sd, _zeros_like_tree(params),
                                       strict=False)
    assert float(jnp.sum(jnp.abs(out["conv_in"]["kernel"]))) == 0.0
    assert float(jnp.sum(jnp.abs(out["conv_out"]["kernel"]))) > 0.0


def test_load_sdxl_missing_dir(tmp_path):
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        hf_convert.load_sdxl(str(tmp_path))


def test_export_state_dicts_matches_export_weights():
    """Drift guard: interop.export_state_dicts re-implements the
    mask-or-merger gate fold of unzip.export_weights (reference
    get_unziplora_weight, unziplora_linear_layer.py:104-115); the two
    must stay numerically identical per layer."""
    import numpy as np
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora import interop
    from video_style_transfer_tpu.lora.surgery import (
        insert_unziplora, tree_get)
    from video_style_transfer_tpu.lora.unzip import export_weights
    from video_style_transfer_tpu.models.unet import init_unet

    cfg = UNetConfig.tiny()
    key = jax.random.PRNGKey(3)
    params, state = insert_unziplora(init_unet(key, cfg), key, rank=2)

    # flip one layer's mask filter on so both gate branches are covered
    first = next(iter(interop.iter_layer_modules(params)))
    path, proj, _, _ = first
    st_entry = tree_get(state, path + (proj,))
    st_entry["use_mask_content"] = st_entry["use_mask_content"].at[0].set(
        True)

    for branch in ("content", "style"):
        lora_sd, merger_sd = interop.export_state_dicts(
            params, state, branch)
        for path, proj, k, name in interop.iter_layer_modules(params):
            p = tree_get(params, path)[proj]
            if "lora" not in p:
                continue
            layer_params = jax.tree.map(lambda a: a[k], p["lora"])
            layer_state = jax.tree.map(
                lambda a: a[k], tree_get(state, path + (proj,)))
            down, up = export_weights(layer_params, layer_state, branch)
            np.testing.assert_allclose(
                lora_sd[f"unet.{name}.lora.down.weight"],
                np.asarray(down, np.float32), rtol=1e-6)
            np.testing.assert_allclose(
                lora_sd[f"unet.{name}.lora.up.weight"],
                np.asarray(up, np.float32), rtol=1e-6)
