"""Motion-weight bridge tests (utils/motion_convert.py).

The synthetic state dicts below are built by EXPLICIT string
construction from the diffusers MotionAdapter / UNetMotionModel
structure — independently of hf_convert's path-walk naming — so a
naming bug in either encoding fails these tests. Reference surfaces:
animatediff/utils.py:13-63 (load), :102-145 (save),
temporal_lora.py:169-192 (merged export)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.utils.motion_convert import (
    export_motion_state_dict, fold_temporal_lora, import_motion_state_dict,
    load_motion_checkpoint, reference_pe_table, save_motion_checkpoint)


def _tiny_cfg():
    return UNetConfig.tiny(use_motion_modules=True)


def _tiny_params(cfg=None, dtype=jnp.float32):
    cfg = cfg or _tiny_cfg()
    return cfg, init_unet(jax.random.PRNGKey(0), cfg, dtype=dtype)


def _module_keys(prefix, c, n_transformer, include_pe):
    """Keys+shapes of ONE diffusers motion module (AnimateDiffTransformer3D),
    written out longhand from the torch module structure."""
    out = {}

    def add(name, *shape):
        out[prefix + name] = shape

    add("norm.weight", c)
    add("norm.bias", c)
    add("proj_in.weight", c, c)
    add("proj_in.bias", c)
    for k in range(n_transformer):
        tb = f"transformer_blocks.{k}."
        for norm in ("norm1", "norm2", "norm3"):
            add(tb + norm + ".weight", c)
            add(tb + norm + ".bias", c)
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                add(tb + attn + f".{proj}.weight", c, c)  # bias-free
            add(tb + attn + ".to_out.0.weight", c, c)
            add(tb + attn + ".to_out.0.bias", c)
        add(tb + "ff.net.0.proj.weight", 8 * c, c)  # GEGLU: 2*4c rows
        add(tb + "ff.net.0.proj.bias", 8 * c)
        add(tb + "ff.net.2.weight", c, 4 * c)
        add(tb + "ff.net.2.bias", c)
        if include_pe:
            add(tb + "pos_embed.pe", 1, 32, c)
    add("proj_out.weight", c, c)
    add("proj_out.bias", c)
    return out


def synthetic_motion_sd(cfg, *, include_pe=False, seed=0):
    """Diffusers-naming motion state dict for the tiny UNet topology:
    layers_per_block modules per down block, layers_per_block+1 per up
    block, channels (forward | reversed), mid only if motion_mid_block."""
    shapes = {}
    ch = cfg.block_out_channels
    for i in range(len(cfg.down_block_types)):
        for j in range(cfg.layers_per_block):
            shapes.update(_module_keys(
                f"down_blocks.{i}.motion_modules.{j}.", ch[i],
                cfg.motion_transformer_layers_per_block, include_pe))
    if cfg.motion_mid_block:
        shapes.update(_module_keys(
            "mid_block.motion_modules.0.", ch[-1],
            cfg.motion_transformer_layers_per_block, include_pe))
    rev = list(reversed(ch))
    for i in range(len(cfg.up_block_types)):
        for j in range(cfg.layers_per_block + 1):
            shapes.update(_module_keys(
                f"up_blocks.{i}.motion_modules.{j}.", rev[i],
                cfg.motion_transformer_layers_per_block, include_pe))

    rng = np.random.RandomState(seed)
    sd = {}
    for k, shape in shapes.items():
        if k.endswith("pos_embed.pe"):
            sd[k] = reference_pe_table(shape[-1], shape[-2])
        else:
            sd[k] = rng.randn(*shape).astype(np.float32)
    return sd


def test_adapter_roundtrip_bitwise():
    """(MotionAdapter naming) -> pytree -> state dict is bitwise."""
    cfg, params = _tiny_params()
    sd = synthetic_motion_sd(cfg)
    filled = import_motion_state_dict(params, sd, dtype=jnp.float32)
    back = export_motion_state_dict(filled, include_pe=False)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_import_is_strict_on_missing_keys():
    cfg, params = _tiny_params()
    sd = synthetic_motion_sd(cfg)
    victim = [k for k in sd if k.endswith("attn2.to_k.weight")][0]
    del sd[victim]
    with pytest.raises(KeyError):
        import_motion_state_dict(params, sd)


def test_import_ignores_non_motion_keys_and_checks_pe():
    cfg, params = _tiny_params()
    sd = synthetic_motion_sd(cfg, include_pe=True)
    sd["conv_in.weight"] = np.zeros((4, 4, 3, 3), np.float32)  # spatial
    filled = import_motion_state_dict(params, sd)
    back = export_motion_state_dict(filled, include_pe=False)
    np.testing.assert_array_equal(
        back["down_blocks.0.motion_modules.0.proj_in.weight"],
        sd["down_blocks.0.motion_modules.0.proj_in.weight"])

    bad = dict(sd)
    pe_key = [k for k in bad if k.endswith("pos_embed.pe")][0]
    bad[pe_key] = np.ones_like(bad[pe_key])
    with pytest.raises(ValueError):
        import_motion_state_dict(params, bad)


def test_import_preserves_spatial_and_dtype():
    cfg, params = _tiny_params(dtype=jnp.bfloat16)
    sd = synthetic_motion_sd(cfg)
    filled = import_motion_state_dict(params, sd)
    # default dtype follows the tree's motion kernels
    assert filled["down_blocks"][0]["motion_modules"][0]["proj_in"][
        "kernel"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(filled["conv_in"]["kernel"], np.float32),
        np.asarray(params["conv_in"]["kernel"], np.float32))


def test_pth_roundtrip(tmp_path):
    """.pth save/load through torch (the reference's checkpoint I/O)."""
    cfg, params = _tiny_params()
    sd = synthetic_motion_sd(cfg, include_pe=True)
    path = str(tmp_path / "motion_modules.pth")
    save_motion_checkpoint(sd, path)
    loaded = load_motion_checkpoint(path)
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], sd[k])
    # directory form (reference _find_pth, animatediff/utils.py:56-63)
    loaded2 = load_motion_checkpoint(str(tmp_path))
    assert set(loaded2) == set(sd)


def test_export_pth_folds_tlora_and_emits_pe(tmp_path):
    from video_style_transfer_tpu.lora.surgery import insert_temporal_lora
    from video_style_transfer_tpu.utils.checkpoint import (
        export_motion_checkpoint)

    cfg, params = _tiny_params()
    params = insert_temporal_lora(params, jax.random.PRNGKey(1), rank=2)
    # give B nonzero values so folding visibly changes the kernel
    tl = params["down_blocks"][0]["motion_modules"][0][
        "transformer_blocks"]["attn1"]["to_q"]["tlora"]
    tl["b"] = jnp.ones_like(tl["b"]) * 0.5

    path = str(tmp_path / "motion_modules.pth")
    sd = export_motion_checkpoint(path, params)
    assert os.path.exists(path)
    loaded = load_motion_checkpoint(path)
    assert set(loaded) == set(sd)

    key = "down_blocks.0.motion_modules.0.transformer_blocks.0.attn1.to_q.weight"
    folded = fold_temporal_lora(params)
    want = np.asarray(folded["down_blocks"][0]["motion_modules"][0][
        "transformer_blocks"]["attn1"]["to_q"]["kernel"][0]).T
    np.testing.assert_allclose(loaded[key], want, rtol=1e-6, atol=1e-6)
    base = np.asarray(params["down_blocks"][0]["motion_modules"][0][
        "transformer_blocks"]["attn1"]["to_q"]["kernel"][0]).T
    assert np.abs(loaded[key] - base).max() > 0  # delta actually folded

    pe_keys = [k for k in loaded if k.endswith("pos_embed.pe")]
    assert pe_keys
    np.testing.assert_allclose(loaded[pe_keys[0]],
                               reference_pe_table(
                                   loaded[pe_keys[0]].shape[-1]),
                               rtol=1e-6, atol=1e-6)


def test_forward_changes_with_imported_weights():
    """Imported motion weights must actually flow through the UNet."""
    from video_style_transfer_tpu.models.unet import unet_apply

    cfg, params = _tiny_params()
    sd = synthetic_motion_sd(cfg, seed=3)
    sd = {k: v * 0.05 for k, v in sd.items()}
    filled = import_motion_state_dict(params, sd)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 4))
    ctx = (jnp.zeros((1, 7, cfg.cross_attention_dim)), None, None)
    pooled = jnp.zeros((1, 32))
    tids = jnp.zeros((1, 6))
    y0 = unet_apply(params, cfg, x, 5, ctx, pooled, tids, num_frames=4)
    y1 = unet_apply(filled, cfg, x, 5, ctx, pooled, tids, num_frames=4)
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-4


@pytest.mark.slow
@pytest.mark.e2e
def test_infer_video_accepts_pth(tmp_path):
    """cli/infer_video --motion_checkpoint <.pth> (VERDICT item 1b)."""
    cfg, params = _tiny_params()
    sd = export_motion_state_dict(params, include_pe=True)
    sd = {k: (v if k.endswith("pe") else v * 0.05) for k, v in sd.items()}
    path = str(tmp_path / "motion_modules.pth")
    save_motion_checkpoint(sd, path)

    from video_style_transfer_tpu.cli.infer_video import main as infer
    outs = infer(["--smoke", "--prompt", "a horse",
                  "--motion_checkpoint", path,
                  "--modes", "both",
                  "--output_dir", str(tmp_path / "videos")])
    assert len(outs) == 1 and os.path.getsize(outs[0]) > 0


@pytest.mark.slow
@pytest.mark.e2e
def test_train_animatediff_with_motion_adapter(tmp_path):
    """Stage-2 CLI starts from imported adapter weights and exports the
    reference's .pth format (VERDICT item 1c + reference
    load_unet_with_motion surface)."""
    from video_style_transfer_tpu.lora.interop import save_safetensors

    cfg, _ = _tiny_params()
    sd = {k: v * 0.05 for k, v in synthetic_motion_sd(cfg, seed=5).items()}
    adapter = str(tmp_path / "adapter.safetensors")
    save_safetensors(sd, adapter)

    from video_style_transfer_tpu.cli.train_animatediff import main
    main(["--smoke", "--smoke_steps", "1", "--prompt", "p",
          "--motion_adapter_path", adapter,
          "--output_dir", str(tmp_path / "out"),
          "--lr_warmup_steps", "1", "--checkpointing_steps", "50",
          "--checkpoint_format", "pth"])
    out = tmp_path / "out" / "motion_modules.pth"
    assert out.exists()
    loaded = load_motion_checkpoint(str(out))
    # trained checkpoint keys = adapter keys + pos_embed.pe buffers
    assert {k for k in loaded if not k.endswith("pos_embed.pe")} == set(sd)
