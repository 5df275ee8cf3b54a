"""VAE shape tests + LoRA surgery tests on the tiny UNet."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp

from video_style_transfer_tpu.config import UNetConfig, VAEConfig
from video_style_transfer_tpu.lora.surgery import (
    expand_block_patterns, insert_temporal_lora, insert_unziplora,
    iter_motion_attention_paths, iter_spatial_attention_paths,
    layer_assignments, spatial_pairs, tree_get)
from video_style_transfer_tpu.models.unet import init_unet, unet_apply
from video_style_transfer_tpu.models.vae import (
    init_vae, vae_decode, vae_encode, vae_encode_moments)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    params = init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    mean, logvar = vae_encode_moments(params, cfg, x)
    assert mean.shape == (2, 8, 8, 4)  # two blocks -> one downsample
    z = vae_encode(params, cfg, x, key=jax.random.PRNGKey(2))
    assert z.shape == mean.shape
    y = vae_decode(params, cfg, z)
    assert y.shape == x.shape
    assert jnp.all(jnp.isfinite(y))


def test_vae_deterministic_encode():
    cfg = VAEConfig.tiny()
    params = init_vae(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    z1 = vae_encode(params, cfg, x)  # mean mode
    z2 = vae_encode(params, cfg, x)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def _tiny_unet():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, b=1, res=16):
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    sample = jax.random.normal(ks[0], (b, res, res, cfg.in_channels))
    t = jnp.array([3] * b)
    emb = jax.random.normal(ks[1], (b, 7, cfg.cross_attention_dim))
    emb_c = jax.random.normal(ks[2], (b, 7, cfg.cross_attention_dim))
    emb_s = jax.random.normal(ks[3], (b, 7, cfg.cross_attention_dim))
    pooled = jax.random.normal(ks[4], (b, 32))
    tids = jnp.tile(jnp.array([[16, 16, 0, 0, 16, 16]]), (b, 1))
    return sample, t, (emb, emb_c, emb_s), pooled, tids


def test_insert_unziplora_counts():
    cfg, params = _tiny_unet()
    spatial = list(iter_spatial_attention_paths(params))
    # tiny: 1 cross down attn group + mid group + 2 cross up groups,
    # each yielding one stacked attn1 + attn2 path
    assert len(spatial) == (1 + 1 + 2) * 2
    new, state = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    for p in spatial:
        attn = tree_get(new, p)
        for proj in ("to_q", "to_k", "to_v", "to_out"):
            assert "lora" in attn[proj]
            # stacked leaves: (n_layers, in, rank)
            down = attn[proj]["lora"]["content"]["down"]
            assert down.ndim == 3 and down.shape[-1] == 4
            st = tree_get(state, p + (proj,))
            assert st["mask_content"].shape == (down.shape[0],
                                                attn[proj]["kernel"].shape[-1])


def test_modes_change_output_and_base_preserved():
    cfg, params = _tiny_unet()
    sample, t, ctx, pooled, tids = _inputs(cfg)
    base_out = unet_apply(params, cfg, sample, t, ctx, pooled, tids,
                          mode="base")
    new, state = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    # base mode ignores lora entirely
    out_base = unet_apply(new, cfg, sample, t, ctx, pooled, tids,
                          mode="base")
    np.testing.assert_allclose(np.asarray(out_base), np.asarray(base_out),
                               atol=1e-6)
    outs = {m: np.asarray(unet_apply(new, cfg, sample, t, ctx, pooled, tids,
                                     mode=m, state=state))
            for m in ("both", "content", "style")}
    assert not np.allclose(outs["both"], outs["content"])
    assert not np.allclose(outs["content"], outs["style"])
    assert not np.allclose(np.asarray(base_out), outs["both"])


def test_temporal_lora_zero_at_init():
    """B=0 init => motion output unchanged at step 0 (reference
    temporal_lora.py:27)."""
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    sample, t, ctx, pooled, tids = _inputs(cfg)
    f = 2
    video = jnp.tile(sample, (f, 1, 1, 1))
    out0 = unet_apply(params, cfg, video, t, ctx, pooled, tids,
                      mode="base", num_frames=f)
    with_tl = insert_temporal_lora(params, jax.random.PRNGKey(3), rank=4)
    out1 = unet_apply(with_tl, cfg, video, t, ctx, pooled, tids,
                      mode="base", num_frames=f)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


def test_spatial_pairs():
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, _ = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    params = insert_temporal_lora(params, jax.random.PRNGKey(2), rank=4)
    pairs = spatial_pairs(params)
    assert pairs, "no temporal<->spatial pairs found"
    for tpath, spath, n in pairs:
        assert "motion_modules" in tpath
        assert "attentions" in spath
        assert n >= 1
        tl = tree_get(params, tpath)
        sl = tree_get(params, spath)
        # stacked: (L, in, r) — paired layers share in_features
        assert tl["a"].shape[1] == sl["content"]["down"].shape[1]


def test_expand_block_patterns_reference_dsl():
    """Reproduce the reference's hard-coded stage-1 mask dictionaries
    (train_unziplora.py:1582-1599) and spot-check the expansion against the
    grammar (generate_mask_in_unet, utils.py:177-227)."""
    content = {"mid_block": ["N_0_A_A"],
               "up_blocks.": ["1_A_A_A", "0_1_A_A"],
               "down_blocks.": ["A_A_A_A"]}
    sel = expand_block_patterns(content)
    # mid: group 0, both attns, all projs => 8 tuples
    assert ("mid_block", None, 0, "attn1", "to_q") in sel
    assert ("mid_block", None, 0, "attn2", "to_out") in sel
    # up block 1, all groups (0,1,2)
    assert ("up_blocks", 1, 0, "attn1", "to_k") in sel
    assert ("up_blocks", 1, 2, "attn2", "to_v") in sel
    # up block 0 only group 1
    assert ("up_blocks", 0, 1, "attn1", "to_q") in sel
    assert ("up_blocks", 0, 0, "attn1", "to_q") not in sel
    # down 'A' blocks = 1,2 with groups 0,1
    assert ("down_blocks", 1, 0, "attn1", "to_q") in sel
    assert ("down_blocks", 2, 1, "attn2", "to_out") in sel
    assert ("down_blocks", 0, 0, "attn1", "to_q") not in sel


def test_layer_assignments_routing():
    cfg, params = _tiny_unet()
    # tiny config: down cross block is index 1, up cross block index 0
    content = {"down_blocks.": ["1_A_A_A"]}
    style = {"up_blocks.": ["0_A_A_A"]}
    asg = layer_assignments(params, content, style,
                            num_down_blocks=2, num_up_blocks=2,
                            layers_per_block=1)
    # a down-block layer selected only by content -> 'content'
    down_path = ("down_blocks", 1, "attentions", 0, "transformer_blocks",
                 "attn1", "to_q")
    assert asg[down_path] == "content"
    up_path = ("up_blocks", 0, "attentions", 0, "transformer_blocks",
               "attn2", "to_v")
    assert asg[up_path] == "style"
    mid_path = ("mid_block", "attentions", 0, "transformer_blocks",
                "attn1", "to_q")
    assert asg[mid_path] == "both"


def test_fold_unziplora_matches_dynamic():
    """Folded kernels must reproduce the dynamic LoRA forward exactly
    when all streams coincide (single shared prompt)."""
    from video_style_transfer_tpu.lora.surgery import fold_unziplora
    cfg, params = _tiny_unet()
    params, state = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    sample, t, (emb, _, _), pooled, tids = _inputs(cfg)
    ctx = (emb, None, None)  # content/style fall back to combined
    for mode in ("both", "content", "style"):
        want = unet_apply(params, cfg, sample, t, ctx, pooled, tids,
                          mode=mode, state=state)
        folded, n = fold_unziplora(params, state, mode=mode,
                                   fold_cross_kv=True)
        got = unet_apply(folded, cfg, sample, t, ctx, pooled, tids,
                         mode=mode, state=state)
        assert n == 8 * 4  # (4 groups x attn1+attn2) x 4 projections
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)


def test_fold_partial_keeps_cross_kv_dynamic():
    """Without fold_cross_kv, distinct content/style prompts still work
    and match the unfolded model."""
    from video_style_transfer_tpu.lora.surgery import fold_unziplora
    cfg, params = _tiny_unet()
    params, state = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    sample, t, ctx, pooled, tids = _inputs(cfg)  # three DISTINCT prompts
    want = unet_apply(params, cfg, sample, t, ctx, pooled, tids,
                      mode="both", state=state)
    folded, n = fold_unziplora(params, state, mode="both",
                               fold_cross_kv=False)
    got = unet_apply(folded, cfg, sample, t, ctx, pooled, tids,
                     mode="both", state=state)
    assert n == 8 * 4 - 4 * 2  # cross-attn k/v stay dynamic (4 attn2 stacks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_fold_unziplora_bf16():
    """bf16 production folding: weight-level fold vs dynamic fp32-branch
    path within bf16 rounding tolerance (the reference's _fuse_lora does
    the same fold in fp16, lora_unzip.py:18-48)."""
    from video_style_transfer_tpu.lora.surgery import fold_unziplora
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params, state = insert_unziplora(params, jax.random.PRNGKey(1), rank=4,
                                     dtype=jnp.bfloat16)
    sample, t, (emb, _, _), pooled, tids = _inputs(cfg)
    sample = sample.astype(jnp.bfloat16)
    ctx = (emb.astype(jnp.bfloat16), None, None)
    want = unet_apply(params, cfg, sample, t, ctx, pooled, tids,
                      mode="both", state=state)
    folded, n = fold_unziplora(params, state, mode="both",
                               fold_cross_kv=True)
    assert all(l.dtype == jnp.bfloat16 for l in
               [tree_get(folded, ("conv_in", "kernel"))])
    got = unet_apply(folded, cfg, sample, t, ctx, pooled, tids,
                     mode="both", state=state)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.1, atol=0.15)
