"""Multi-device training on the 8-device virtual CPU mesh: stage-1 data
parallel and stage-2 frame parallel, both matching their single-device
results (the determinism guarantee DDP cannot give)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.lora.surgery import (
    insert_temporal_lora, insert_unziplora, layer_assignments,
    spatial_pairs, tree_get)
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.parallel import create_mesh, replicate
from video_style_transfer_tpu.schedulers.ddpm import make_schedule
from video_style_transfer_tpu.training import stage1, stage2


def test_stage1_data_parallel_matches_single():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, lora_state = insert_unziplora(params, jax.random.PRNGKey(1),
                                          rank=4)
    assignments = layer_assignments(params, {}, {}, layers_per_block=1)
    sep = stage1.ColumnSepConfig(enabled=False)
    opt = stage1.make_optimizer(params, total_steps=4)
    sched = make_schedule(num_train_timesteps=50)
    step = stage1.make_train_step(cfg, sched, opt, sep_cfg=sep,
                                  assignments=assignments, remat=False,
                                  mask=stage1.trainable_mask(params))

    b = 8
    ks = jax.random.split(jax.random.PRNGKey(9), 6)
    d = cfg.cross_attention_dim
    batch = {
        "latents": jax.random.normal(ks[0], (b, 8, 8, 4)),
        "ctx": jax.random.normal(ks[1], (b, 7, d)),
        "ctx_content": jax.random.normal(ks[2], (b, 7, d)),
        "ctx_style": jax.random.normal(ks[3], (b, 7, d)),
        "pooled": jax.random.normal(ks[4], (b, 32)),
        "time_ids": jnp.tile(jnp.array([[16., 16, 0, 0, 16, 16]]), (b, 1)),
    }

    state0 = stage1.init_state(params, lora_state, opt)
    s_single, m_single = jax.jit(step)(state0, batch,
                                       jax.random.PRNGKey(0))

    mesh = create_mesh(data=8)
    rep = replicate(mesh)
    batch_sharded = {
        k: jax.device_put(v, NamedSharding(mesh, P("data")))
        for k, v in batch.items()
    }
    state_r = jax.device_put(stage1.init_state(params, lora_state, opt),
                             rep)
    with mesh:
        s_multi, m_multi = jax.jit(step)(state_r, batch_sharded,
                                         jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m_multi["loss"]),
                               float(m_single["loss"]), rtol=1e-4)
    path = next(iter(assignments))
    a = np.asarray(tree_get(s_single.params, path)["lora"]["content"]["down"])
    b_ = np.asarray(tree_get(s_multi.params, path)["lora"]["content"]["down"])
    np.testing.assert_allclose(a, b_, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_stage2_frame_parallel_matches_single():
    """Frame-sharded stage-2 step == single-device step: loss and every
    trainable leaf agree up to collective reduction-order round-off
    (VERDICT r2 next #6b)."""
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, lora_state = insert_unziplora(params, jax.random.PRNGKey(1),
                                          rank=4)
    params = insert_temporal_lora(params, jax.random.PRNGKey(2), rank=4)
    pairs = spatial_pairs(params)
    mask = stage2.trainable_mask(params)
    opt = stage2.make_optimizer(mask, total_steps=4, warmup=1)
    sched = make_schedule(num_train_timesteps=50)
    step = stage2.make_train_step(cfg, sched, opt, pairs, mask=mask,
                                  lora_state=lora_state, remat=False)

    b, f = 1, 8
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(3),
                                     (b, f, 8, 8, 4)),
        "ctx": jax.random.normal(jax.random.PRNGKey(4),
                                 (b, 7, cfg.cross_attention_dim)),
        "pooled": jax.random.normal(jax.random.PRNGKey(5), (b, 32)),
        "time_ids": jnp.tile(jnp.array([[16., 16, 0, 0, 16, 16]]), (b, 1)),
    }
    s_single, m_single = jax.jit(step)(stage2.init_state(params, opt),
                                       batch, jax.random.PRNGKey(6))

    mesh = create_mesh(frame=8)
    batch_sh = dict(batch)
    batch_sh["latents"] = jax.device_put(
        batch["latents"], NamedSharding(mesh, P(None, "frame")))
    state = jax.device_put(stage2.init_state(params, opt), replicate(mesh))
    with mesh:
        new_state, metrics = jax.jit(step)(state, batch_sh,
                                           jax.random.PRNGKey(6))
    assert int(new_state.step) == 1
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(m_single["loss"]), rtol=1e-4)
    for pa, pb, tr in zip(jax.tree.leaves(new_state.params),
                          jax.tree.leaves(s_single.params),
                          jax.tree.leaves(mask)):
        if tr:
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-3, atol=1e-5)


def test_stage2_frozen_params_do_not_drift():
    """Regression: optax.masked passes un-masked updates through
    UNCHANGED, so the frozen SDXL/spatial weights drifted by raw
    gradients. The multi_transform + trainable-only-backward step must
    leave every frozen leaf bitwise identical."""
    import numpy as np
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import (
        insert_temporal_lora, insert_unziplora, spatial_pairs)
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage2

    cfg = UNetConfig.tiny(use_motion_modules=True)
    key = jax.random.PRNGKey(0)
    params = init_unet(key, cfg)
    params, lora_state = insert_unziplora(params, key, rank=2)
    params = insert_temporal_lora(params, key, rank=2)
    mask = stage2.trainable_mask(params)
    opt = stage2.make_optimizer(mask, total_steps=4, warmup=1)
    pairs = spatial_pairs(params)
    step = jax.jit(stage2.make_train_step(
        cfg, sched=make_schedule(), optimizer=opt, pairs=pairs,
        mask=mask, lora_state=lora_state, remat=False))
    st = stage2.init_state(params, opt)

    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
    batch = {
        "latents": jax.random.normal(jax.random.PRNGKey(1),
                                     (1, 2, 8, 8, 4)),
        "ctx": jax.random.normal(jax.random.PRNGKey(2), (1, 7, xdim)),
        "pooled": jax.random.normal(jax.random.PRNGKey(3),
                                    (1, pooled_dim)),
        "time_ids": jnp.asarray([[16, 16, 0, 0, 16, 16]], jnp.float32),
    }
    st2, metrics = step(st, batch, jax.random.PRNGKey(4))
    # warmup LR is 0 at step 0; take a second step so AdamW moves
    st2, metrics = step(st2, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["loss"]))

    changed_trainable = 0
    before = jax.tree_util.tree_leaves(params)
    after = jax.tree_util.tree_leaves(st2.params)
    masks = jax.tree_util.tree_leaves(mask)
    for b, a, m in zip(before, after, masks):
        if m:
            changed_trainable += int(not np.array_equal(np.asarray(b),
                                                        np.asarray(a)))
        else:
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert changed_trainable > 0


@pytest.mark.slow
def test_stage2_cfg_dropout_swaps_ctx_and_pooled():
    """cfg_dropout=1.0 must reproduce the loss computed directly with the
    uncond embeddings (the reference swaps BOTH encoder_hidden_states and
    pooled_embeds to the empty-prompt encodings,
    train_animatediff.py:248-254)."""
    import numpy as np
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import insert_temporal_lora
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage2

    cfg = UNetConfig.tiny(use_motion_modules=True)
    key = jax.random.PRNGKey(0)
    params = insert_temporal_lora(init_unet(key, cfg), key, rank=2)
    sched = make_schedule()
    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    base = {
        "latents": jax.random.normal(ks[0], (1, 2, 8, 8, 4)),
        "ctx": jax.random.normal(ks[1], (1, 7, xdim)),
        "pooled": jax.random.normal(ks[2], (1, pooled_dim)),
        "time_ids": jnp.asarray([[16, 16, 0, 0, 16, 16]], jnp.float32),
        "uncond_ctx": jax.random.normal(ks[3], (1, 7, xdim)),
        "uncond_pooled": jax.random.normal(ks[4], (1, pooled_dim)),
    }
    lkey = jax.random.PRNGKey(7)

    loss_dropped, _ = stage2.stage2_loss(
        params, cfg, sched, base, lkey, pairs=[], lambda_orth=0.0,
        cfg_dropout=1.0, remat=False)
    swapped = dict(base, ctx=base["uncond_ctx"],
                   pooled=base["uncond_pooled"])
    loss_direct, _ = stage2.stage2_loss(
        params, cfg, sched, swapped, lkey, pairs=[], lambda_orth=0.0,
        cfg_dropout=0.0, remat=False)
    np.testing.assert_allclose(float(loss_dropped), float(loss_direct),
                               rtol=1e-5)

    # dropout 0 must ignore the uncond entries entirely
    loss_keep, _ = stage2.stage2_loss(
        params, cfg, sched, base, lkey, pairs=[], lambda_orth=0.0,
        cfg_dropout=0.0, remat=False)
    no_uncond = {k: v for k, v in base.items()
                 if not k.startswith("uncond")}
    loss_plain, _ = stage2.stage2_loss(
        params, cfg, sched, no_uncond, lkey, pairs=[], lambda_orth=0.0,
        cfg_dropout=0.0, remat=False)
    np.testing.assert_allclose(float(loss_keep), float(loss_plain),
                               rtol=1e-6)
