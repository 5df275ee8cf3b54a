"""Stage-1 trainer tests: loss/step mechanics and the column-separation
state machine on the tiny UNet."""
import numpy as np
import jax
import jax.numpy as jnp

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.lora.surgery import (
    insert_unziplora, layer_assignments, tree_get)
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.schedulers.ddpm import make_schedule
from video_style_transfer_tpu.training import stage1

RES = 16


def _setup(sep_enabled=True):
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, lora_state = insert_unziplora(params, jax.random.PRNGKey(1),
                                          rank=4)
    assignments = layer_assignments(params, {}, {}, num_down_blocks=2,
                                    num_up_blocks=2, layers_per_block=1)
    sep = stage1.ColumnSepConfig(enabled=sep_enabled, max_steps=12,
                                 sample_times=3, steps_per_epoch=1,
                                 column_ratio=0.25)
    opt = stage1.make_optimizer(params, total_steps=12)
    state = stage1.init_state(params, lora_state, opt)
    sched = make_schedule(num_train_timesteps=50)
    step = stage1.make_train_step(cfg, sched, opt, sep_cfg=sep,
                                  assignments=assignments,
                                  similarity_lambda=0.5, remat=False)
    return cfg, state, step, assignments, sep


def _batch(cfg, b=1):
    ks = jax.random.split(jax.random.PRNGKey(9), 6)
    d = cfg.cross_attention_dim
    return {
        "latents": jax.random.normal(ks[0], (b, 8, 8, 4)),
        "ctx": jax.random.normal(ks[1], (b, 7, d)),
        "ctx_content": jax.random.normal(ks[2], (b, 7, d)),
        "ctx_style": jax.random.normal(ks[3], (b, 7, d)),
        "pooled": jax.random.normal(ks[4], (b, 32)),
        "time_ids": jnp.tile(jnp.array([[16., 16, 0, 0, 16, 16]]), (b, 1)),
    }


def test_train_step_runs_and_updates_lora_only():
    cfg, state, step, assignments, _ = _setup(sep_enabled=False)
    batch = _batch(cfg)
    jstep = jax.jit(step)
    new_state, metrics = jstep(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # base kernel frozen
    path = next(iter(assignments))
    old_k = tree_get(state.params, path)["kernel"]
    new_k = tree_get(new_state.params, path)["kernel"]
    np.testing.assert_array_equal(np.asarray(old_k), np.asarray(new_k))
    # lora changed
    old_l = tree_get(state.params, path)["lora"]["content"]["down"]
    new_l = tree_get(new_state.params, path)["lora"]["content"]["down"]
    assert not np.allclose(np.asarray(old_l), np.asarray(new_l))


def test_mergers_clamped_01():
    cfg, state, step, assignments, _ = _setup(sep_enabled=False)
    batch = _batch(cfg)
    jstep = jax.jit(step)
    s = state
    for i in range(3):
        s, _ = jstep(s, batch, jax.random.PRNGKey(i))
    for path in assignments:
        lp = tree_get(s.params, path)["lora"]
        for k in ("merge_content", "merge_style"):
            arr = np.asarray(lp[k])
            assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_column_separation_schedule():
    """sampled_steps=4, steps_per_epoch=1: step 0 reset, step 1 select,
    steps 2-3 zero-out, step 4 reset, ... step >= 12 tail."""
    cfg, state, step, assignments, sep = _setup(sep_enabled=True)
    assert sep.sampled_steps == 4
    batch = _batch(cfg)
    jstep = jax.jit(step)

    path = next(iter(assignments))
    s = state
    flags = []
    merger_on = []
    for i in range(6):
        s, _ = jstep(s, batch, jax.random.PRNGKey(i))
        st = tree_get(s.lora_state, path)
        flags.append(bool(np.all(np.asarray(st["use_mask_content"]))))
        merger_on.append(bool(s.merger_on))
    # after step 0 (reset): masks off, mergers frozen
    assert flags[0] is False and merger_on[0] is False
    # after step 1 (select): masks on, mergers trainable
    assert flags[1] is True and merger_on[1] is True
    # stays on through zero-out steps 2,3
    assert flags[2] and flags[3]
    # step 4 reset: off again
    assert flags[4] is False and merger_on[4] is False
    # masks populated at select: 'both' label => content/style disjoint
    # (avoid=True)


def test_select_populates_disjoint_masks():
    cfg, state, step, assignments, sep = _setup(sep_enabled=True)
    batch = _batch(cfg)
    jstep = jax.jit(step)
    s = state
    for i in range(2):   # through reset + select
        s, _ = jstep(s, batch, jax.random.PRNGKey(i))
    some_nonempty = False
    for path in assignments:
        st = tree_get(s.lora_state, path)
        mc = np.asarray(st["mask_content"])
        ms = np.asarray(st["mask_style"])
        assert not np.any(mc & ms), "content/style masks overlap"
        some_nonempty |= mc.any() or ms.any()
    assert some_nonempty


def test_merger_frozen_during_sampling():
    cfg, state, step, assignments, sep = _setup(sep_enabled=True)
    batch = _batch(cfg)
    jstep = jax.jit(step)
    s0 = state
    s1, _ = jstep(s0, batch, jax.random.PRNGKey(0))   # step 0: reset after
    path = next(iter(assignments))
    # step 1 runs with merger_on=False -> mergers unchanged by step 1
    m_before = np.asarray(tree_get(s1.params, path)["lora"]["merge_content"])
    s2, _ = jstep(s1, batch, jax.random.PRNGKey(1))
    m_after = np.asarray(tree_get(s2.params, path)["lora"]["merge_content"])
    np.testing.assert_array_equal(m_before, m_after)


def test_full_schedule_through_tail():
    """Run past sample_times*sampled_steps into the tail phase: the state
    machine must stay finite, masks must persist, and the tail keeps
    training with merger gating (reference :2141-2143)."""
    cfg, state, step, assignments, sep = _setup(sep_enabled=True)
    batch = _batch(cfg)
    jstep = jax.jit(step)
    s = state
    # sampled_steps=4, sample_times=3 -> tail from step 12
    for i in range(14):
        s, m = jstep(s, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"])), i
    path = next(iter(assignments))
    st = tree_get(s.lora_state, path)
    # masks accumulated over 3 selections: nonempty. NOTE: cross-round
    # overlap is allowed — the reference's avoid logic only keeps STYLE
    # away from content columns at each selection; content may later
    # claim style-owned columns (mask_updated_elements,
    # unziplora_linear_layer.py:190-207)
    mc = np.asarray(st["mask_content"])
    ms = np.asarray(st["mask_style"])
    assert mc.any() and ms.any()
    # mask flags stay on in the tail
    assert bool(np.all(np.asarray(st["use_mask_content"])))
    # mergers clamped
    lp = tree_get(s.params, path)["lora"]
    m = np.asarray(lp["merge_content"])
    assert m.min() >= 0.0 and m.max() <= 1.0


def test_prodigy_honors_per_group_lr():
    """Prodigy must preserve the per-group lr asymmetry: prodigyopt
    reads each torch param group's "lr" as the multiplier on the
    adapted step (the reference builds groups with content/style/
    weight_learning_rate, train_unziplora.py:1546-1580,1661-1671 —
    merger lr is 100x the LoRA lr in train.sh). Regression for the
    round-4 review finding that the optax path hardwired 1.0."""
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, _ = insert_unziplora(params, jax.random.PRNGKey(1), rank=4)
    opt = stage1.make_optimizer(params, lr_content=1e-4, lr_style=1e-4,
                                lr_merger=1e-2, optimizer="prodigy",
                                total_steps=10, max_grad_norm=1e9)
    st = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    upd, _ = opt.update(grads, st, params)

    path = None
    from video_style_transfer_tpu.lora.surgery import layer_assignments
    path = next(iter(layer_assignments(
        params, {}, {}, num_down_blocks=2, num_up_blocks=2,
        layers_per_block=1)))
    lu = tree_get(upd, path)["lora"]
    merger_mag = float(jnp.mean(jnp.abs(lu["merge_content"])))
    lora_mag = float(jnp.mean(jnp.abs(lu["content"]["down"])))
    assert merger_mag > 0 and lora_mag > 0
    ratio = merger_mag / lora_mag
    assert 50.0 < ratio < 200.0, ratio


def test_stage2_train_step_threads_cfg_dropout():
    """make_train_step must pass cfg_dropout through to stage2_loss —
    regression for the round-4 review finding that --cfg_dropout was
    parsed but silently ignored (training stayed at the 0.1 default)."""
    from video_style_transfer_tpu.lora.surgery import insert_temporal_lora
    from video_style_transfer_tpu.training import stage2

    cfg2 = UNetConfig.tiny(use_motion_modules=True)
    key = jax.random.PRNGKey(0)
    params = insert_temporal_lora(init_unet(key, cfg2), key, rank=2)
    sched = make_schedule()
    xdim = cfg2.cross_attention_dim
    pdim = (cfg2.projection_class_embeddings_input_dim
            - 6 * cfg2.addition_time_embed_dim)
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    batch = {
        "latents": jax.random.normal(ks[0], (1, 2, 8, 8, 4)),
        "ctx": jax.random.normal(ks[1], (1, 7, xdim)),
        "pooled": jax.random.normal(ks[2], (1, pdim)),
        "time_ids": jnp.asarray([[16, 16, 0, 0, 16, 16]], jnp.float32),
        "uncond_ctx": jax.random.normal(ks[3], (1, 7, xdim)),
        "uncond_pooled": jax.random.normal(ks[4], (1, pdim)),
    }
    opt = stage1.make_optimizer(params, total_steps=4)
    lkey = jax.random.PRNGKey(7)

    def loss_at(dropout):
        step = stage2.make_train_step(cfg2, sched, opt, [],
                                      lambda_orth=0.0,
                                      cfg_dropout=dropout, remat=False)
        st = stage2.init_state(params, opt)
        _, metrics = step(st, batch, lkey)
        return float(metrics["loss"])

    l_drop = loss_at(1.0)
    l_keep = loss_at(0.0)
    l_direct, _ = stage2.stage2_loss(
        params, cfg2, sched,
        dict(batch, ctx=batch["uncond_ctx"],
             pooled=batch["uncond_pooled"]),
        lkey, pairs=[], lambda_orth=0.0, cfg_dropout=0.0, remat=False)
    assert abs(l_drop - float(l_direct)) < 1e-5 * max(1.0, abs(l_drop))
    assert l_drop != l_keep
