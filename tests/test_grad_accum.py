"""Gradient accumulation (--gradient_accumulation_steps): the scanned
micro-batch path must equal manually-averaged per-micro-batch gradients
pushed through the same optimizer (Accelerate's accumulate() semantics,
reference train_unziplora.py:2010-2181 / train_animatediff.py:314-319)."""
import numpy as np
import jax
import pytest
import jax.numpy as jnp
import optax

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.lora.surgery import (
    insert_temporal_lora, insert_unziplora, layer_assignments,
    spatial_pairs, tree_get)
from video_style_transfer_tpu.models.unet import init_unet
from video_style_transfer_tpu.schedulers.ddpm import make_schedule
from video_style_transfer_tpu.training import stage1, stage2

# both oracles re-compile a full scanned-accumulation train step —
# minutes of CPU XLA compile; full-tier only
pytestmark = pytest.mark.slow


def _micro_batch(cfg, seed, b=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    d = cfg.cross_attention_dim
    return {
        "latents": jax.random.normal(ks[0], (b, 8, 8, 4)),
        "ctx": jax.random.normal(ks[1], (b, 7, d)),
        "ctx_content": jax.random.normal(ks[2], (b, 7, d)),
        "ctx_style": jax.random.normal(ks[3], (b, 7, d)),
        "pooled": jax.random.normal(ks[4], (b, 32)),
        "time_ids": jnp.tile(jnp.array([[16., 16, 0, 0, 16, 16]]), (b, 1)),
    }


def test_stage1_grad_accum_matches_manual_average():
    cfg = UNetConfig.tiny()
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, lora_state = insert_unziplora(params, jax.random.PRNGKey(1),
                                          rank=4)
    assignments = layer_assignments(params, {}, {}, layers_per_block=1)
    sep = stage1.ColumnSepConfig(enabled=False)
    opt = stage1.make_optimizer(params, total_steps=4)
    sched = make_schedule(num_train_timesteps=50)
    paths = list(assignments.keys())

    A = 2
    micros = [_micro_batch(cfg, s) for s in (10, 11)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *micros)
    key = jax.random.PRNGKey(7)

    step = stage1.make_train_step(
        cfg, sched, opt, sep_cfg=sep, assignments=assignments,
        remat=False, mask=stage1.trainable_mask(params), grad_accum=A)
    state0 = stage1.init_state(params, lora_state, opt)
    got, metrics = jax.jit(step)(state0, stacked, key)

    # manual oracle: same per-micro keys, independent value_and_grad
    keys = jax.random.split(key, A)
    losses, grads = [], []
    for mb, k in zip(micros, keys):
        (l, _), g = jax.value_and_grad(stage1_loss_wrapper, has_aux=True)(
            params, cfg, sched, mb, k, lora_state, paths)
        losses.append(l)
        grads.append(g)
    gavg = jax.tree.map(lambda a, b: (a + b) / A, *grads)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float((losses[0] + losses[1]) / A),
                               rtol=1e-5)

    updates, _ = opt.update(gavg, state0.opt_state, params)
    want = stage1.clamp_mergers(optax.apply_updates(params, updates),
                                paths)
    path = paths[0]
    np.testing.assert_allclose(
        np.asarray(tree_get(got.params, path)["lora"]["content"]["down"]),
        np.asarray(tree_get(want, path)["lora"]["content"]["down"]),
        rtol=1e-4, atol=1e-6)


def stage1_loss_wrapper(params, cfg, sched, batch, key, lora_state, paths):
    return stage1.stage1_loss(
        params, cfg, sched, batch, key, lora_state=lora_state,
        lora_paths=paths, orth_on=jnp.asarray(False),
        similarity_lambda=0.5, remat=False)


def test_stage2_grad_accum_matches_manual_average():
    cfg = UNetConfig.tiny(use_motion_modules=True)
    params = init_unet(jax.random.PRNGKey(0), cfg)
    params, lora_state = insert_unziplora(params, jax.random.PRNGKey(1),
                                          rank=4)
    params = insert_temporal_lora(params, jax.random.PRNGKey(2), rank=4)
    pairs = spatial_pairs(params)
    mask = stage2.trainable_mask(params)
    opt = stage2.make_optimizer(mask, total_steps=4, warmup=1)
    sched = make_schedule(num_train_timesteps=50)

    def mb(seed):
        return {
            "latents": jax.random.normal(jax.random.PRNGKey(seed),
                                         (1, 4, 8, 8, 4)),
            "ctx": jax.random.normal(jax.random.PRNGKey(seed + 1),
                                     (1, 7, cfg.cross_attention_dim)),
            "pooled": jax.random.normal(jax.random.PRNGKey(seed + 2),
                                        (1, 32)),
            "time_ids": jnp.array([[16., 16, 0, 0, 16, 16]]),
        }

    A = 2
    micros = [mb(20), mb(30)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *micros)
    key = jax.random.PRNGKey(5)

    step = stage2.make_train_step(cfg, sched, opt, pairs, mask=mask,
                                  lora_state=lora_state, remat=False,
                                  grad_accum=A)
    state0 = stage2.init_state(params, opt)
    got, metrics = jax.jit(step)(state0, stacked, key)

    keys = jax.random.split(key, A)
    losses, grads = [], []
    for m, k in zip(micros, keys):
        (l, _), g = jax.value_and_grad(stage2.stage2_loss, has_aux=True)(
            params, cfg, sched, m, k, pairs=pairs, state=lora_state,
            remat=False)
        losses.append(l)
        grads.append(g)
    gavg = jax.tree.map(lambda a, b: (a + b) / A, *grads)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float((losses[0] + losses[1]) / A),
                               rtol=1e-5)
    updates, _ = opt.update(gavg, state0.opt_state, params)
    want = optax.apply_updates(params, updates)
    tpath, _, _ = pairs[0]
    np.testing.assert_allclose(
        np.asarray(tree_get(got.params, tpath)["a"]),
        np.asarray(tree_get(want, tpath)["a"]),
        rtol=1e-4, atol=1e-6)
