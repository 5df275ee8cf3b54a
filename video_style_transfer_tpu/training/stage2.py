"""Stage-2 trainer: temporal-LoRA fine-tuning on a single video.

Functional re-design of the reference's motion trainer
(train_animatediff.py:52-357): the motion UNet holds frozen SDXL +
UnZipLoRA spatial weights and trainable temporal LoRA A/B (+ motion norms,
+ mergers when unfrozen); loss is per-clip-timestep eps-MSE on
(B, F, h, w, 4) latents plus the temporal-spatial orthogonality penalty
(:302-312); optimization is AdamW with cosine schedule.

TPU design: the train step is one jit program; the (B*F) row axis shards
over the ('data','frame') mesh; gradients for the tiny LoRA tree psum
automatically via sharding. Freezing is optax.multi_transform +
set_to_zero and a trainable-leaves-only backward, not requires_grad
mutation (reference freeze_spatial_layers, animatediff/utils.py:66-95).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.lora.surgery import spatial_pairs, tree_get
from video_style_transfer_tpu.lora.temporal import orthogonality_loss
from video_style_transfer_tpu.models.unet import unet_apply
from video_style_transfer_tpu.schedulers.ddpm import add_noise, velocity_target


class Stage2State(NamedTuple):
    params: Any          # full UNet params (frozen + trainable leaves)
    opt_state: Any
    step: jnp.ndarray


def trainable_mask(params, *, train_mergers: bool = False,
                   train_motion_norms: bool = True,
                   train_full_motion: bool = False):
    """Boolean pytree: True = trainable. Temporal LoRA a/b always.

    The reference's freeze (animatediff/utils.py:66-95) keeps EVERY
    motion-module weight trainable except the wrapped attention base
    projections (.base.weight/.base.bias of TemporalLoRALinear) — i.e.
    norms, GroupNorm, ff, proj_in/proj_out all train alongside the
    temporal LoRA. ``train_motion_norms`` gates that non-attention set
    (False = LoRA-only, a stricter variant the reference doesn't have).
    Mergers train when unfrozen ("Option C"); train_full_motion
    fine-tunes every motion weight including the attention bases (the
    older stage-2 variant, unziplora_unet/train_animatediff.py)."""
    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, path + (i,)) for i, v in enumerate(tree)]
        in_motion = "motion_modules" in path
        if "tlora" in path:
            return path[-1] in ("a", "b")
        if in_motion:
            if train_full_motion and "lora" not in path:
                return True
            is_attn_base = any(
                isinstance(k, str)
                and k in ("to_q", "to_k", "to_v", "to_out")
                for k in path)
            if not is_attn_base and train_motion_norms:
                return True
            return False
        if train_mergers and "lora" in path and isinstance(path[-1], str) \
                and path[-1].startswith("merge_"):
            return True
        return False
    return walk(params, ())


def make_optimizer(mask, *, lr: float = 2e-5, total_steps: int = 1000,
                   warmup: int = 100, weight_decay: float = 1e-2,
                   max_grad_norm: float = 0.5, b1: float = 0.9,
                   b2: float = 0.999, eps: float = 1e-8,
                   schedule: str = "cosine", num_cycles: int = 1,
                   power: float = 1.0, optimizer: str = "adamw"):
    """AdamW + cosine decay with warmup + clip 0.5 (reference
    train_animatediff.sh:36,40-41; clip train_animatediff.py:316;
    betas/eps flags train_animatediff.py:404-414). schedule names follow
    diffusers get_scheduler (training/schedules.py); 'adamw8bit' is the
    TPU-native --use_8bit_adam analog (training/adam8bit.py).

    Freezing uses multi_transform + set_to_zero like stage 1 — NOT
    optax.masked, which passes un-masked leaves' updates through
    UNCHANGED, i.e. frozen params would drift by their raw gradients
    (verified empirically on this optax)."""
    from video_style_transfer_tpu.training.schedules import make_lr_schedule
    sched = make_lr_schedule(schedule, lr, warmup=warmup,
                             total_steps=total_steps,
                             num_cycles=num_cycles, power=power)
    if optimizer == "adamw8bit":
        from video_style_transfer_tpu.training.adam8bit import adamw8bit
        inner = adamw8bit(sched, b1=b1, b2=b2, eps=eps,
                          weight_decay=weight_decay)
    elif optimizer == "adamw":
        inner = optax.adamw(sched, b1=b1, b2=b2, eps=eps,
                            weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer {optimizer!r}")
    tx = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        inner,
    )
    labels = jax.tree.map(lambda m: "train" if m else "frozen", mask)
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)


def stage2_loss(params, unet_cfg: UNetConfig, sched, batch, key, *,
                pairs, lambda_orth: float = 1e-4,
                prediction_type: str = "epsilon",
                cfg_dropout: float = 0.1, mode: str = "both", state=None,
                impl: str = "auto", remat: bool = True):
    """batch: dict with
      latents  (B, F, h, w, 4) — VAE-encoded clip (scaled)
      ctx      (B, S, D) combined prompt embeddings
      pooled   (B, pooled_dim)
      time_ids (B, 6)
    One shared timestep per clip (reference train_animatediff.py:228-236).
    """
    latents = batch["latents"]
    b, f = latents.shape[:2]
    k_t, k_n, k_d = jax.random.split(key, 3)

    t = jax.random.randint(k_t, (b,), 0, sched["num_train_timesteps"])
    t_rows = jnp.repeat(t, f)

    noise = jax.random.normal(k_n, latents.shape, latents.dtype)
    rows = latents.reshape(b * f, *latents.shape[2:])
    noise_rows = noise.reshape(b * f, *latents.shape[2:])
    noisy = add_noise(sched, rows, noise_rows, t_rows)

    # 10% CFG prompt dropout (reference train_animatediff.py:248-254):
    # the reference swaps BOTH encoder_hidden_states AND the pooled
    # embeds to the empty-prompt encodings. Batches may carry
    # 'uncond_ctx'/'uncond_pooled' (the encoded "" prompt, what
    # inference-time CFG uses); zeros are the fallback. The reference
    # draws one Bernoulli per optimizer step; per-example is the B>1
    # generalization (identical at the reference's B=1).
    drop = jax.random.bernoulli(k_d, cfg_dropout, (b, 1, 1))
    uncond_ctx = batch.get("uncond_ctx",
                           jnp.zeros_like(batch["ctx"]))
    uncond_pooled = batch.get("uncond_pooled",
                              jnp.zeros_like(batch["pooled"]))
    ctx = jnp.where(drop, uncond_ctx, batch["ctx"])
    pooled = jnp.where(drop[:, :, 0], uncond_pooled, batch["pooled"])

    pred = unet_apply(params, unet_cfg, noisy, t, (ctx, None, None),
                      pooled, batch["time_ids"], mode=mode,
                      state=state, num_frames=f, impl=impl, remat=remat)

    if prediction_type == "v_prediction":
        target = velocity_target(sched, rows, noise_rows, t_rows)
    else:
        target = noise_rows
    loss_mse = jnp.mean(
        (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    loss_orth = jnp.float32(0.0)
    if lambda_orth > 0.0 and pairs:
        total = jnp.float32(0.0)
        count = 0
        for tpath, spath, n in pairs:
            tl = jax.tree.map(lambda a: a[:n], tree_get(params, tpath))
            sl = jax.tree.map(lambda a: a[:n], tree_get(params, spath))
            total = total + jnp.sum(jax.vmap(orthogonality_loss)(tl, sl))
            count += n
        loss_orth = lambda_orth * total / count

    return loss_mse + loss_orth, {"loss_mse": loss_mse,
                                  "loss_orth": loss_orth}


def make_train_step(unet_cfg: UNetConfig, sched, optimizer, pairs, *,
                    lambda_orth: float = 1e-4, cfg_dropout: float = 0.1,
                    prediction_type: str = "epsilon", mode: str = "both",
                    lora_state=None, impl: str = "auto", remat=True,
                    mask=None, grad_accum: int = 1):
    """Returns step(state, batch, key) -> (state, metrics). jit outside
    (optionally under a mesh with batch rows sharded).

    When ``mask`` (the trainable_mask pytree) is given, the backward is
    taken w.r.t. the trainable leaves ONLY — frozen leaves are
    stop-gradiented and their gradient buffers never exist (the full
    frozen-gradient tree is ~5.9 GB for the SDXL motion UNet, which
    alone decided whether the 8f@1024 step fits a 16 GB chip)."""
    # Stage 2 needs the component-level remat policy: the double-attn
    # motion blocks' module-level temps (norm/proj at 16384-token level-0
    # shapes) push the 8f@1024^2 step past 16 GB HBM under the inner-only
    # policy stage 1 uses. "component_lite1" additionally stores the
    # small-spatial (<=64x64) level-1/2 components instead of rematting
    # them — measured 2.52 ("component") -> 2.19 ("component_lite",
    # levels-2 stored) -> 2.07 s/step (levels 1+2 stored) at 8f@1024^2
    # on v5e: those levels dominate replay FLOPs while their internals
    # are the cheapest to store (level-1 scanned transformers keep the
    # inner remat, so the addition is bounded by scan carries). Pass
    # remat="component"/"component_lite" if a smaller-HBM part needs
    # more checkpointing. See unet_apply's remat docstring.
    if remat is True:
        remat = "component_lite1"

    def step(state: Stage2State, batch, key):
        params = state.params

        leaves, treedef = jax.tree_util.tree_flatten(params)
        if mask is None:
            mleaves = [True] * len(leaves)
        else:
            mleaves = jax.tree_util.tree_leaves(mask)
        train_leaves = [l for l, m in zip(leaves, mleaves) if m]

        def grads_of(b, k):
            def loss_fn(train_list):
                it = iter(train_list)
                full = [next(it) if m else jax.lax.stop_gradient(l)
                        for l, m in zip(leaves, mleaves)]
                p = jax.tree_util.tree_unflatten(treedef, full)
                return stage2_loss(
                    p, unet_cfg, sched, b, k, pairs=pairs,
                    lambda_orth=lambda_orth, cfg_dropout=cfg_dropout,
                    prediction_type=prediction_type,
                    mode=mode, state=lora_state, impl=impl, remat=remat)
            return jax.value_and_grad(loss_fn, has_aux=True)(train_leaves)

        if grad_accum <= 1:
            (loss, aux), gtrain = grads_of(batch, key)
        else:
            # --gradient_accumulation_steps: batch leaves carry a
            # leading (A,) micro-batch axis; scan accumulates ONLY the
            # trainable grad leaves (the frozen tree never exists)
            keys = jax.random.split(key, grad_accum)

            def body(cg, xs):
                mb, mk = xs
                (l, a), g = grads_of(mb, mk)
                return [x + y for x, y in zip(cg, g)], (l, a)

            gsum, (losses, auxs) = jax.lax.scan(
                body, [jnp.zeros_like(l) for l in train_leaves],
                (batch, keys))
            loss = jnp.mean(losses)
            aux = jax.tree.map(lambda x: jnp.mean(x, axis=0), auxs)
            gtrain = [g / grad_accum for g in gsum]

        it = iter(gtrain)
        # frozen grads are symbolic zeros: set_to_zero never reads
        # them and x+0 folds, so no 5.9 GB tree materializes
        gfull = [next(it) if m else jnp.zeros_like(l)
                 for l, m in zip(leaves, mleaves)]
        grads = jax.tree_util.tree_unflatten(treedef, gfull)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **aux}
        return Stage2State(params, opt_state, state.step + 1), metrics

    return step


def init_state(params, optimizer) -> Stage2State:
    return Stage2State(params, optimizer.init(params), jnp.asarray(0))
