"""Stage-1 trainer: joint content/style UnZipLoRA training on SDXL.

Functional re-derivation of the reference's DreamBooth-style trainer
(train_unziplora.py:1126-2533): MSE on noise prediction with triple-prompt
conditioning, merger-cosine similarity loss, optional dual prior
preservation with forward-type switching, three optimizer groups
(content LoRA / style LoRA / mergers at 5e-5 / 5e-5 / 5e-3), merger
clamping to [0, 1], and the periodic cone-driven column-separation state
machine (:2135-2171).

TPU re-design of the state machine: the reference mutates module
attributes (.grad surgery, masked_matrix flags, requires_grad toggling)
between backward and step; here the whole schedule is pure array math on
a `lora_state` tree inside ONE jitted train step — phase predicates are
traced booleans over the step index, mask updates are jnp.where blends,
merger freezing is a multiplicative gate on the merger gradients, and
cone scores come from the grads pytree (no .grad attributes exist).

Ordering preserved from the reference loop:
  backward -> (cone/select/zero-out using THIS step's grads and the
  PREVIOUS step's flags) -> clip -> optimizer step -> merger clamp;
  flag flips (use_mask, merger trainability, orth-loss on) take effect
  the NEXT step, as they do in the reference.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from video_style_transfer_tpu.config import UNetConfig
from video_style_transfer_tpu.lora.surgery import (
    PROJS, iter_spatial_attention_paths, tree_get, tree_set)
from video_style_transfer_tpu.lora.unzip import (
    cone_columns, mergers_similarity, select_columns)
from video_style_transfer_tpu.models.unet import unet_apply
from video_style_transfer_tpu.schedulers.ddpm import add_noise


class Stage1State(NamedTuple):
    params: Any
    opt_state: Any
    lora_state: Any        # masks / scores / flags (per stacked layer)
    orth_on: jnp.ndarray   # scalar bool — similarity loss enabled
    merger_on: jnp.ndarray  # scalar bool — mergers trainable this step
    step: jnp.ndarray


class ColumnSepConfig(NamedTuple):
    """Schedule constants (reference train.sh:11-12,32 and
    train_unziplora.py:1860: sampled_steps = ceil(max_steps/sample_times)).

    Note on --with_accumulate_cone: the reference can accumulate raw cone
    matrices during the sampling window (:2151-2153), but its selection
    step calls get_unziplora_cone(accumulate=False) which OVERWRITES the
    accumulator with the current step's column sparsity
    (unziplora_linear_layer.py:144-146) — the accumulated value is never
    consumed. We implement the effective behavior (select from the
    current step's cone) and skip the dead accumulation."""
    enabled: bool = False
    max_steps: int = 600
    sample_times: int = 3
    steps_per_epoch: int = 1     # num_update_steps_per_epoch
    column_ratio: float = 0.1
    avoid: bool = True           # content-priority no-overlap
    finetune_mask: bool = False  # True: per-branch mask; False: overlap

    @property
    def sampled_steps(self) -> int:
        return -(-self.max_steps // self.sample_times)


# ---------------------------------------------------------------------------
# Optimizer: three param groups + frozen base
# ---------------------------------------------------------------------------

def param_labels(params):
    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, path + (i,)) for i, v in enumerate(tree)]
        if "lora" in path:
            if path[-1] == "merge_content" or path[-1] == "merge_style":
                return "merger"
            if "content" in path:
                return "content"
            if "style" in path:
                return "style"
        return "frozen"
    return walk(params, ())


def make_optimizer(params, *, lr_content: float = 5e-5,
                   lr_style: float = 5e-5, lr_merger: float = 5e-3,
                   weight_decay: float = 1e-4, b1: float = 0.9,
                   b2: float = 0.999, eps: float = 1e-8,
                   max_grad_norm: float = 1.0,
                   total_steps: int = 600, warmup: int = 0,
                   schedule: str = "constant", num_cycles: int = 1,
                   power: float = 1.0,
                   optimizer: str = "adamw",
                   prodigy_beta3: Optional[float] = None,
                   prodigy_safeguard_warmup: bool = True):
    """optimizer: 'adamw', 'adamw8bit' or 'prodigy' (the reference offers
    AdamW / bitsandbytes 8-bit Adam / Prodigy,
    train_unziplora.py:1615-1671). 'adamw8bit' is the TPU-native
    re-derivation of bnb's blockwise-quantized moments
    (training/adam8bit.py). optax's prodigy is decoupled and
    bias-corrected by construction (the reference's --prodigy_decouple /
    --prodigy_use_bias_correction default-True switches).

    schedule/num_cycles/power follow diffusers get_scheduler semantics
    (training/schedules.py)."""
    from video_style_transfer_tpu.training.schedules import make_lr_schedule

    def lr_sched(lr):
        return make_lr_schedule(schedule, lr, warmup=warmup,
                                total_steps=total_steps,
                                num_cycles=num_cycles, power=power)

    def group(lr):
        if optimizer == "prodigy":
            # prodigy adapts the step size itself, but the per-group lr
            # still multiplies the adapted step (prodigyopt reads each
            # torch param group's "lr"; the reference builds groups with
            # lr = content/style/weight_learning_rate,
            # train_unziplora.py:1546-1580,1661-1671 — preserving e.g.
            # the 100x merger-vs-LoRA ratio even under prodigy). The
            # schedule composes multiplicatively on top, like
            # get_scheduler over the torch optimizer. Reference users
            # are warned to pass lr ~1.0 with prodigy; that choice is
            # theirs, not hardwired here.
            return optax.contrib.prodigy(
                learning_rate=lr_sched(lr),
                betas=(b1, b2), beta3=prodigy_beta3, eps=eps,
                weight_decay=weight_decay,
                safeguard_warmup=prodigy_safeguard_warmup)
        if optimizer == "adamw8bit":
            from video_style_transfer_tpu.training.adam8bit import adamw8bit
            return adamw8bit(lr_sched(lr), b1=b1, b2=b2, eps=eps,
                             weight_decay=weight_decay)
        if optimizer != "adamw":
            raise ValueError(f"unknown optimizer {optimizer!r}")
        return optax.adamw(lr_sched(lr), b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay)

    labels = param_labels(params)
    tx = optax.multi_transform(
        {"content": group(lr_content), "style": group(lr_style),
         "merger": group(lr_merger), "frozen": optax.set_to_zero()},
        labels)
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def _similarity_loss(params, lora_state, lora_paths):
    """Mean merger similarity over every stacked projection layer
    (reference inverse_ziplora_compute_weight_similarity,
    unziplora_unet/utils.py:271-287)."""
    vals = []
    for path in lora_paths:
        lp = tree_get(params, path)["lora"]
        st = tree_get(lora_state, path)
        vals.append(jax.vmap(mergers_similarity)(lp, st))
    return jnp.mean(jnp.concatenate([v.reshape(-1) for v in vals]))


def stage1_loss(params, unet_cfg: UNetConfig, sched, batch, key, *,
                lora_state, lora_paths, orth_on, similarity_lambda: float,
                prior_weight: float = 0.0, prior_weight_2: float = 0.0,
                impl: str = "auto", remat: bool = True):
    """batch:
      latents       (B, h, w, 4)    VAE-encoded instance image latents
      ctx/ctx_c/ctx_s (B, S, D)     combined/content/style embeddings —
                    batch dim must MATCH latents (unet_apply broadcasts
                    over frames, not over batch; the CLI jnp.repeats a
                    shared prompt to B, cli/train_unziplora.py)
      pooled        (B, pooled)     time_ids (B, 6)
      optional prior_content / prior_style: dicts with latents/ctx/pooled/
      time_ids for dual prior preservation (reference :2085-2132)
    """
    latents = batch["latents"]
    b = latents.shape[0]
    keys = jax.random.split(key, 6)

    t = jax.random.randint(keys[0], (b,), 0, sched["num_train_timesteps"])
    noise = jax.random.normal(keys[1], latents.shape, latents.dtype)
    noisy = add_noise(sched, latents, noise, t)

    pred = unet_apply(params, unet_cfg, noisy, t,
                      (batch["ctx"], batch["ctx_content"],
                       batch["ctx_style"]),
                      batch["pooled"], batch["time_ids"], mode="both",
                      state=lora_state, impl=impl, remat=remat)
    rec = jnp.mean((pred.astype(jnp.float32)
                    - noise.astype(jnp.float32)) ** 2)
    loss = rec

    sim = _similarity_loss(params, lora_state, lora_paths)
    loss = loss + jnp.where(orth_on, similarity_lambda * sim, 0.0)

    aux = {"loss_rec": rec, "loss_sim": sim}

    # dual prior preservation: separate forwards in content / style mode
    for bi, (branch, weight) in enumerate((("content", prior_weight),
                                           ("style", prior_weight_2))):
        prior = batch.get(f"prior_{branch}")
        if prior is None or weight == 0.0:
            continue
        pb = prior["latents"].shape[0]
        # independent (t, noise) draws per prior branch — sharing keys
        # would evaluate both regularizers at perfectly correlated noise
        pt = jax.random.randint(keys[2 + 2 * bi], (pb,), 0,
                                sched["num_train_timesteps"])
        pnoise = jax.random.normal(keys[3 + 2 * bi],
                                   prior["latents"].shape,
                                   prior["latents"].dtype)
        pnoisy = add_noise(sched, prior["latents"], pnoise, pt)
        ppred = unet_apply(params, unet_cfg, pnoisy, pt,
                           (prior["ctx"], None, None), prior["pooled"],
                           prior["time_ids"], mode=branch, state=lora_state,
                           impl=impl, remat=remat)
        ploss = jnp.mean((ppred.astype(jnp.float32)
                          - pnoise.astype(jnp.float32)) ** 2)
        loss = loss + weight * ploss
        aux[f"loss_prior_{branch}"] = ploss

    return loss, aux


# ---------------------------------------------------------------------------
# Column-separation schedule (pure)
# ---------------------------------------------------------------------------

def _phase(step, cfg: ColumnSepConfig):
    ss = cfg.sampled_steps
    ne = cfg.steps_per_epoch
    in_tail = step >= cfg.sample_times * ss
    pos = step % ss
    is_reset = jnp.logical_and(pos == 0, ~in_tail)
    in_sampling = jnp.logical_and(jnp.logical_and(pos < ne, ~is_reset),
                                  ~in_tail)
    at_select = jnp.logical_and(
        jnp.logical_and(pos >= ne, (step - ne) % ss == 0), ~in_tail)
    # 'sampling' gates no behavior itself (merger freezing across the
    # window is carried by the merger_on flag set at reset) — it is
    # returned for metrics/phase logging only; the reference's sampling
    # branch holds only the dead --with_accumulate_cone path
    # (train_unziplora.py:2152-2157, overwritten at selection).
    zeroout = ~in_tail & ~is_reset & ~in_sampling & ~at_select
    return {"tail": in_tail, "reset": is_reset, "sampling": in_sampling,
            "select": at_select, "zeroout": zeroout}


def column_sep_update(lora_state, params, grads, step,
                      cfg: ColumnSepConfig, assignments: Dict):
    """One schedule transition; returns (new_lora_state, merger_grad_gates,
    phase_dict).

    merger_grad_gates: pytree of per-path (L, out) multiplicative gates to
    apply to THIS step's merger grads (the reference's set_gradient_mask /
    lora_gradient_zeroout, unziplora_linear_layer.py:147-170).

    The cone + top-k selection math materializes an (L, d_in, d_out) cone
    per projection — roughly a dense-weight-gradient's worth of compute —
    so it lives under lax.cond and only executes at the sample_times
    selection steps, not every step.
    """
    ph = _phase(step, cfg)
    paths = list(assignments.keys())

    def compute_selection(_):
        out = {}
        for path in paths:
            label = assignments[path]
            lp = tree_get(params, path)["lora"]
            lg = tree_get(grads, path)["lora"]
            st = tree_get(lora_state, path)
            # At selection the reference's mergers are frozen (they were
            # requires_grad=False'd at the sampling reset,
            # train_unziplora.py:2146-2148), so merge_matrix.grad is
            # None/zero and get_unziplora_cone's merger term
            # (unziplora_linear_layer.py:127-141) contributes NOTHING in
            # every live call. Functional grads always exist here, so
            # zero them explicitly — otherwise the cone gains a live
            # w*g_merge term the reference never has, skewing which
            # columns cross the sparsity threshold.
            lg = {**lg,
                  "merge_content": jnp.zeros_like(lg["merge_content"]),
                  "merge_style": jnp.zeros_like(lg["merge_style"])}

            # cone column scores from this step's grads (select-time,
            # accumulate=False semantics: overwrite, reference
            # unziplora_linear_layer.py:144-146)
            score_c = jax.vmap(
                lambda p, g: cone_columns(p, g, "content"))(lp, lg)
            score_s = jax.vmap(
                lambda p, g: cone_columns(p, g, "style"))(lp, lg)

            if label == "both":
                sel = jax.vmap(functools.partial(
                    select_columns, ratio=cfg.column_ratio,
                    avoid=cfg.avoid))
                mask_c, mask_s = sel(score_c, score_s,
                                     st["mask_content"], st["mask_style"])
            elif label == "style":
                sel = jax.vmap(functools.partial(
                    select_columns, ratio=cfg.column_ratio, avoid=False))
                _, mask_s = sel(score_c, score_s, st["mask_content"],
                                st["mask_style"])
                mask_c = jnp.ones_like(st["mask_content"])
            else:  # 'content'
                sel = jax.vmap(functools.partial(
                    select_columns, ratio=cfg.column_ratio, avoid=False))
                mask_c, _ = sel(score_c, score_s, st["mask_content"],
                                st["mask_style"])
                mask_s = jnp.ones_like(st["mask_style"])
            out[path] = (score_c, score_s, mask_c, mask_s)
        return out

    def keep_current(_):
        out = {}
        for path in paths:
            st = tree_get(lora_state, path)
            out[path] = (st["score_content"], st["score_style"],
                         st["mask_content"], st["mask_style"])
        return out

    selected = jax.lax.cond(ph["select"], compute_selection, keep_current,
                            None)

    new_state = lora_state
    gates = {}
    for path in paths:
        st = tree_get(lora_state, path)
        n_layers = st["use_mask_content"].shape[0]
        score_c, score_s, mask_c, mask_s = selected[path]
        st2 = dict(st)
        st2["score_content"] = score_c
        st2["score_style"] = score_s
        st2["mask_content"] = mask_c
        st2["mask_style"] = mask_s
        flags_on = jnp.broadcast_to(ph["select"], (n_layers,))
        flags_off = jnp.broadcast_to(ph["reset"], (n_layers,))
        st2["use_mask_content"] = (st["use_mask_content"] | flags_on) \
            & ~flags_off
        st2["use_mask_style"] = (st["use_mask_style"] | flags_on) \
            & ~flags_off
        new_state = tree_set(new_state, path, st2)

        # merger gradient gate for THIS step (zero-out phases only):
        # finetune_mask: per-branch mask; else the overlap (reference
        # set_gradient_mask, :156-167)
        overlap = st["mask_content"] & st["mask_style"]
        gate_c = jnp.where(cfg.finetune_mask, st["mask_content"], overlap)
        gate_s = jnp.where(cfg.finetune_mask, st["mask_style"], overlap)
        apply_gate = ph["zeroout"] | ph["tail"]
        gates[path] = (
            jnp.where(apply_gate, gate_c.astype(jnp.float32), 1.0),
            jnp.where(apply_gate, gate_s.astype(jnp.float32), 1.0))

    return new_state, gates, ph


def apply_schedule_flags(state: Stage1State, ph) -> Tuple:
    """orth_on / merger_on transitions: reset turns them off, select turns
    them on, otherwise carry (reference :2146-2171)."""
    orth_on = jnp.where(ph["select"], True,
                        jnp.where(ph["reset"], False, state.orth_on))
    merger_on = jnp.where(ph["select"], True,
                          jnp.where(ph["reset"], False, state.merger_on))
    return orth_on, merger_on


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------

def clamp_mergers(params, lora_paths):
    """Mergers live in [0, 1] (reference clamp_merger,
    unziplora_linear_layer.py:72-75, applied every step :2178-2181)."""
    out = params
    for path in lora_paths:
        lp = tree_get(out, path)["lora"]
        lp = dict(lp)
        lp["merge_content"] = jnp.clip(lp["merge_content"], 0.0, 1.0)
        lp["merge_style"] = jnp.clip(lp["merge_style"], 0.0, 1.0)
        out = tree_set(out, path + ("lora",), lp)
    return out


def lora_proj_paths(params):
    return [p + (proj,) for p in iter_spatial_attention_paths(params)
            for proj in PROJS if "lora" in tree_get(params, p)[proj]]


def trainable_mask(params):
    """True for every LoRA leaf (content/style branches + mergers) —
    the param_labels 'frozen' complement."""
    return jax.tree.map(lambda lbl: lbl != "frozen", param_labels(params))


def make_train_step(unet_cfg: UNetConfig, sched, optimizer, *,
                    sep_cfg: ColumnSepConfig, assignments: Dict,
                    similarity_lambda: float = 0.5,
                    prior_weight: float = 0.0, prior_weight_2: float = 0.0,
                    impl: str = "auto", remat: bool = True, mask=None,
                    grad_accum: int = 1):
    """When ``mask`` (trainable_mask) is given, the backward runs
    w.r.t. the LoRA leaves only: frozen leaves are stop-gradiented so
    the full-SDXL frozen-gradient tree (~5.2 GB bf16, ~10.4 GB for the
    reference's fp32 stage-1 recipe) never materializes. Frozen grads
    re-enter the optimizer as symbolic zeros, which set_to_zero ignores
    and XLA folds.

    grad_accum > 1 (--gradient_accumulation_steps): every batch leaf
    carries a leading (A,) micro-batch axis; a lax.scan runs the
    forward/backward per micro-batch and averages losses and gradients
    — matching Accelerate's accumulate() (loss / A per micro step,
    grads summed into .grad, one optimizer step at the boundary;
    reference train_unziplora.py:2010,2134). The scan carry holds only
    the TRAINABLE gradient leaves, so the frozen tree still never
    materializes. The cone machine consumes the accumulated grads, as
    the reference's does (it reads .grad after the last micro-step)."""
    def step_fn(state: Stage1State, batch, key):
        paths = list(assignments.keys())

        def _loss(p, b, k):
            return stage1_loss(
                p, unet_cfg, sched, b, k,
                lora_state=state.lora_state, lora_paths=paths,
                orth_on=state.orth_on,
                similarity_lambda=similarity_lambda,
                prior_weight=prior_weight, prior_weight_2=prior_weight_2,
                impl=impl, remat=remat)

        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        if mask is None:
            mleaves = [True] * len(leaves)
        else:
            mleaves = jax.tree_util.tree_leaves(mask)
        train_leaves = [l for l, m in zip(leaves, mleaves) if m]

        def grads_of(b, k):
            """((loss, aux), trainable-grads-list) for one micro-batch."""
            def loss_fn(train_list):
                it = iter(train_list)
                full = [next(it) if m else jax.lax.stop_gradient(l)
                        for l, m in zip(leaves, mleaves)]
                return _loss(jax.tree_util.tree_unflatten(treedef, full),
                             b, k)
            return jax.value_and_grad(loss_fn, has_aux=True)(train_leaves)

        if grad_accum <= 1:
            (loss, aux), gtrain = grads_of(batch, key)
        else:
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
        gfull = [next(it) if m else jnp.zeros_like(l)
                 for l, m in zip(leaves, mleaves)]
        grads = jax.tree_util.tree_unflatten(treedef, gfull)

        if sep_cfg.enabled:
            new_lora_state, gates, ph = column_sep_update(
                state.lora_state, state.params, grads, state.step, sep_cfg,
                assignments)
            orth_on, merger_on = apply_schedule_flags(state, ph)
        else:
            new_lora_state, gates, orth_on, merger_on = (
                state.lora_state, None, state.orth_on, state.merger_on)

        # merger gating: frozen during sampling (merger_on False at THIS
        # step's forward), plus column gates in zero-out phases. Gate both
        # the grads (keeps Adam moments clean) AND the updates (a frozen
        # torch param gets no Adam-momentum/weight-decay movement either —
        # its grad is None and torch skips it).
        def gate_mergers(g):
            for path in paths:
                gl = tree_get(g, path)["lora"]
                gl = dict(gl)
                scale = state.merger_on.astype(jnp.float32)
                gc = gl["merge_content"] * scale
                gs = gl["merge_style"] * scale
                if gates is not None:
                    gc = gc * gates[path][0]
                    gs = gs * gates[path][1]
                gl["merge_content"] = gc
                gl["merge_style"] = gs
                g = tree_set(g, path + ("lora",), gl)
            return g

        grads = gate_mergers(grads)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        updates = gate_mergers(updates)
        params = optax.apply_updates(state.params, updates)
        params = clamp_mergers(params, paths)

        new_state = Stage1State(params, opt_state, new_lora_state,
                                orth_on, merger_on, state.step + 1)
        return new_state, {"loss": loss, **aux}

    return step_fn


def init_state(params, lora_state, optimizer, *,
               orth_on: bool = False) -> Stage1State:
    """orth_on starts False and only flips on at a column-selection step
    (reference with_orthognal init, train_unziplora.py:1850) — without
    the periodic column separation the similarity loss never engages,
    exactly as in the reference. Pass orth_on=True to force it."""
    return Stage1State(params, optimizer.init(params), lora_state,
                       jnp.asarray(orth_on), jnp.asarray(True),
                       jnp.asarray(0))
