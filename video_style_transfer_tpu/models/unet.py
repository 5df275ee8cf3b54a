"""SDXL UNet2DCondition — functional, NHWC, motion-module-ready.

Re-design of the reference's subclass tower (unet_2d_condition.py:37-655,
unet_block.py:461-924) as one init/apply pair over a params pytree whose
keys mirror diffusers module paths (down_blocks.N.attentions.M...), making
checkpoint interop mechanical.

The triple encoder-hidden-states threading (combined/content/style,
reference unet_2d_condition.py:353-368, :552-632) is an explicit ``ctx``
tuple; the forward_type switch is the static ``mode``; AnimateDiff motion
modules (reference: diffusers UNetMotionModel assembled by
animatediff/utils.py:13-53) are first-class sub-modules gated by
``cfg.use_motion_modules``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.config import CROSS, DOWN, UP, UNetConfig
from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.models.embeddings import (
    init_timestep_embedding, sdxl_add_embedding, sinusoidal_embedding,
    timestep_embedding)
from video_style_transfer_tpu.models.motion import (
    init_motion_module, motion_module)
from video_style_transfer_tpu.models.resnet import (
    downsample, init_downsample, init_resnet_block, init_upsample,
    resnet_block, upsample)
from video_style_transfer_tpu.models.transformer import (
    init_transformer_2d, transformer_2d)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_unet(key, cfg: UNetConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4096))
    nxt = lambda: next(keys)  # noqa: E731
    ch = cfg.block_out_channels
    temb_dim = cfg.time_embed_dim

    p = {
        "conv_in": layers.init_conv(nxt(), cfg.in_channels, ch[0], 3,
                                    dtype=dtype),
        "time_embedding": init_timestep_embedding(nxt(), ch[0], temb_dim,
                                                  dtype=dtype),
        "add_embedding": init_timestep_embedding(
            nxt(), cfg.projection_class_embeddings_input_dim, temb_dim,
            dtype=dtype),
    }

    def motion(channels):
        return init_motion_module(
            nxt(), channels,
            num_layers=cfg.motion_transformer_layers_per_block,
            heads=cfg.motion_num_attention_heads,
            norm_num_groups=cfg.norm_num_groups, dtype=dtype)

    # --- down blocks -------------------------------------------------------
    down_blocks = []
    out_c = ch[0]
    for i, btype in enumerate(cfg.down_block_types):
        in_c, out_c = out_c, ch[i]
        block = {"resnets": [], "attentions": [], "motion_modules": []}
        for j in range(cfg.layers_per_block):
            block["resnets"].append(init_resnet_block(
                nxt(), in_c if j == 0 else out_c, out_c,
                temb_channels=temb_dim, dtype=dtype))
            if btype == CROSS:
                block["attentions"].append(init_transformer_2d(
                    nxt(), out_c,
                    num_layers=cfg.transformer_layers_per_block[i],
                    heads=cfg.num_attention_heads[i],
                    cross_attention_dim=cfg.cross_attention_dim,
                    norm_num_groups=cfg.norm_num_groups, dtype=dtype))
            if cfg.use_motion_modules:
                block["motion_modules"].append(motion(out_c))
        if i < len(cfg.down_block_types) - 1:
            block["downsamplers"] = [init_downsample(nxt(), out_c,
                                                     dtype=dtype)]
        down_blocks.append(block)
    p["down_blocks"] = down_blocks

    # --- mid ---------------------------------------------------------------
    mid_c = ch[-1]
    p["mid_block"] = {
        "resnets": [
            init_resnet_block(nxt(), mid_c, mid_c, temb_channels=temb_dim,
                              dtype=dtype),
            init_resnet_block(nxt(), mid_c, mid_c, temb_channels=temb_dim,
                              dtype=dtype),
        ],
        "attentions": [init_transformer_2d(
            nxt(), mid_c,
            num_layers=cfg.transformer_layers_per_block[-1],
            heads=cfg.num_attention_heads[-1],
            cross_attention_dim=cfg.cross_attention_dim,
            norm_num_groups=cfg.norm_num_groups, dtype=dtype)],
    }
    if cfg.use_motion_modules and cfg.motion_mid_block:
        p["mid_block"]["motion_modules"] = [motion(mid_c)]

    # --- up blocks ---------------------------------------------------------
    # Simulate the down-path skip-channel stack to size up-resnet inputs.
    skip_channels = [ch[0]]
    c = ch[0]
    for i in range(len(cfg.down_block_types)):
        c = ch[i]
        skip_channels += [c] * cfg.layers_per_block
        if i < len(cfg.down_block_types) - 1:
            skip_channels.append(c)

    up_blocks = []
    rev_ch = list(reversed(ch))
    cur = mid_c
    for i, btype in enumerate(cfg.up_block_types):
        out_c = rev_ch[i]
        tf_idx = len(ch) - 1 - i
        block = {"resnets": [], "attentions": [], "motion_modules": []}
        for j in range(cfg.layers_per_block + 1):
            skip_c = skip_channels.pop()
            block["resnets"].append(init_resnet_block(
                nxt(), cur + skip_c, out_c, temb_channels=temb_dim,
                dtype=dtype))
            cur = out_c
            if btype == CROSS:
                block["attentions"].append(init_transformer_2d(
                    nxt(), out_c,
                    num_layers=cfg.transformer_layers_per_block[tf_idx],
                    heads=cfg.num_attention_heads[tf_idx],
                    cross_attention_dim=cfg.cross_attention_dim,
                    norm_num_groups=cfg.norm_num_groups, dtype=dtype))
            if cfg.use_motion_modules:
                block["motion_modules"].append(motion(out_c))
        if i < len(cfg.up_block_types) - 1:
            block["upsamplers"] = [init_upsample(nxt(), out_c, dtype=dtype)]
        up_blocks.append(block)
    p["up_blocks"] = up_blocks

    p["conv_norm_out"] = layers.init_group_norm(ch[0], dtype)
    p["conv_out"] = layers.init_conv(nxt(), ch[0], cfg.out_channels, 3,
                                     dtype=dtype)
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _sub(state, *path):
    """Safely index a (possibly missing) mirrored state tree. State trees
    use dicts throughout (integer indices as dict keys)."""
    cur = state
    for k in path:
        if cur is None:
            return None
        if isinstance(cur, dict):
            cur = cur.get(k)
        elif isinstance(cur, (list, tuple)) and isinstance(k, int) \
                and k < len(cur):
            cur = cur[k]
        else:
            return None
    return cur


def precompute_cross_kv(params, cfg: UNetConfig, ctx: Tuple, *,
                        mode: str = "base", state=None, dtype=None,
                        num_frames: int = 1):
    """Evaluate every cross-attention's k/v projections of the prompt
    embeddings once. The result is loop-invariant across denoise steps —
    pipelines compute it before the sampling scan and pass it to
    `unet_apply(cross_kv=...)`, removing ~140 (video) to ~1000+ (image,
    triple-prompt with live LoRA branches) tiny latency-bound matmuls
    from every step. ctx: (combined, content, style), each
    (B, S, cross_attention_dim) — NOT frame-repeated; pass num_frames to
    bake the frame repeat into the cache too (a one-time ~0.7 GB at the
    16-frame CFG-pair video shape; repeating per step instead measured
    ~60 ms/step of copies)."""
    from video_style_transfer_tpu.models.transformer import (
        transformer_2d_cross_kv)
    if dtype is not None:
        ctx = tuple(None if e is None else e.astype(dtype) for e in ctx)
    if num_frames > 1:
        ctx = tuple(None if e is None
                    else jnp.repeat(e, num_frames, axis=0) for e in ctx)

    cache = {"down_blocks": {}, "mid_block": {}, "up_blocks": {}}
    for path, types in (("down_blocks", cfg.down_block_types),
                        ("up_blocks", cfg.up_block_types)):
        for i, block in enumerate(params[path]):
            if types[i] != CROSS:
                continue
            ent = {}
            for j, ap in enumerate(block["attentions"]):
                ent[j] = transformer_2d_cross_kv(
                    ap, ctx, mode=mode,
                    state=_sub(state, path, i, "attentions", j))
            cache[path][i] = {"attentions": ent}
    cache["mid_block"] = {"attentions": {0: transformer_2d_cross_kv(
        params["mid_block"]["attentions"][0], ctx, mode=mode,
        state=_sub(state, "mid_block", "attentions", 0))}}
    return cache


def unet_apply(params, cfg: UNetConfig, sample, timesteps, ctx: Tuple,
               pooled_text, time_ids, *, mode: str = "base", state=None,
               num_frames: int = 1, impl: str = "auto", remat=False,
               cross_kv=None):
    """Denoiser forward.

    sample:      (N, H, W, C_in), N = batch * num_frames
    timesteps:   scalar or (B,)
    ctx:         (combined, content, style) prompt embeddings, each
                 (B, S, cross_attention_dim); content/style may be None
    pooled_text: (B, pooled_dim)  — SDXL text_embeds added conditioning
    time_ids:    (B, 6)           — SDXL micro-conditioning ids
    cross_kv:    optional precompute_cross_kv output — serving paths pass
                 it to skip the per-step prompt projections
    """
    n = sample.shape[0]
    b = n // num_frames
    dt = sample.dtype

    # ---- time + added conditioning (fp32 math, cast at use) --------------
    ts = jnp.asarray(timesteps)
    if ts.ndim == 0:
        ts = jnp.full((b,), ts)
    t_emb = sinusoidal_embedding(ts, cfg.block_out_channels[0],
                                 flip_sin_to_cos=cfg.flip_sin_to_cos,
                                 freq_shift=cfg.freq_shift)
    emb = timestep_embedding(params["time_embedding"], t_emb)
    emb = emb + sdxl_add_embedding(
        params["add_embedding"], pooled_text, time_ids,
        addition_time_embed_dim=cfg.addition_time_embed_dim,
        flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift)
    if num_frames > 1:
        emb = jnp.repeat(emb, num_frames, axis=0)
    emb = emb.astype(dt)

    # ---- broadcast prompt ctx over frames --------------------------------
    def _rep(e):
        if e is None:
            return None
        if e.shape[0] != n:
            e = jnp.repeat(e, num_frames, axis=0)
        return e.astype(dt)

    if cross_kv is None:
        ctx = tuple(_rep(e) for e in ctx)
    else:
        # every cross-attention reads the precomputed kv; queries regroup
        # per sample instead of repeating ctx over frames
        ctx = None

    groups = cfg.norm_num_groups
    motion_on = cfg.use_motion_modules and num_frames > 1

    # Remat policy: False = none (serving); True = inner scan-body remat
    # only (transformer/motion blocks — stage-1's memory fits with this
    # and it avoids ~30% resnet/GN recompute); "component" = additionally
    # checkpoint every component at the unet level so ONLY the
    # inter-component hidden states are stored. Component internals
    # (each resnet's GN/silu/conv temps, each motion module's
    # norm/proj_in/proj_out at the 16384-token level-0 shapes) cost
    # multi-GB of HLO temps at 8f@1024^2 — with the diffusers-layout
    # double-attn motion blocks that pushed the stage-2 step past 16 GB
    # HBM. Inner remats stay on under "component", bounding backward
    # replay memory to one block at a time.
    component = remat in ("component", "component_lite", "component_lite1")
    inner = bool(remat)
    # "component_lite": store (don't checkpoint) LEVEL-2 components —
    # they are the FLOP-dominant part of the backward replay (10-layer
    # 1280ch transformer stacks) while their internals are the cheapest
    # to store (~2 GB at the stage-2 8f@1024^2 shape, which fits the
    # post-"component" headroom). Levels 0-1 keep the full component
    # checkpoint. "component_lite1" additionally stores the level-1
    # components (their scanned transformer internals keep the inner
    # remat, so the addition is bounded by the per-layer scan carries).
    # Thresholds are RELATIVE to the input sample's spatial area (level
    # k sits at area/4^k), so the level split tracks the training
    # resolution instead of hard-coding the 1024^2-measured sizes.
    in_area = sample.shape[-3] * sample.shape[-2]
    lite_area = {"component_lite": in_area // 16,
                 "component_lite1": in_area // 4}.get(remat, 0)

    def _stored(h):
        return component and h.shape[-3] * h.shape[-2] <= lite_area

    def _motion_raw(mm, h):
        return motion_module(
            mm, h, num_frames=num_frames,
            heads=cfg.motion_num_attention_heads,
            norm_num_groups=groups,
            max_seq_length=cfg.motion_max_seq_length, impl=impl,
            remat=inner)

    _motion_c = jax.checkpoint(_motion_raw) if component else _motion_raw

    def run_motion(mm, h):
        return (_motion_raw if _stored(h) else _motion_c)(mm, h)

    _resnet_raw = functools.partial(resnet_block, num_groups=groups,
                                    eps=cfg.norm_eps)
    _resnet_c = jax.checkpoint(_resnet_raw) if component else _resnet_raw

    def _resnet(rp, h, emb):
        return (_resnet_raw if _stored(h) else _resnet_c)(rp, h, emb)

    def _attn_raw(ap, h, ctx, st, kv, heads):
        return transformer_2d(ap, h, ctx, heads=heads,
                              norm_num_groups=groups, mode=mode, state=st,
                              impl=impl, remat=inner, cross_kv=kv)

    _attn_c = (jax.checkpoint(_attn_raw, static_argnums=(5,)) if component
               else _attn_raw)

    def _attn(ap, h, ctx, st, kv, heads):
        return (_attn_raw if _stored(h) else _attn_c)(
            ap, h, ctx, st, kv, heads)

    # ---- down path --------------------------------------------------------
    h = layers.conv2d(params["conv_in"], sample)
    skips = [h]
    for i, block in enumerate(params["down_blocks"]):
        btype = cfg.down_block_types[i]
        tf_idx = i
        for j, rp in enumerate(block["resnets"]):
            h = _resnet(rp, h, emb)
            if btype == CROSS:
                h = _attn(block["attentions"][j], h, ctx,
                          _sub(state, "down_blocks", i, "attentions", j),
                          _sub(cross_kv, "down_blocks", i, "attentions", j),
                          cfg.num_attention_heads[tf_idx])
            if motion_on and block.get("motion_modules"):
                h = run_motion(block["motion_modules"][j], h)
            skips.append(h)
        if "downsamplers" in block:
            h = downsample(block["downsamplers"][0], h)
            skips.append(h)

    # ---- mid --------------------------------------------------------------
    mid = params["mid_block"]
    h = _resnet(mid["resnets"][0], h, emb)
    h = _attn(mid["attentions"][0], h, ctx,
              _sub(state, "mid_block", "attentions", 0),
              _sub(cross_kv, "mid_block", "attentions", 0),
              cfg.num_attention_heads[-1])
    if motion_on and mid.get("motion_modules"):
        h = run_motion(mid["motion_modules"][0], h)
    h = _resnet(mid["resnets"][1], h, emb)

    # ---- up path -----------------------------------------------------------
    for i, block in enumerate(params["up_blocks"]):
        btype = cfg.up_block_types[i]
        tf_idx = len(cfg.block_out_channels) - 1 - i
        for j, rp in enumerate(block["resnets"]):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(rp, h, emb)
            if btype == CROSS:
                h = _attn(block["attentions"][j], h, ctx,
                          _sub(state, "up_blocks", i, "attentions", j),
                          _sub(cross_kv, "up_blocks", i, "attentions", j),
                          cfg.num_attention_heads[tf_idx])
            if motion_on and block.get("motion_modules"):
                h = run_motion(block["motion_modules"][j], h)
        if "upsamplers" in block:
            h = upsample(block["upsamplers"][0], h)

    # ---- out ---------------------------------------------------------------
    h = layers.group_norm(params["conv_norm_out"], h, num_groups=groups,
                          eps=cfg.norm_eps)
    h = layers.silu(h)
    return layers.conv2d(params["conv_out"], h)
