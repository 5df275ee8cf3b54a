"""Full-UNet wiring oracle: unet_apply vs an independent torch mirror.

Per-layer primitives (linear/conv/GN/LN/SDPA/GEGLU) have their own torch
parity tests, but none of them would catch a *wiring* transposition in
models/unet.py — down/mid/up ordering, the skip-concat order and pop
direction, the resnet/attention/motion interleave, the time-embedding
add points, or the SDXL added-cond assembly. This file hand-writes the
diffusers SDXL block graph in torch at tiny configs, following the
*reference's* structure (unziplora_unet/unet_2d_condition.py:353-655,
unet_block.py:682-924, and diffusers UNetMotionModel for the motion
interleave), NOT models/unet.py's loops, and asserts full-forward parity.

The mirror works NCHW end to end the way diffusers does; the converter
helpers transpose the shared random-init weights (HWIO->OIHW,
(in,out)->(out,in)), so any agreement is evidence about graph shape, not
about the helpers.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from video_style_transfer_tpu.config import CROSS, DOWN, UP, UNetConfig  # noqa: E402
from video_style_transfer_tpu.models.unet import init_unet, unet_apply  # noqa: E402


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _lin(q):
    """(in, out) jax linear params -> torch (weight(out,in), bias|None)."""
    w = _t(q["kernel"]).T.contiguous()
    b = _t(q["bias"]) if "bias" in q else None
    return w, b


def L(q, x):
    w, b = _lin(q)
    return torch.nn.functional.linear(x, w, b)


def _lora_gate(lq, st, branch, with_merge):
    """Per-output-column gate of one UnZipLoRA branch, following the
    reference's materialized form (unziplora_linear_layer.py:228-262):
    merger in 'both' mode only, hard mask when active, on_* branch gate
    (infer-layer semantics :308-317)."""
    out_f = lq[f"merge_{branch}"].shape[0]
    gate = torch.ones(out_f)
    if with_merge:
        gate = gate * _t(lq[f"merge_{branch}"])
    if st is not None:
        if bool(st[f"use_mask_{branch}"]):
            gate = gate * _t(np.asarray(st[f"mask_{branch}"], np.float32))
        gate = gate * float(st[f"on_{branch}"])
    return gate


def dual_L(q, x, x_c=None, x_s=None, *, mode="base", st=None):
    """Dual-input LoRACompatibleLinear (reference lora_unzip.py:66-75 +
    unziplora_linear_layer.py:221-263): base linear on x, plus the
    content/style branches computed via the reference's MATERIALIZED
    (in,out) delta = down @ up with the column gate applied to the
    composed matrix — deliberately NOT the repo's factored rank-space
    form, so agreement is evidence about the math, not shared code."""
    y = L(q, x)
    if mode == "base" or "lora" not in q:
        return y
    lq = q["lora"]
    x_c = x if x_c is None else x_c
    x_s = x if x_s is None else x_s

    def branch(b, xin, with_merge):
        w = _t(lq[b]["down"]) @ _t(lq[b]["up"])  # composed (in, out)
        return xin @ (w * _lora_gate(lq, st, b, with_merge))

    if mode == "both":
        return y + branch("content", x_c, True) + branch("style", x_s, True)
    if mode == "content":
        return y + branch("content", x_c, False)
    if mode == "style":
        return y + branch("style", x_s, False)
    raise ValueError(mode)


def _sub(st, *keys):
    """Traverse the (dict-of-dicts, int-keyed) lora state tree; None at
    any missing level."""
    for k in keys:
        if st is None:
            return None
        st = st.get(k)
    return st


def conv(q, x, *, stride=1, padding=None):
    w = _t(q["kernel"]).permute(3, 2, 0, 1).contiguous()  # HWIO -> OIHW
    if padding is None:
        padding = w.shape[-1] // 2
    return torch.nn.functional.conv2d(x, w, _t(q["bias"]), stride=stride,
                                      padding=padding)


def gn(q, x, groups, eps):
    return torch.nn.functional.group_norm(x, groups, _t(q["scale"]),
                                          _t(q["bias"]), eps=eps)


def ln(q, x):
    return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                          _t(q["scale"]), _t(q["bias"]))


def silu(x):
    return torch.nn.functional.silu(x)


def ts_embed(t, dim):
    """diffusers get_timestep_embedding, flip_sin_to_cos=True, shift=0."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def ts_mlp(q, emb):
    """diffusers TimestepEmbedding: linear_1 -> silu -> linear_2."""
    return L(q["linear_2"], silu(L(q["linear_1"], emb)))


def sdpa_heads(h, q, kv, heads, *, kv_c=None, kv_s=None, mode="base",
               st=None):
    """Multi-head attention with torch SDPA. h: (B, S, C) queries,
    kv: (B, Sk, *) key/value source. kv_c/kv_s: the content/style k/v
    streams of the UnZipLoRA dual projections (reference
    unzip_attention_processor.py:707-725 — q and out always take the
    hidden states for all three streams; k/v take the separately-encoded
    prompts on cross-attention)."""
    g = lambda name, x, xc, xs: dual_L(  # noqa: E731
        q[name], x, xc, xs, mode=mode, st=_sub(st, name))
    qq = g("to_q", h, h, h)
    kk = g("to_k", kv, kv_c, kv_s)
    vv = g("to_v", kv, kv_c, kv_s)
    b, s, c = qq.shape
    sk = kk.shape[1]
    d = c // heads

    def sh(z, n):
        return z.reshape(b, n, heads, d).transpose(1, 2)

    o = torch.nn.functional.scaled_dot_product_attention(
        sh(qq, s), sh(kk, sk), sh(vv, sk))
    o = o.transpose(1, 2).reshape(b, s, c)
    return g("to_out", o, o, o)


def geglu_ff(q, h):
    proj = L(q["proj"], h)
    a, g = proj.chunk(2, dim=-1)
    return L(q["out"], a * torch.nn.functional.gelu(g))


def tblock(q, h, ehs, heads, *, ehs_c=None, ehs_s=None, mode="base",
           st=None):
    """diffusers BasicTransformerBlock (norm1/attn1 self, norm2/attn2
    cross over encoder_hidden_states, norm3/ff). Content/style threading
    per the reference block (unzip_attention.py:160-206): self-attention
    feeds the hidden states to all three streams, cross-attention routes
    the three separately-encoded prompts."""
    n1 = ln(q["norm1"], h)
    h = h + sdpa_heads(n1, q["attn1"], n1, heads, mode=mode,
                       st=_sub(st, "attn1"))
    h = h + sdpa_heads(ln(q["norm2"], h), q["attn2"], ehs, heads,
                       kv_c=ehs_c, kv_s=ehs_s, mode=mode,
                       st=_sub(st, "attn2"))
    h = h + geglu_ff(q["ff"], ln(q["norm3"], h))
    return h


def transformer2d(q, x, ehs, heads, groups, *, ehs_c=None, ehs_s=None,
                  mode="base", st=None):
    """diffusers Transformer2DModel, use_linear_projection=True:
    GN(eps 1e-6) -> flatten -> proj_in -> blocks -> proj_out -> +res."""
    b, c, hh, ww = x.shape
    res = x
    h = gn(q["norm"], x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = L(q["proj_in"], h)
    n_layers = jax.tree.leaves(q["transformer_blocks"])[0].shape[0]
    for k in range(n_layers):
        blk = jax.tree.map(lambda a: a[k], q["transformer_blocks"])
        blk_st = (None if st is None
                  else jax.tree.map(lambda a: a[k], st))
        h = tblock(blk, h, ehs, heads, ehs_c=ehs_c, ehs_s=ehs_s,
                   mode=mode, st=blk_st)
    h = L(q["proj_out"], h)
    return h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res


def resnet(q, x, emb, groups, eps):
    """diffusers ResnetBlock2D: GN-silu-conv1, +time_emb_proj(silu(emb)),
    GN-silu-conv2, conv_shortcut."""
    h = conv(q["conv1"], silu(gn(q["norm1"], x, groups, eps)))
    if "time_emb_proj" in q:
        h = h + L(q["time_emb_proj"], silu(emb))[:, :, None, None]
    h = conv(q["conv2"], silu(gn(q["norm2"], h, groups, eps)))
    if "conv_shortcut" in q:
        x = conv(q["conv_shortcut"], x, padding=0)
    return x + h


def motion(q, x, f, heads, groups):
    """diffusers AnimateDiffTransformer3D: frame-pooled GN(eps 1e-6) on
    the (B, C, F, H, W) layout, per-pixel frame sequences, double
    self-attention with sinusoidal PE added post-norm, GEGLU ff."""
    bf, c, hh, ww = x.shape
    b = bf // f
    res = x
    h = x.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)
    h = torch.nn.functional.group_norm(h, groups, _t(q["norm"]["scale"]),
                                       _t(q["norm"]["bias"]), eps=1e-6)
    h = h.permute(0, 3, 4, 2, 1).reshape(b * hh * ww, f, c)
    h = L(q["proj_in"], h)

    position = torch.arange(32).unsqueeze(1).float()
    div_term = torch.exp(torch.arange(0, c, 2).float()
                         * (-math.log(10000.0) / c))
    pe = torch.zeros(1, 32, c)
    pe[0, :, 0::2] = torch.sin(position * div_term)
    pe[0, :, 1::2] = torch.cos(position * div_term)[:, : c // 2]
    pe = pe[:, :f]

    n_layers = jax.tree.leaves(q["transformer_blocks"])[0].shape[0]
    for k in range(n_layers):
        blk = jax.tree.map(lambda a: a[k], q["transformer_blocks"])
        h = h + sdpa_heads(ln(blk["norm1"], h) + pe, blk["attn1"],
                           ln(blk["norm1"], h) + pe, heads)
        h = h + sdpa_heads(ln(blk["norm2"], h) + pe, blk["attn2"],
                           ln(blk["norm2"], h) + pe, heads)
        h = h + geglu_ff(blk["ff"], ln(blk["norm3"], h))

    h = L(q["proj_out"], h)
    h = h.reshape(b, hh, ww, f, c).permute(0, 3, 4, 1, 2)
    return h.reshape(bf, c, hh, ww) + res


def torch_unet(p, cfg: UNetConfig, sample, t, ehs, pooled, time_ids,
               num_frames=1, *, ehs_c=None, ehs_s=None, mode="base",
               state=None):
    """The assembled SDXL (Motion-)UNet graph in torch, written from the
    diffusers/reference structure (unet_2d_condition.py:353-655 forward
    order; unet_block.py:682-924 block internals; UNetMotionModel for
    the resnet->attn->motion interleave). ehs_c/ehs_s + mode + state
    enable the UnZipLoRA triple-prompt threading (unet_2d_condition.py
    :552-632 routes encoder_hidden_states_content/style to every
    cross-attn block)."""
    groups, eps = cfg.norm_num_groups, cfg.norm_eps
    b = time_ids.shape[0]

    # -- time + added cond (unet_2d_condition.py:482-509) --
    emb = ts_mlp(p["time_embedding"],
                 ts_embed(t.expand(b) if t.ndim == 0 else t,
                          cfg.block_out_channels[0]))
    time_embeds = ts_embed(time_ids.reshape(-1),
                           cfg.addition_time_embed_dim).reshape(b, -1)
    emb = emb + ts_mlp(p["add_embedding"],
                       torch.cat([pooled, time_embeds], dim=-1))
    if num_frames > 1:
        rep = lambda e: (None if e is None  # noqa: E731
                         else e.repeat_interleave(num_frames, dim=0))
        emb = rep(emb)
        ehs, ehs_c, ehs_s = rep(ehs), rep(ehs_c), rep(ehs_s)

    motion_on = cfg.use_motion_modules and num_frames > 1

    def t2d(q, h, heads, st):
        return transformer2d(q, h, ehs, heads, groups, ehs_c=ehs_c,
                             ehs_s=ehs_s, mode=mode, st=st)

    # -- down path --
    h = conv(p["conv_in"], sample)
    skips = [h]
    for i, block in enumerate(p["down_blocks"]):
        for j, rq in enumerate(block["resnets"]):
            h = resnet(rq, h, emb, groups, eps)
            if cfg.down_block_types[i] == CROSS:
                h = t2d(block["attentions"][j], h,
                        cfg.num_attention_heads[i],
                        _sub(state, "down_blocks", i, "attentions", j,
                             "transformer_blocks"))
            if motion_on:
                h = motion(block["motion_modules"][j], h, num_frames,
                           cfg.motion_num_attention_heads, groups)
            skips.append(h)
        if "downsamplers" in block:
            h = torch.nn.functional.pad(h, (0, 1, 0, 1))
            h = conv(block["downsamplers"][0]["conv"], h, stride=2,
                     padding=0)
            skips.append(h)

    # -- mid (resnet0 -> attn [-> motion] -> resnet1) --
    mid = p["mid_block"]
    h = resnet(mid["resnets"][0], h, emb, groups, eps)
    h = t2d(mid["attentions"][0], h, cfg.num_attention_heads[-1],
            _sub(state, "mid_block", "attentions", 0,
                 "transformer_blocks"))
    if motion_on and "motion_modules" in mid:
        h = motion(mid["motion_modules"][0], h, num_frames,
                   cfg.motion_num_attention_heads, groups)
    h = resnet(mid["resnets"][1], h, emb, groups, eps)

    # -- up path (cat([h, skip], channel) then resnet; upsample last) --
    for i, block in enumerate(p["up_blocks"]):
        for j, rq in enumerate(block["resnets"]):
            h = torch.cat([h, skips.pop()], dim=1)
            h = resnet(rq, h, emb, groups, eps)
            if cfg.up_block_types[i] == CROSS:
                h = t2d(block["attentions"][j], h,
                        cfg.num_attention_heads[len(cfg.block_out_channels)
                                                - 1 - i],
                        _sub(state, "up_blocks", i, "attentions", j,
                             "transformer_blocks"))
            if motion_on:
                h = motion(block["motion_modules"][j], h, num_frames,
                           cfg.motion_num_attention_heads, groups)
        if "upsamplers" in block:
            h = torch.nn.functional.interpolate(h, scale_factor=2,
                                                mode="nearest")
            h = conv(block["upsamplers"][0]["conv"], h)

    h = silu(gn(p["conv_norm_out"], h, groups, eps))
    return conv(p["conv_out"], h)


def _run_case(cfg: UNetConfig, *, b, f, res, seed, tol):
    params = init_unet(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    n = b * f
    sample = rng.randn(n, res, res, cfg.in_channels).astype(np.float32)
    t = np.float32(rng.randint(0, 1000))
    seq = 7
    ehs = rng.randn(b, seq, cfg.cross_attention_dim).astype(np.float32)
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
    pooled = rng.randn(b, pooled_dim).astype(np.float32)
    time_ids = rng.randint(0, 1024, size=(b, 6)).astype(np.float32)

    got = unet_apply(params, cfg, jnp.asarray(sample), jnp.asarray(t),
                     (jnp.asarray(ehs), None, None), jnp.asarray(pooled),
                     jnp.asarray(time_ids), num_frames=f, impl="xla")
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))

    with torch.no_grad():
        want = torch_unet(params, cfg,
                          _t(np.transpose(sample, (0, 3, 1, 2))),
                          torch.tensor(float(t)), _t(ehs), _t(pooled),
                          _t(time_ids), num_frames=f).numpy()
    np.testing.assert_allclose(got_nchw, want, rtol=tol, atol=tol)


def test_unet_wiring_tiny():
    """2-level tiny config (DOWN, CROSS), batch 2, no motion."""
    _run_case(UNetConfig.tiny(), b=2, f=1, res=16, seed=0, tol=2e-4)


def test_unet_wiring_sdxl_topology():
    """3-level SDXL-shaped topology: (DOWN, CROSS, CROSS) down /
    (CROSS, CROSS, UP) up, layers_per_block=2, asymmetric per-level
    transformer depth (1, 2, 2) — exercises the multi-layer lax.scan
    stacks, the skip-channel bookkeeping over 3 levels, and the
    per-level head-count indexing of the up path."""
    cfg = UNetConfig.tiny(
        block_out_channels=(32, 64, 64),
        down_block_types=(DOWN, CROSS, CROSS),
        up_block_types=(CROSS, CROSS, UP),
        layers_per_block=2,
        transformer_layers_per_block=(1, 2, 2),
        num_attention_heads=(2, 4, 4),
    )
    _run_case(cfg, b=1, f=1, res=16, seed=1, tol=2e-4)


def test_unet_wiring_motion():
    """Motion-UNet: tiny config + motion modules (incl. mid), 4 frames —
    pins the resnet->attn->motion interleave and the frame-repeat of
    emb/ehs (diffusers UNetMotionModel forward)."""
    cfg = UNetConfig.tiny(use_motion_modules=True, motion_mid_block=True,
                          motion_num_attention_heads=4)
    _run_case(cfg, b=1, f=4, res=16, seed=2, tol=3e-4)
