"""Multi-head attention with UnZipLoRA triple-stream projections.

Functional replacement for the reference's Attention subclass + processor
classes (unzip_attention_processor.py:25-181, :664-759). The reference
routes content/style hidden states through dual-input LoRACompatibleLinear
wrappers; here each projection is `dual_linear` over a params dict that may
carry a 'lora' (UnZipLoRA) or 'tlora' (temporal LoRA) entry, and the
"processor" logic is one pure function.

Threading semantics (reference AttnProcessor2_0, :707-749):
  - q and out projections: content/style streams = the hidden states
  - self-attention k/v:   content/style streams = the hidden states
  - cross-attention k/v:  the three separately-encoded prompt embeddings
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.lora.unzip import dual_linear
from video_style_transfer_tpu.lora.temporal import apply_temporal_lora
from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.ops.attention import (
    merge_heads, sdpa, sdpa_fused_qkv, split_heads)


def init_attention(key, query_dim: int, *, heads: int,
                   dim_head: Optional[int] = None,
                   cross_attention_dim: Optional[int] = None,
                   out_bias: bool = True, qkv_bias: bool = False,
                   dtype=jnp.float32):
    if dim_head is None:
        dim_head = query_dim // heads
    inner = heads * dim_head
    kv_dim = cross_attention_dim or query_dim
    kq, kk, kv, ko = jax.random.split(key, 4)
    # UNet attention runs bias-free q/k/v (diffusers default); the VAE
    # mid-block Attention carries q/k/v biases (diffusers AutoencoderKL)
    return {
        "to_q": layers.init_linear(kq, query_dim, inner, bias=qkv_bias,
                                   dtype=dtype),
        "to_k": layers.init_linear(kk, kv_dim, inner, bias=qkv_bias,
                                   dtype=dtype),
        "to_v": layers.init_linear(kv, kv_dim, inner, bias=qkv_bias,
                                   dtype=dtype),
        "to_out": layers.init_linear(ko, inner, query_dim, bias=out_bias,
                                     dtype=dtype),
    }


def _proj(p, st, name, x, x_c, x_s, mode):
    sub = None if st is None else st.get(name)
    y = dual_linear(p[name], x, x_c, x_s, mode=mode, state=sub)
    if "tlora" in p[name]:
        y = y + apply_temporal_lora(p[name]["tlora"], x)
    return y


def _plain(pp) -> bool:
    return "lora" not in pp and "tlora" not in pp


def attention(p, x, ctx: Optional[Tuple] = None, *, heads: int,
              mode: str = "base", state=None, impl: str = "auto",
              kv: Optional[Tuple] = None):
    """x: (N, S, C). ctx: None for self-attention, or a
    (combined, content, style) tuple of encoder states for cross-attention
    (content/style may be None -> fall back to combined).

    kv: optional precomputed (k, v) pair, each (Bk, Sk, inner) — the
    cross-attention projections of the prompt embeddings, which are
    loop-invariant across denoise steps (see precompute_cross_kv in
    models/unet.py). When given, the k/v projections (and their LoRA
    branches) are skipped entirely. Bk may be smaller than N by an
    integer frame-replication factor: kv rows are then repeated per
    frame (a ~77-token broadcast — cheap, and it keeps cross-attention
    frame-local so the frame-sharded mesh serving path stays
    collective-free)."""
    if kv is not None:
        q = _proj(p, state, "to_q", x, x, x, mode)
        k, v = kv
        n = x.shape[0]
        if k.shape[0] != n:
            rep = n // k.shape[0]
            k = jnp.repeat(k, rep, axis=0)
            v = jnp.repeat(v, rep, axis=0)
        o = merge_heads(sdpa(split_heads(q, heads),
                             split_heads(k.astype(q.dtype), heads),
                             split_heads(v.astype(q.dtype), heads),
                             impl=impl))
        return _proj(p, state, "to_out", o, o, o, mode)
    qkv_names = ("to_q", "to_k", "to_v")
    if ctx is None and all(_plain(p[n]) for n in qkv_names):
        # fused q/k/v projection: one (C, 3*inner) matmul replaces three
        # — the folded serving path (lora/surgery.fold_unziplora) hits
        # this on every self-attention. Concatenating the kernels is a
        # 3x-kernel-size copy, negligible next to the activation matmul,
        # and the split result is bitwise identical to separate dots
        # (matmul columns are independent).
        w = jnp.concatenate([p[n]["kernel"].astype(x.dtype)
                             for n in qkv_names], axis=1)
        qkv = jnp.dot(x, w)
        if any("bias" in p[n] for n in qkv_names):
            inner = p["to_q"]["kernel"].shape[1]
            qkv = qkv + jnp.concatenate(
                [p[n].get("bias",
                          jnp.zeros((inner,), x.dtype)).astype(qkv.dtype)
                 for n in qkv_names])
        # the flash kernel consumes the fused array in place (three
        # lane-group index maps) — splitting it here cost ~64 ms/step of
        # pure copies in the full-scale denoise profile
        o = sdpa_fused_qkv(qkv, heads, impl=impl)
        return _proj(p, state, "to_out", o, o, o, mode)
    else:
        q = _proj(p, state, "to_q", x, x, x, mode)
        if ctx is None:
            c = c_c = c_s = x
        else:
            c, c_c, c_s = ctx
            c_c = c if c_c is None else c_c
            c_s = c if c_s is None else c_s
        k = _proj(p, state, "to_k", c, c_c, c_s, mode)
        v = _proj(p, state, "to_v", c, c_c, c_s, mode)

    q = split_heads(q, heads)
    k = split_heads(k, heads)
    v = split_heads(v, heads)
    o = merge_heads(sdpa(q, k, v, impl=impl))
    return _proj(p, state, "to_out", o, o, o, mode)


def cross_attention_kv(p, ctx: Tuple, *, mode: str = "base", state=None):
    """Project the prompt embeddings through one cross-attention's k/v
    (including any LoRA branches) — the denoise-loop-invariant part of
    `attention`. Returns (k, v), each (B, Sk, inner)."""
    c, c_c, c_s = ctx
    c_c = c if c_c is None else c_c
    c_s = c if c_s is None else c_s
    k = _proj(p, state, "to_k", c, c_c, c_s, mode)
    v = _proj(p, state, "to_v", c, c_c, c_s, mode)
    return k, v


def init_feed_forward(key, dim: int, *, mult: int = 4, dtype=jnp.float32):
    """GEGLU MLP (diffusers FeedForward with GEGLU activation)."""
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        "proj": layers.init_linear(k1, dim, inner * 2, dtype=dtype),
        "out": layers.init_linear(k2, inner, dim, dtype=dtype),
    }


def feed_forward(p, x):
    from video_style_transfer_tpu.ops.geglu import geglu_projection
    from video_style_transfer_tpu.parallel.mesh import rowsharded_kernel
    # per-token MLP: under a mesh the Pallas kernel runs per row shard
    # (GSPMD would replicate the custom call's operands otherwise)
    h = rowsharded_kernel(
        lambda x_, w_, b_: geglu_projection(x_, w_, b_),
        x, p["proj"]["kernel"], p["proj"]["bias"])
    return layers.linear(p["out"], h)
