"""Scaled-dot-product attention dispatch.

Replaces the reference's F.scaled_dot_product_attention / xformers calls
(unzip_attention_processor.py:737-739) with TPU-native implementations:

- 'xla'    : plain dot-generals — XLA fuses softmax; optimal for the short
             cross-attn (kv=77) and temporal (F<=32) sequences.
- 'pallas' : fused flash-attention kernel (ops/flash_attention.py) for the
             long spatial self-attention sequences (up to 4096 tokens).
- 'auto'   : picks per shape.

All entry points take (B, S, H, D)-shaped q/k/v ("BSHD") and return the
same layout, which keeps the surrounding reshapes layout-friendly on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Spatial self-attention at SDXL resolutions reaches 4096 tokens; beyond
# this threshold the fused kernel beats XLA's unfused softmax-matmul chain.
_FLASH_MIN_SEQ = 1024

# Cross-attention kv (77 text tokens) is far below one flash kv-block, so
# the kernel runs latency-bound there (~3-8 ms/call, 3-4 TF/s measured at
# the serving shapes). A lane-native logits layout — (B, S, H, K) with K
# padded to the 128 lanes, softmax on the minor axis, no transposes —
# measures 0.16-0.23 ms (80-112 TF/s) at the same shapes
# (benchmarks/xattn_sweep.py). Route seq_k <= this bound there.
_SHORT_KV_MAX = 128


def sdpa_xla(q, k, v, *, scale: Optional[float] = None):
    """Reference-math attention via dot_general; fp32 softmax."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    orig_dtype = q.dtype
    # (B, S, H, D) -> (B, H, S, D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    logits = jnp.einsum("bhsd,bhtd->bhst", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", weights.astype(orig_dtype), vt,
                     preferred_element_type=jnp.float32)
    return jnp.swapaxes(out.astype(orig_dtype), 1, 2)


def sdpa_shortkv(q, k, v, *, scale: Optional[float] = None):
    """Short-kv attention in the BSHD-native (B, S, H, K) logits layout.

    Keeps q/k/v in their (B, S, H, D) layout end-to-end: the logits tensor
    puts kv on the minor (lane) axis so the fp32 softmax reduces across
    lanes, and neither einsum needs a materialized transpose. Mathematically
    identical to sdpa_xla; ~5-30x faster than the flash kernel when
    seq_k << one kv block (cross-attention's 77 text tokens).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    orig_dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqhk,bkhd->bqhd", weights.astype(orig_dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(orig_dtype)


def _sdpa_impl(q, k, v, *, impl: str):
    if impl == "pallas":
        from video_style_transfer_tpu.ops.flash_attention import flash_attention
        from video_style_transfer_tpu.parallel.mesh import rowsharded_kernel
        # batch rows are independent: under a mesh the kernel runs
        # per-shard (GSPMD cannot partition Pallas custom calls and
        # would replicate the operands otherwise)
        return rowsharded_kernel(
            lambda q_, k_, v_: flash_attention(q_, k_, v_), q, k, v,
            n_row_args=2)  # k and v are co-row-sharded with q
    if impl == "shortkv":
        return sdpa_shortkv(q, k, v)
    return sdpa_xla(q, k, v)


def sdpa(q, k, v, *, impl: str = "auto"):
    """q, k, v: (B, S, H, D). Returns (B, S, H, D)."""
    if impl == "auto":
        seq_q, seq_k = q.shape[1], k.shape[1]
        head_dim = q.shape[-1]
        on_tpu = jax.default_backend() == "tpu"
        if seq_k <= _SHORT_KV_MAX:
            # cross-attention (kv = 77 text tokens): lane-native short-kv
            # path; the flash kernel is latency-bound below one kv block
            impl = "shortkv"
        elif (on_tpu and seq_q >= _FLASH_MIN_SEQ
                and head_dim % 64 == 0 and head_dim <= 512):
            # covers UNet spatial self-attention (d=64) AND the VAE
            # mid-block attention (1 head, d=512, seq 16384 at 1024^2 —
            # the XLA path would materialize a 1 GB logits tensor per
            # frame)
            impl = "pallas"
        else:
            impl = "xla"
    return _sdpa_impl(q, k, v, impl=impl)


def sdpa_fused_qkv(qkv, num_heads: int, *, impl: str = "auto"):
    """Self-attention straight off a fused q/k/v projection.

    qkv: (B, S, 3*H*D) — one matmul's concatenated output columns —
    returns (B, S, H*D). On the flash route the kernel addresses the
    three segments of the fused array in place (no split); otherwise the
    array is split and routed through `sdpa` (identical math — matmul
    columns are independent).
    """
    b, s, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    if impl in ("auto", "pallas"):
        from video_style_transfer_tpu.ops.flash_attention import (
            flash_attention_qkv, packable_qkv)
        on_tpu = jax.default_backend() == "tpu"
        if ((impl == "pallas" or (on_tpu and s >= _FLASH_MIN_SEQ))
                and d % 64 == 0 and d <= 512 and packable_qkv(num_heads, d)):
            from video_style_transfer_tpu.parallel.mesh import \
                rowsharded_kernel
            return rowsharded_kernel(
                lambda a: flash_attention_qkv(a, num_heads), qkv)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    o = sdpa(split_heads(q, num_heads), split_heads(k, num_heads),
             split_heads(v, num_heads), impl=impl)
    return merge_heads(o)


def split_heads(x, num_heads: int):
    """(B, S, H*D) -> (B, S, H, D)"""
    b, s, hd = x.shape
    return x.reshape(b, s, num_heads, hd // num_heads)


def merge_heads(x):
    """(B, S, H, D) -> (B, S, H*D)"""
    b, s, h, d = x.shape
    return x.reshape(b, s, h * d)
