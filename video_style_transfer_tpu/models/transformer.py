"""Spatial transformer stack: BasicTransformerBlock + Transformer2DModel.

Functional re-design of the reference's content/style-threaded subclasses
(unzip_attention.py:14-239, transformer_2d.py:19-352): the triple encoder
states travel as an explicit ctx tuple, the forward_type switch is the
static ``mode`` argument, and activations stay NHWC.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.models.attention import (
    attention, feed_forward, init_attention, init_feed_forward)


def init_transformer_block(key, dim: int, *, heads: int,
                           cross_attention_dim: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm1": layers.init_layer_norm(dim, dtype),
        "attn1": init_attention(k1, dim, heads=heads, dtype=dtype),
        "norm2": layers.init_layer_norm(dim, dtype),
        "attn2": init_attention(k2, dim, heads=heads,
                                cross_attention_dim=cross_attention_dim,
                                dtype=dtype),
        "norm3": layers.init_layer_norm(dim, dtype),
        "ff": init_feed_forward(k3, dim, dtype=dtype),
    }


def transformer_block(p, x, ctx: Tuple, *, heads: int, mode: str = "base",
                      state=None, impl: str = "auto"):
    """x: (N, S, C); ctx: (combined, content, style) encoder states.
    Self-attn consumes the hidden states for all three streams, cross-attn
    the three prompts (reference unzip_attention.py:160-167, :199-206)."""
    st = state or {}
    h = layers.layer_norm(p["norm1"], x)
    x = x + attention(p["attn1"], h, None, heads=heads, mode=mode,
                      state=st.get("attn1"), impl=impl)
    h = layers.layer_norm(p["norm2"], x)
    x = x + attention(p["attn2"], h, ctx, heads=heads, mode=mode,
                      state=st.get("attn2"), impl=impl)
    h = layers.layer_norm(p["norm3"], x)
    x = x + feed_forward(p["ff"], h)
    return x


def init_transformer_2d(key, in_channels: int, *, num_layers: int,
                        heads: int, cross_attention_dim: int,
                        norm_num_groups: int = 32, dtype=jnp.float32):
    keys = jax.random.split(key, num_layers + 2)
    return {
        "norm": layers.init_group_norm(in_channels, dtype),
        "proj_in": layers.init_linear(keys[0], in_channels, in_channels,
                                      dtype=dtype),
        "transformer_blocks": [
            init_transformer_block(keys[i + 1], in_channels, heads=heads,
                                   cross_attention_dim=cross_attention_dim,
                                   dtype=dtype)
            for i in range(num_layers)
        ],
        "proj_out": layers.init_linear(keys[-1], in_channels, in_channels,
                                       dtype=dtype),
    }


def transformer_2d(p, x, ctx: Tuple, *, heads: int, norm_num_groups: int,
                   mode: str = "base", state=None, impl: str = "auto",
                   remat: bool = False):
    """x: (N, H, W, C) NHWC. use_linear_projection=True layout (SDXL)."""
    n, h, w, c = x.shape
    residual = x
    y = layers.group_norm(p["norm"], x, num_groups=norm_num_groups)
    y = y.reshape(n, h * w, c)
    y = layers.linear(p["proj_in"], y)

    st = state or {}
    st_blocks = st.get("transformer_blocks")

    for i, bp in enumerate(p["transformer_blocks"]):
        if st_blocks is None:
            bst = None
        elif isinstance(st_blocks, dict):
            bst = st_blocks.get(i)
        else:
            bst = st_blocks[i]
        fn = lambda bp_, y_, ctx_, bst_: transformer_block(  # noqa: E731
            bp_, y_, ctx_, heads=heads, mode=mode, state=bst_, impl=impl)
        if remat:
            fn = jax.checkpoint(fn)
        y = fn(bp, y, ctx, bst)

    y = layers.linear(p["proj_out"], y)
    return y.reshape(n, h, w, c) + residual
