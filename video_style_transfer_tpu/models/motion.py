"""Temporal (motion) transformer modules — AnimateDiff, TPU-first.

The reference bolts diffusers' UNetMotionModel motion modules onto the
SDXL UNet at runtime (animatediff/utils.py:13-53); its from-scratch spec of
the temporal math lives in animatediff/temporal_transformer.py:79-146
(per-pixel frame-sequence self-attention with sinusoidal positional
encoding, max 32 frames). Here motion modules are first-class optional
UNet sub-modules.

Layout: video activations are (B, F, H, W, C); temporal attention reshapes
to (B*H*W, F, C) — under a mesh the frame axis is all-gathered per pixel
block, which at F<=32 is a tiny ICI transfer (SURVEY.md §5 long-context
row).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.models.attention import (
    attention, feed_forward, init_attention, init_feed_forward)
from video_style_transfer_tpu.models.embeddings import temporal_positional_encoding


def init_motion_block(key, dim: int, *, heads: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "norm1": layers.init_layer_norm(dim, dtype),
        "attn1": init_attention(k1, dim, heads=heads, dtype=dtype),
        "norm2": layers.init_layer_norm(dim, dtype),
        "ff": init_feed_forward(k2, dim, dtype=dtype),
    }


def motion_block(p, x, *, heads: int, state=None, impl: str = "auto"):
    """x: (N, F, C) — self-attention across the frame axis."""
    h = layers.layer_norm(p["norm1"], x)
    x = x + attention(p["attn1"], h, None, heads=heads, mode="base",
                      state=None, impl=impl)
    h = layers.layer_norm(p["norm2"], x)
    x = x + feed_forward(p["ff"], h)
    return x


def init_motion_module(key, in_channels: int, *, num_layers: int = 2,
                       heads: int = 8, norm_num_groups: int = 32,
                       dtype=jnp.float32):
    """'transformer_blocks' is a stacked pytree (leading num_layers axis),
    scanned at apply time — same layout as the spatial transformer."""
    k_in, k_blocks, k_out = jax.random.split(key, 3)
    block_keys = jax.random.split(k_blocks, num_layers)
    blocks = jax.vmap(
        lambda k: init_motion_block(k, in_channels, heads=heads,
                                    dtype=dtype))(block_keys)
    return {
        "norm": layers.init_group_norm(in_channels, dtype),
        "proj_in": layers.init_linear(k_in, in_channels, in_channels,
                                      dtype=dtype),
        "transformer_blocks": blocks,
        "proj_out": layers.init_linear(k_out, in_channels, in_channels,
                                       dtype=dtype),
    }


def motion_module(p, x, *, num_frames: int, heads: int, norm_num_groups: int,
                  max_seq_length: int = 32, impl: str = "auto",
                  remat: bool = False):
    """x: (B*F, H, W, C) (spatial batch layout). Returns same shape.

    Internally: (B, F, H, W, C) -> (B*H*W, F, C), add frame positional
    encoding, run temporal blocks, project back, residual-add.
    """
    bf, h, w, c = x.shape
    b = bf // num_frames
    residual = x

    y = layers.group_norm(p["norm"], x, num_groups=norm_num_groups)
    y = y.reshape(b, num_frames, h, w, c)
    # (B, F, H, W, C) -> (B, H, W, F, C) -> (B*H*W, F, C)
    y = jnp.transpose(y, (0, 2, 3, 1, 4)).reshape(b * h * w, num_frames, c)
    y = layers.linear(p["proj_in"], y)

    pe = temporal_positional_encoding(num_frames, c, max_len=max_seq_length)
    y = y + pe[None].astype(y.dtype)

    def body(y_, bp):
        return motion_block(bp, y_, heads=heads, impl=impl), None

    if remat:
        body = jax.checkpoint(body)
    y, _ = jax.lax.scan(body, y, p["transformer_blocks"])

    y = layers.linear(p["proj_out"], y)
    y = y.reshape(b, h, w, num_frames, c)
    y = jnp.transpose(y, (0, 3, 1, 2, 4)).reshape(bf, h, w, c)
    return y + residual
