"""ResNet blocks and resampling layers for the UNet / VAE (NHWC)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models import layers


def init_resnet_block(key, in_channels: int, out_channels: int, *,
                      temb_channels: Optional[int] = None, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": layers.init_group_norm(in_channels, dtype),
        "conv1": layers.init_conv(k1, in_channels, out_channels, 3, dtype=dtype),
        "norm2": layers.init_group_norm(out_channels, dtype),
        "conv2": layers.init_conv(k2, out_channels, out_channels, 3, dtype=dtype),
    }
    if temb_channels is not None:
        p["time_emb_proj"] = layers.init_linear(k3, temb_channels,
                                                out_channels, dtype=dtype)
    if in_channels != out_channels:
        p["conv_shortcut"] = layers.init_conv(k4, in_channels, out_channels,
                                              1, dtype=dtype)
    return p


def resnet_block(p, x, temb=None, *, num_groups: int, eps: float = 1e-5):
    """x: (N, H, W, C); temb: (N, temb_channels) or None."""
    h = layers.group_norm(p["norm1"], x, num_groups=num_groups, eps=eps)
    h = layers.silu(h)
    h = layers.conv2d(p["conv1"], h)
    if temb is not None and "time_emb_proj" in p:
        t = layers.linear(p["time_emb_proj"], layers.silu(temb))
        h = h + t[:, None, None, :].astype(h.dtype)
    h = layers.group_norm(p["norm2"], h, num_groups=num_groups, eps=eps)
    h = layers.silu(h)
    h = layers.conv2d(p["conv2"], h)
    if "conv_shortcut" in p:
        x = layers.conv2d(p["conv_shortcut"], x)
    return x + h


def init_downsample(key, channels: int, dtype=jnp.float32):
    return {"conv": layers.init_conv(key, channels, channels, 3, dtype=dtype)}


def downsample(p, x):
    """Stride-2 conv with diffusers' asymmetric (0,1) padding."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return layers.conv2d(p["conv"], x, stride=2, padding="VALID")


def init_upsample(key, channels: int, out_channels: Optional[int] = None,
                  dtype=jnp.float32):
    return {"conv": layers.init_conv(key, channels, out_channels or channels,
                                     3, dtype=dtype)}


def upsample(p, x):
    """Nearest-neighbor 2x then 3x3 conv.

    The 2x-nearest is a broadcast + reshape, not jax.image.resize:
    resize('nearest') lowers to a gather that XLA emits as thousands of
    tiny kLoop slices across the step (round-3 xplane: 5144 events,
    ~5 ms/step); the broadcast form is one loop fusion with identical
    values (output pixel (2i, 2i+j) <- input i for j in {0,1})."""
    n, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    y = y.reshape(n, h * 2, w * 2, c)
    return layers.conv2d(p["conv"], y)
