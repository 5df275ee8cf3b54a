"""AutoencoderKL (SDXL VAE) — functional, NHWC.

The reference imports diffusers' AutoencoderKL unmodified and insists on
fp32 decode (train_unziplora.py:52-57, inference_animatediff.py:164-169);
here encode/decode are init/apply pairs designed to vmap/shard over the
frame axis (SURVEY.md §7.1).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from video_style_transfer_tpu.config import VAEConfig
from video_style_transfer_tpu.models import layers
from video_style_transfer_tpu.models.attention import attention, init_attention
from video_style_transfer_tpu.models.resnet import (
    downsample, init_downsample, init_resnet_block, init_upsample,
    resnet_block, upsample)


def _init_mid(nxt, c, groups, dtype):
    return {
        "resnets": [
            init_resnet_block(nxt(), c, c, temb_channels=None, dtype=dtype),
            init_resnet_block(nxt(), c, c, temb_channels=None, dtype=dtype),
        ],
        "attentions": [{
            "group_norm": layers.init_group_norm(c, dtype),
            **init_attention(nxt(), c, heads=1, qkv_bias=True,
                             dtype=dtype),
        }],
    }


VAE_EPS = 1e-6  # diffusers AutoencoderKL hardcodes 1e-6 in every norm


def _mid(p, x, groups):
    x = resnet_block(p["resnets"][0], x, None, num_groups=groups,
                     eps=VAE_EPS)
    a = p["attentions"][0]
    n, h, w, c = x.shape
    y = layers.group_norm(a["group_norm"], x, num_groups=groups,
                          eps=VAE_EPS)
    y = attention(a, y.reshape(n, h * w, c), None, heads=1, mode="base")
    x = x + y.reshape(n, h, w, c)
    return resnet_block(p["resnets"][1], x, None, num_groups=groups,
                        eps=VAE_EPS)


def init_vae(key, cfg: VAEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 512))
    nxt = lambda: next(keys)  # noqa: E731
    ch = cfg.block_out_channels
    g = cfg.norm_num_groups

    # --- encoder -----------------------------------------------------------
    enc = {"conv_in": layers.init_conv(nxt(), cfg.in_channels, ch[0], 3,
                                       dtype=dtype),
           "down_blocks": []}
    out_c = ch[0]
    for i in range(len(ch)):
        in_c, out_c = out_c, ch[i]
        block = {"resnets": [init_resnet_block(
            nxt(), in_c if j == 0 else out_c, out_c, temb_channels=None,
            dtype=dtype) for j in range(cfg.layers_per_block)]}
        if i < len(ch) - 1:
            block["downsamplers"] = [init_downsample(nxt(), out_c, dtype=dtype)]
        enc["down_blocks"].append(block)
    enc["mid_block"] = _init_mid(nxt, ch[-1], g, dtype)
    enc["conv_norm_out"] = layers.init_group_norm(ch[-1], dtype)
    enc["conv_out"] = layers.init_conv(nxt(), ch[-1],
                                       2 * cfg.latent_channels, 3, dtype=dtype)

    # --- decoder -----------------------------------------------------------
    rev = list(reversed(ch))
    dec = {"conv_in": layers.init_conv(nxt(), cfg.latent_channels, rev[0], 3,
                                       dtype=dtype),
           "mid_block": _init_mid(nxt, rev[0], g, dtype),
           "up_blocks": []}
    out_c = rev[0]
    for i in range(len(rev)):
        in_c, out_c = out_c, rev[i]
        block = {"resnets": [init_resnet_block(
            nxt(), in_c if j == 0 else out_c, out_c, temb_channels=None,
            dtype=dtype) for j in range(cfg.layers_per_block + 1)]}
        if i < len(rev) - 1:
            block["upsamplers"] = [init_upsample(nxt(), out_c, dtype=dtype)]
        dec["up_blocks"].append(block)
    dec["conv_norm_out"] = layers.init_group_norm(rev[-1], dtype)
    dec["conv_out"] = layers.init_conv(nxt(), rev[-1], cfg.out_channels, 3,
                                       dtype=dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": layers.init_conv(nxt(), 2 * cfg.latent_channels,
                                       2 * cfg.latent_channels, 1, dtype=dtype),
        "post_quant_conv": layers.init_conv(nxt(), cfg.latent_channels,
                                            cfg.latent_channels, 1,
                                            dtype=dtype),
    }


def vae_encode_moments(params, cfg: VAEConfig, x):
    """x: (N, H, W, 3) in [-1, 1] -> (mean, logvar) each
    (N, H/8, W/8, latent)."""
    g = cfg.norm_num_groups
    enc = params["encoder"]
    h = layers.conv2d(enc["conv_in"], x)
    for block in enc["down_blocks"]:
        for rp in block["resnets"]:
            h = resnet_block(rp, h, None, num_groups=g, eps=VAE_EPS)
        if "downsamplers" in block:
            h = downsample(block["downsamplers"][0], h)
    h = _mid(enc["mid_block"], h, g)
    h = layers.group_norm(enc["conv_norm_out"], h, num_groups=g,
                          eps=VAE_EPS)
    h = layers.silu(h)
    h = layers.conv2d(enc["conv_out"], h)
    moments = layers.conv2d(params["quant_conv"], h)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_encode(params, cfg: VAEConfig, x, key: Optional[jax.Array] = None):
    """Sample (or take the mean of) the latent posterior, scaled by
    cfg.scaling_factor."""
    mean, logvar = vae_encode_moments(params, cfg, x)
    if key is not None:
        std = jnp.exp(0.5 * logvar)
        mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor


def vae_decode(params, cfg: VAEConfig, z):
    """z: (N, h, w, latent) *scaled* latents -> (N, 8h, 8w, 3)."""
    g = cfg.norm_num_groups
    z = z / cfg.scaling_factor
    dec = params["decoder"]
    h = layers.conv2d(params["post_quant_conv"], z)
    h = layers.conv2d(dec["conv_in"], h)
    h = _mid(dec["mid_block"], h, g)
    for block in dec["up_blocks"]:
        for rp in block["resnets"]:
            h = resnet_block(rp, h, None, num_groups=g, eps=VAE_EPS)
        if "upsamplers" in block:
            h = upsample(block["upsamplers"][0], h)
    h = layers.group_norm(dec["conv_norm_out"], h, num_groups=g,
                          eps=VAE_EPS)
    h = layers.silu(h)
    return layers.conv2d(dec["conv_out"], h)
