"""Primitive layers as init/apply function pairs over plain dict params.

NHWC activations and HWIO conv kernels throughout — TPU's native conv
layout (the torch reference is NCHW/OIHW; the HF converter in
utils/hf_convert.py transposes). Linear kernels are (in, out).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Initializers (match torch defaults so random-init parity tests line up)
# ---------------------------------------------------------------------------

def _kaiming_uniform(key, shape, fan_in, dtype):
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_linear(key, in_features: int, out_features: int, *, bias: bool = True,
                dtype=jnp.float32):
    kk, kb = jax.random.split(key)
    p = {"kernel": _kaiming_uniform(kk, (in_features, out_features),
                                    in_features, dtype)}
    if bias:
        bound = 1.0 / math.sqrt(in_features)
        p["bias"] = jax.random.uniform(kb, (out_features,), dtype,
                                       -bound, bound)
    return p


def linear(p, x, precision=None):
    y = jnp.dot(x, p["kernel"].astype(x.dtype), precision=precision)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def init_conv(key, in_channels: int, out_channels: int, kernel_size: int,
              *, bias: bool = True, dtype=jnp.float32):
    kk, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size * kernel_size
    p = {"kernel": _kaiming_uniform(
        kk, (kernel_size, kernel_size, in_channels, out_channels), fan_in,
        dtype)}
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        p["bias"] = jax.random.uniform(kb, (out_channels,), dtype,
                                       -bound, bound)
    return p


def conv2d(p, x, *, stride: int = 1, padding="SAME"):
    """x: (..., H, W, C) NHWC. Leading dims beyond 4 are flattened."""
    lead = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    y = jax.lax.conv_general_dilated(
        x4, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y.reshape(lead + y.shape[1:])


def init_group_norm(num_channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((num_channels,), dtype),
            "bias": jnp.zeros((num_channels,), dtype)}


def group_norm(p, x, *, num_groups: int, eps: float = 1e-5):
    """GroupNorm over channels-last input (..., C). Normalizes each group
    of C/num_groups channels jointly with all spatial positions, matching
    torch.nn.GroupNorm semantics."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32)
    # (..., spatial..., C) -> (B, rest, g, c//g): normalize over (rest, c//g)
    lead = xf.shape[0]
    xg = xf.reshape(lead, -1, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(xf.shape)
    xf = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(orig_dtype)


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, *, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)
