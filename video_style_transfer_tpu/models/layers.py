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
    # torch Linear/Conv2d default: kaiming_uniform_(a=sqrt(5)) ->
    # gain = sqrt(1/3), bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in)
    bound = math.sqrt(1.0 / fan_in)
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


_STRIP_H = 64      # strip height for big-spatial 3x3 convs
_STRIP_MIN_H = 512  # strip only at >= 512px (measured crossover)


def _conv3x3_strips(x4, kernel):
    """3x3 SAME stride-1 conv with the H axis split into 64-row strips
    folded into the batch axis.

    XLA's conv emitter handles small-batch big-spatial inputs through a
    space-to-batch rewrite whose select/copy plumbing dominated the VAE
    decode profile (~56% of device time at chunk 1). Pre-tiling is the
    same transform done cheaply: (N,H,W,C)->(N*S,H/S,W,C) is layout-free,
    the 1-row halos are exchanged explicitly per sample (zeros at image
    borders = the SAME padding), and the conv runs at the batched
    medium-spatial shape the emitter is fast at. Measured ms/conv
    (f32, v5e, benchmarks/conv_sweep.py protocol): 1024^2x128 7.2->4.5,
    1024^2x256 18.1->11.9, 512^2x512 12.2->9.2 — bitwise identical.
    """
    n, h, w, c = x4.shape
    s = h // _STRIP_H
    xs = x4.reshape(n, s, h // s, w, c)
    zero = jnp.zeros_like(xs[:, :1, :1])
    top = jnp.concatenate([zero, xs[:, :-1, -1:]], axis=1)
    bot = jnp.concatenate([xs[:, 1:, :1], zero], axis=1)
    xh = jnp.concatenate([top, xs, bot], axis=2)
    y = jax.lax.conv_general_dilated(
        xh.reshape(n * s, h // s + 2, w, c), kernel,
        window_strides=(1, 1), padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(n, h, w, y.shape[-1])


def conv2d(p, x, *, stride: int = 1, padding="SAME"):
    """x: (..., H, W, C) NHWC. Leading dims beyond 4 are flattened."""
    lead = x.shape[:-3]
    x4 = x.reshape((-1,) + x.shape[-3:])
    k = p["kernel"].astype(x.dtype)
    h = x4.shape[1]
    if (k.shape[0] == 3 and k.shape[1] == 3 and stride == 1
            and padding == "SAME" and h >= _STRIP_MIN_H
            and h % _STRIP_H == 0):
        y = _conv3x3_strips(x4, k)
    else:
        y = jax.lax.conv_general_dilated(
            x4, k,
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
    torch.nn.GroupNorm semantics.

    TPU layout note: statistics are taken as per-CHANNEL spatial sums
    first (C stays the minor/lane dimension), then aggregated to groups on
    the tiny (B, C) tensor. The naive reshape to (..., g, C/g) would make
    the minor dimension 10-40 wide, which the (8,128) vector tiling pads
    ~12x — measured as the dominant normalization cost in the full-scale
    denoise step profile."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = num_groups
    lead = x.shape[0]
    # keep x in its input dtype; upcast INSIDE each consuming expression
    # so the f32 conversion fuses into the stats reduce and the apply
    # chain respectively. A shared pre-converted xf value materialized a
    # full-size f32 copy of the activation (profiled at ~2 GB for the
    # level-0 up-block concat input, written once and read by both the
    # stats fusion and the consuming conv).
    x2 = x.reshape(lead, -1, c)
    n_spatial = x2.shape[1]
    # Shift by a per-group reference value (group mean of the first
    # spatial row) before squaring: E[(x-K)^2] - E[x-K]^2 is exact for
    # any constant K, and with K one sample away from the true mean the
    # fp32 cancellation is bounded by ~one sample variance instead of
    # mean^2 (which catastrophically cancelled when a group's mean
    # dominated its variance — worst at the VAE's eps=1e-6).
    k_g = x2[:, 0, :].astype(jnp.float32) \
        .reshape(lead, g, c // g).mean(-1)                 # (B, g)
    k_c = jnp.repeat(k_g, c // g, axis=-1)                 # (B, C)
    xs = x2.astype(jnp.float32) - k_c[:, None, :]
    s1 = jnp.sum(xs, axis=1)                       # (B, C)
    s2 = jnp.sum(xs * xs, axis=1)                  # (B, C)
    cnt = n_spatial * (c // g)
    gmean_s = s1.reshape(lead, g, c // g).sum(-1) / cnt    # (B, g)
    gsq = s2.reshape(lead, g, c // g).sum(-1) / cnt
    inv = jax.lax.rsqrt(jnp.maximum(gsq - gmean_s * gmean_s, 0.0) + eps)
    gmean = gmean_s + k_g
    mean_c = jnp.repeat(gmean, c // g, axis=-1)    # (B, C)
    inv_c = jnp.repeat(inv, c // g, axis=-1)
    scale = inv_c * p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32) - mean_c * scale
    bshape = (lead,) + (1,) * (x.ndim - 2) + (c,)
    y = x.astype(jnp.float32) * scale.reshape(bshape) + bias.reshape(bshape)
    return y.astype(orig_dtype)


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, *, eps: float = 1e-5):
    """LayerNorm over the minor axis, plain XLA formula.

    Deliberately NOT a kernel: benchmarks/ln_sweep.py measured both a
    dot_general stats rewrite (wins isolated, loses e2e — fusion
    barrier materializes f32 intermediates) and a fused Pallas kernel
    (ops/layer_norm.py — VPU-compute-bound at ~370 GB/s, slower than
    this form even isolated). XLA fuses the stats reduce into the
    producer chain here; keep the reduce.
    """
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
