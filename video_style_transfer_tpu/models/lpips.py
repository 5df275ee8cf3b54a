"""LPIPS perceptual distance (VGG16 variant) in JAX.

The driver's quality gate is per-frame LPIPS <= 0.02 vs the reference
(BASELINE.md north star). This implements the richzhang LPIPS-VGG
metric as pure functions over a params pytree, with a converter for the
standard weight files so the gate is exercisable the day weights are
available:

  - VGG16 backbone: torchvision naming, ``features.{idx}.weight/bias``
    (conv indices 0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28)
  - linear heads: lpips-package naming, ``lin{i}.model.1.weight``
    (1x1 convs, one per feature slice)

Math (LPIPS v0.1): inputs in [-1, 1] -> channel shift/scale -> VGG
features at relu1_2/2_2/3_3/4_3/5_3 -> unit-normalize along channels ->
squared diff -> 1x1 linear head -> spatial mean -> sum over slices.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from video_style_transfer_tpu.models import layers

# channel statistics of the LPIPS ScalingLayer (lpips/lpips.py v0.1)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision VGG16 'features' conv indices per LPIPS slice
VGG16_SLICE_CONV_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21),
                        (24, 26, 28))
VGG16_CHANNELS = (64, 128, 256, 512, 512)


def init_lpips(key, *, channels: Sequence[int] = VGG16_CHANNELS,
               convs_per_slice: Sequence[int] = (2, 2, 3, 3, 3),
               in_channels: int = 3, dtype=jnp.float32):
    """Random-weight LPIPS tree (tests run with a tiny ``channels``)."""
    keys = iter(jax.random.split(key, 64))
    slices = []
    c_in = in_channels
    for c_out, n_convs in zip(channels, convs_per_slice):
        convs = []
        for j in range(n_convs):
            convs.append(layers.init_conv(next(keys), c_in, c_out, 3,
                                          dtype=dtype))
            c_in = c_out
        slices.append(convs)
    # released heads are non-negative (trained with a >=0 clamp)
    lins = [{"kernel": jax.random.uniform(next(keys), (c, 1), dtype)}
            for c in channels]
    return {"slices": slices, "lins": lins}


def convert_lpips(sd: Dict[str, np.ndarray], dtype=jnp.float32):
    """torchvision VGG16 ``features.*`` + lpips ``lin*.model.1.weight``
    state dict (either one merged dict or load both files into one) ->
    params pytree. Conv weights transpose OIHW -> HWIO; the 1x1 heads
    flatten to (C, 1)."""
    slices = []
    for idxs in VGG16_SLICE_CONV_IDX:
        convs = []
        for i in idxs:
            w = np.asarray(sd[f"features.{i}.weight"])
            convs.append({
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
                "bias": jnp.asarray(sd[f"features.{i}.bias"], dtype),
            })
        slices.append(convs)
    lins = []
    for i in range(len(VGG16_SLICE_CONV_IDX)):
        w = np.asarray(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        lins.append({"kernel": jnp.asarray(w.reshape(w.shape[1], 1), dtype)})
    return {"slices": slices, "lins": lins}


def _max_pool_2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _vgg_features(params, x):
    """x: (N, H, W, 3) already shift/scaled. Returns one feature map per
    slice (post-ReLU, pre-pool — LPIPS taps relu1_2/2_2/3_3/4_3/5_3)."""
    feats = []
    h = x
    for s, convs in enumerate(params["slices"]):
        if s > 0:
            h = _max_pool_2x2(h)
        for conv in convs:
            h = jax.nn.relu(layers.conv2d(conv, h))
        feats.append(h)
    return feats


def lpips_distance(params, x, y):
    """x, y: (N, H, W, 3) in [-1, 1]. Returns (N,) LPIPS distances."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    fx = _vgg_features(params, (x - shift) / scale)
    fy = _vgg_features(params, (y - shift) / scale)
    total = 0.0
    for fxi, fyi, lin in zip(fx, fy, params["lins"]):
        nx = fxi * jax.lax.rsqrt(
            jnp.sum(fxi * fxi, axis=-1, keepdims=True) + 1e-10)
        ny = fyi * jax.lax.rsqrt(
            jnp.sum(fyi * fyi, axis=-1, keepdims=True) + 1e-10)
        # heads are applied as stored — the released weights are already
        # non-negative (richzhang trains with a >=0 clamp; eval has no abs)
        d = (nx - ny) ** 2
        res = jnp.squeeze(d @ lin["kernel"].astype(d.dtype), -1)
        total = total + jnp.mean(res, axis=(1, 2))
    return total
