"""Fused LayerNorm — Pallas TPU kernel. MEASURED SLOWER; NOT WIRED IN.

HOME DECISION (round 4): stays under ops/ with its test file
(tests/test_layer_norm.py) rather than moving to benchmarks/ — it is
the documented fallback if a layout change ever breaks XLA's LN fusion,
and a fallback only stays viable while its correctness tests run in CI.
The perf sweep that produced the numbers below lives in
benchmarks/ln_sweep.py.

Kept as a documented negative result with its tests (the production
`models/layers.py:layer_norm` keeps the plain XLA formula). The
hypothesis was that one VMEM-resident pass (one HBM read + one write)
would beat XLA's two fusions (stats reduce + apply, reading the
activation twice). Measured on v5e (benchmarks/ln_sweep.py, chained
64-iter protocol, floor-corrected), at (32,1024,1280) bf16:

  XLA reduce (current)           0.148 ms/iter
  XLA dot_general stats          0.023-0.086 ms/iter (but loses e2e:
                                 fusion barrier, f32 intermediates —
                                 0.2127 vs 0.2346 fps measured)
  this kernel, lane-reduce stats 0.447 ms/iter  (~370 GB/s)
  this kernel, MXU-dot stats     0.887 ms/iter  (f32 HIGHEST dot = 6
                                 MXU passes; (C,1) output uses 1 of
                                 128 output lanes)

The kernel is VPU-compute-bound (convert + two-pass stats + apply is
~10 VPU ops/element, and Mosaic lowers the in-kernel lane-axis reduce
through the same cross-lane shuffles as XLA), while XLA's "two-read"
form rides producer/consumer fusion in the real graph. The numerics
here ARE better than the XLA dot forms (within bf16 quantization of a
float64 oracle — see the sweep's error ladder), so the kernel remains
the fallback plan if a future layout change breaks XLA's LN fusion.

Backward recomputes through the XLA reference formula via jax.vjp, so
gradients are bit-identical to the production path either way (stage-2
trains the motion-module norm scales/biases; reference
train_animatediff.py:147 freeze set).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference(x, scale, bias, eps):
    """The exact XLA formula this kernel replaces (layers.layer_norm)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def _kernel(x_ref, s_ref, b_ref, o_ref, *, eps, stats):
    xf = x_ref[...].astype(jnp.float32)
    c = xf.shape[1]
    if stats == "dot":
        # Row sums as MXU matmuls on the VMEM-resident tile: the lane
        # axis is the natural contraction axis, so no cross-lane
        # shuffles. HIGHEST precision keeps the f32 sums exact-ish
        # (default TPU f32 dots truncate operands through bf16 passes).
        ones = jnp.ones((c, 1), jnp.float32)
        mean = jax.lax.dot(xf, ones,
                           precision=jax.lax.Precision.HIGHEST) / c
        xc = xf - mean
        var = jax.lax.dot(xc * xc, ones,
                          precision=jax.lax.Precision.HIGHEST) / c
    else:
        mean = jnp.mean(xf, axis=1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * s_ref[...].astype(jnp.float32)
                  + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _fwd_call(x2d, scale, bias, eps, block_m, stats="reduce",
              interpret=None):
    if interpret is None:
        from video_style_transfer_tpu.ops.common import should_interpret
        interpret = should_interpret()
    m, c = x2d.shape
    bm = min(block_m, m)
    itemsize = x2d.dtype.itemsize
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, stats=stats),
        grid=(pl.cdiv(m, bm),),
        in_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, c), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * m * c,
            bytes_accessed=2 * m * c * itemsize,
            transcendentals=m),
        interpret=interpret,
    )(x2d, scale.reshape(1, -1), bias.reshape(1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln(x2d, scale, bias, eps, block_m, stats):
    return _fwd_call(x2d, scale, bias, eps, block_m, stats)


def _ln_fwd(x2d, scale, bias, eps, block_m, stats):
    return _fwd_call(x2d, scale, bias, eps, block_m, stats), (x2d, scale, bias)


def _ln_bwd(eps, block_m, stats, res, g):
    x2d, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _reference(x_, s_, b_, eps), x2d, scale, bias)
    return vjp(g)


_ln.defvjp(_ln_fwd, _ln_bwd)


def layer_norm(x, scale, bias, *, eps: float = 1e-5, block_m: int = 256,
               stats: str = "reduce"):
    """LayerNorm over the minor axis with scale/bias, fused in one pass.

    x: (..., C). Falls back to the XLA reference when the shape doesn't
    tile cleanly (rows not a multiple of 8, or C not a multiple of 128 —
    lane padding inside the kernel would corrupt the row statistics).
    """
    c = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape(-1, c)
    m = x2d.shape[0]
    if m % 8 != 0 or c % 128 != 0 or m == 0:
        return _reference(x, scale, bias, eps)
    return _ln(x2d, scale, bias, eps, block_m, stats).reshape(lead + (c,))
