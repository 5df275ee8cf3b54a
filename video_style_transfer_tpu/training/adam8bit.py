"""Blockwise 8-bit AdamW — the TPU-native equivalent of bitsandbytes.

The reference offers ``--use_8bit_adam`` via bitsandbytes
(train_unziplora.py:1615-1626), a CUDA library that stores the Adam
moments as blockwise-quantized 8-bit tensors to cut optimizer HBM 4x.
bitsandbytes has no TPU build; this module re-derives the idea as a pure
optax transform so the flag is real here too:

- both moments are stored as 8-bit codes with one fp32 scale per
  256-element block (bnb's default block size);
- the first moment uses symmetric linear absmax quantization
  (q = round(127 * m / absmax)) — small-m collapse to 0 is SAFE here
  (the update is proportional to m, so erasure under-steps);
- the second moment stores ``sqrt(v)`` on a LOG-SPACED unsigned code:
  code 0 is exact zero, codes 1..255 cover [absmax/1e5, absmax]
  geometrically (~4.6%/code in sqrt, ~2.3% max relative error after
  midpoint rounding; values below the floor clamp UP to it). Linear
  absmax here would round small sqrt(v) in an outlier block to exactly
  0, erasing the moment history and letting a retained m divide by
  ~eps — up to a ~1e3x Adam over-step; the log code has no zero
  collapse, which is why bnb uses a nonlinear dynamic map for v;
- leaves smaller than ``min_8bit_size`` keep exact fp32 moments
  (bnb does the same; tiny tensors gain nothing and lose precision).

All quantize/dequantize math is elementwise fp32 on the VPU and fuses
into the Adam update — the only persistent buffers are the int8 moments
and the per-block scales (4.25 bytes/param/moment -> 1.03).

This is an approximation of exact Adam by construction (as is bnb);
tests bound the update error against fp32 AdamW and check convergence
parity on a quadratic. Memory claim is structural: int8 storage is
1/4 the fp32 moment bytes + 1/256 overhead for scales.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    m: Any    # per-leaf: {"q": int8 (nb, BLOCK), "s": f32 (nb, 1)} or f32
    v: Any


def _blocked(x):
    """Flatten to (nb, BLOCK), zero-padded."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    nb = -(-n // BLOCK)
    return jnp.pad(flat, (0, nb * BLOCK - n)).reshape(nb, BLOCK), n


def _quantize(x):
    """Symmetric linear int8 per block: q in [-127, 127]."""
    b, n = _blocked(x.astype(jnp.float32))
    s = jnp.max(jnp.abs(b), axis=1, keepdims=True) / 127.0
    safe = jnp.where(s > 0, s, 1.0)
    q = jnp.round(b / safe).astype(jnp.int8)
    return {"q": q, "s": s}


def _deq(state, shape):
    n = 1
    for d in shape:
        n *= d
    b = state["q"].astype(jnp.float32) * state["s"]
    return b.reshape(-1)[:n].reshape(shape)


# sqrt(v) dynamic range per block: codes 1..255 span [absmax/R, absmax]
_V_RANGE = 1e5
_V_LOGR = 11.512925  # ln(1e5)


def _quantize_sqrtv(x):
    """Unsigned log-spaced 8-bit for the non-negative sqrt(v): code 0 is
    exact zero; codes 1..255 geometric in [absmax/_V_RANGE, absmax].
    Sub-floor values clamp UP to the floor (a conservative under-step);
    nothing nonzero ever dequantizes to zero."""
    b, n = _blocked(x.astype(jnp.float32))
    s = jnp.max(b, axis=1, keepdims=True)          # x >= 0
    safe = jnp.where(s > 0, s, 1.0)
    r = jnp.maximum(b / safe, 1.0 / _V_RANGE)      # (0, 1] after clamp
    q = jnp.round(jnp.log(r) / _V_LOGR * 254.0 + 255.0)
    q = jnp.where(b > 0, q, 0.0).astype(jnp.uint8)
    return {"q": q, "s": s}


def _deq_sqrtv(state, shape):
    n = 1
    for d in shape:
        n *= d
    q = state["q"].astype(jnp.float32)
    val = state["s"] * jnp.exp((q - 255.0) / 254.0 * _V_LOGR)
    b = jnp.where(q > 0, val, 0.0)
    return b.reshape(-1)[:n].reshape(shape)


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-8,
                      min_8bit_size: int = 4096) -> optax.GradientTransformation:
    """Adam moment tracking with blockwise-int8 moment storage."""

    def quantized(p):
        return p.size >= min_8bit_size

    def init_fn(params):
        def init_leaf(p, quant):
            z = jnp.zeros(p.shape, jnp.float32)
            if quantized(p):
                return quant(z)
            return z
        m = jax.tree.map(lambda p: init_leaf(p, _quantize), params)
        v = jax.tree.map(lambda p: init_leaf(p, _quantize_sqrtv), params)
        return ScaleByAdam8bitState(jnp.zeros([], jnp.int32), m, v)

    def update_fn(updates, state, params=None):
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, m_st, v_st):
            g32 = g.astype(jnp.float32)
            q = quantized(g)
            if q:
                m = _deq(m_st, g.shape)
                sv = _deq_sqrtv(v_st, g.shape)  # stores sqrt(v), log code
                v = sv * sv
            else:
                m, v = m_st, v_st
            m = b1 * m + (1.0 - b1) * g32
            v = b2 * v + (1.0 - b2) * g32 * g32
            out = (m / c1) / (jnp.sqrt(v / c2) + eps)
            if q:
                return out, _quantize(m), _quantize_sqrtv(jnp.sqrt(v))
            return out, m, v

        leaves, treedef = jax.tree_util.tree_flatten(updates)
        # m/v trees have dict leaves for quantized entries — flatten
        # against the updates treedef via flatten_up_to
        m_leaves = treedef.flatten_up_to(state.m)
        v_leaves = treedef.flatten_up_to(state.v)
        outs = [upd(g, m, v)
                for g, m, v in zip(leaves, m_leaves, v_leaves)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_m = treedef.unflatten([o[1] for o in outs])
        new_v = treedef.unflatten([o[2] for o in outs])
        return new_updates, ScaleByAdam8bitState(count, new_m, new_v)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 1e-4,
              min_8bit_size: int = 4096) -> optax.GradientTransformation:
    """Drop-in AdamW with 8-bit moment storage (--use_8bit_adam)."""
    return optax.chain(
        scale_by_adam8bit(b1=b1, b2=b2, eps=eps,
                          min_8bit_size=min_8bit_size),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )
