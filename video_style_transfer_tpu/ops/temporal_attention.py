"""Per-pixel temporal (frame-axis) attention — pixel-lanes Pallas kernel.

The AnimateDiff motion modules attend over F<=32 frames independently at
every pixel (reference spec: animatediff/temporal_transformer.py:79-146).
As batched matmuls this is ~B*H*W*heads tiny (F x D)@(D x F) contractions
— the MXU pads each one to its 128-lane tiles, and the full-scale profile
shows the motion scans costing ~600 ms of the 3.2 s denoise step.

This kernel instead lays activations out "pixel-lanes": pixels ride the
128-wide VPU lanes, head_dim rides sublanes, and the F x F logits are
elementwise multiplies + sublane reductions — no MXU involvement, no
padding anywhere. Each frame is a separate (P, N) input array (P =
heads*head_dim), which the q/k/v projections produce for free as
`einsum('nc,cp->pn', x[f], W)` — slicing tokens ordered (F, N, C) on the
leading dim costs nothing, and every kernel block is a clean 2-D
(head_dim, block_n) tile with zero layout offsets (Mosaic rejects
reductions over sublane-offset slices of 3-D blocks).

Differentiation: custom_vjp with a dedicated pixel-lanes backward kernel
(one pass recomputes the softmax and emits dq/dk/dv; dk/dv accumulate
across frames in f32 VMEM scratch). Set VST_TA_XLA_BWD=1 to fall back to
the per-head XLA vjp loop for debugging.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_style_transfer_tpu.ops.common import LOG2E, should_interpret


def _kernel(*refs, num_frames: int, scale: float):
    """refs: F q-refs, F k-refs, F v-refs, F out-refs; each block
    (head_dim, block_n) — one head per grid row, pixels in lanes."""
    f_ = num_frames
    q_refs = refs[:f_]
    k_refs = refs[f_:2 * f_]
    v_refs = refs[2 * f_:3 * f_]
    o_refs = refs[3 * f_:]

    # Loads are per-use: materializing all F k/v tiles as values first
    # needs ~640 vector registers and Mosaic spills everything (measured
    # 37 ms vs ~6 ms for this streaming form). Products stay bf16 (as an
    # MXU would keep them) with f32 reduction/accumulation.
    s2 = scale * LOG2E
    for f in range(f_):
        qf = q_refs[f][...]                            # (D, bn) bf16
        logits = [jnp.sum((qf * k_refs[g][...]).astype(jnp.float32),
                          axis=0) * s2                 # (bn,)
                  for g in range(f_)]
        m = logits[0]
        for g in range(1, f_):
            m = jnp.maximum(m, logits[g])
        ws = [jnp.exp2(lg - m) for lg in logits]
        denom = ws[0]
        for g in range(1, f_):
            denom = denom + ws[g]
        acc = ws[0][None, :] * v_refs[0][...].astype(jnp.float32)
        for g in range(1, f_):
            acc = acc + ws[g][None, :] * v_refs[g][...].astype(jnp.float32)
        o_refs[f][...] = (acc * (1.0 / denom)[None, :]) \
            .astype(o_refs[f].dtype)


def _reference_stacked(q, k, v, *, num_heads: int, scale: float):
    """XLA reference: q/k/v (F, P, N) with P = num_heads * head_dim."""
    f_, p_, n_ = q.shape
    d = p_ // num_heads

    def split(x):
        return x.reshape(f_, num_heads, d, n_)

    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("fhdn,ghdn->hfgn", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=2)
    o = jnp.einsum("hfgn,ghdn->fhdn", w.astype(v.dtype), vh,
                   preferred_element_type=jnp.float32)
    return o.reshape(f_, p_, n_).astype(q.dtype)


def _fwd_kernel_call(qs, ks, vs, *, num_heads: int, scale: float,
                     block_n: int, interpret=None):
    if interpret is None:
        interpret = should_interpret()
    f_ = len(qs)
    p_, n_ = qs[0].shape
    d = p_ // num_heads
    bn = min(block_n, n_)
    grid = (num_heads, pl.cdiv(n_, bn))
    spec = pl.BlockSpec((d, bn), lambda h, i: (h, i))
    n_arr = 3 * f_
    return pl.pallas_call(
        functools.partial(_kernel, num_frames=f_, scale=scale),
        grid=grid,
        in_specs=[spec] * n_arr,
        out_specs=[spec] * f_,
        out_shape=[jax.ShapeDtypeStruct((p_, n_), qs[0].dtype)] * f_,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # 3F in + F out double-buffered blocks exceed the default
            # 16MB scoped-vmem budget at F=16
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * p_ * f_ * f_ * n_,
            bytes_accessed=4 * p_ * f_ * n_ * qs[0].dtype.itemsize,
            transcendentals=num_heads * f_ * f_ * n_),
        interpret=interpret,
    )(*qs, *ks, *vs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ta_frames(qs, ks, vs, num_heads, scale, block_n):
    return _fwd_kernel_call(qs, ks, vs, num_heads=num_heads, scale=scale,
                            block_n=block_n)


def _ta_fwd(qs, ks, vs, num_heads, scale, block_n):
    out = _fwd_kernel_call(qs, ks, vs, num_heads=num_heads, scale=scale,
                           block_n=block_n)
    return out, (qs, ks, vs)


def _bwd_kernel(*refs, num_frames: int, scale: float):
    """refs: F q, F k, F v, F do inputs; F dq, F dk, F dv outputs;
    2F f32 scratches (dk/dv frame accumulators). Each block is
    (head_dim, block_n) — one head per grid row, pixels in lanes.

    Per pixel n and head: recompute w_fg = softmax_g(scale * q_f . k_g),
    dp_fg = do_f . v_g, delta_f = sum_g w_fg dp_fg,
    ds_fg = w_fg (dp_fg - delta_f) scale; then
    dq_f = sum_g ds_fg k_g, dk_g = sum_f ds_fg q_f,
    dv_g = sum_f w_fg do_f."""
    f_ = num_frames
    q_refs = refs[:f_]
    k_refs = refs[f_:2 * f_]
    v_refs = refs[2 * f_:3 * f_]
    do_refs = refs[3 * f_:4 * f_]
    dq_refs = refs[4 * f_:5 * f_]
    dk_refs = refs[5 * f_:6 * f_]
    dv_refs = refs[6 * f_:7 * f_]
    dk_scr = refs[7 * f_:8 * f_]
    dv_scr = refs[8 * f_:9 * f_]

    for g in range(f_):
        dk_scr[g][...] = jnp.zeros_like(dk_scr[g])
        dv_scr[g][...] = jnp.zeros_like(dv_scr[g])

    s2 = scale * LOG2E
    for f in range(f_):
        qf = q_refs[f][...]                            # (D, bn)
        dof = do_refs[f][...]
        # recompute the softmax row exactly as the forward kernel does
        logits = [jnp.sum((qf * k_refs[g][...]).astype(jnp.float32),
                          axis=0) * s2                 # (bn,)
                  for g in range(f_)]
        m = logits[0]
        for g in range(1, f_):
            m = jnp.maximum(m, logits[g])
        ws = [jnp.exp2(lg - m) for lg in logits]
        denom = ws[0]
        for g in range(1, f_):
            denom = denom + ws[g]
        inv = 1.0 / denom
        dps = [jnp.sum((dof * v_refs[g][...]).astype(jnp.float32), axis=0)
               for g in range(f_)]
        delta = ws[0] * inv * dps[0]
        for g in range(1, f_):
            delta = delta + ws[g] * inv * dps[g]

        dq_acc = None
        qf32 = qf.astype(jnp.float32)
        dof32 = dof.astype(jnp.float32)
        for g in range(f_):
            w_g = ws[g] * inv                          # (bn,)
            ds_g = w_g * (dps[g] - delta) * scale
            contrib = ds_g[None, :] * k_refs[g][...].astype(jnp.float32)
            dq_acc = contrib if dq_acc is None else dq_acc + contrib
            dk_scr[g][...] += ds_g[None, :] * qf32
            dv_scr[g][...] += w_g[None, :] * dof32
        dq_refs[f][...] = dq_acc.astype(dq_refs[f].dtype)

    for g in range(f_):
        dk_refs[g][...] = dk_scr[g][...].astype(dk_refs[g].dtype)
        dv_refs[g][...] = dv_scr[g][...].astype(dv_refs[g].dtype)


def _bwd_kernel_call(qs, ks, vs, dos, *, num_heads: int, scale: float,
                     block_n: int, interpret=None):
    if interpret is None:
        interpret = should_interpret()
    f_ = len(qs)
    p_, n_ = qs[0].shape
    d = p_ // num_heads
    bn = min(block_n, n_)
    grid = (num_heads, pl.cdiv(n_, bn))
    spec = pl.BlockSpec((d, bn), lambda h, i: (h, i))
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, num_frames=f_, scale=scale),
        grid=grid,
        in_specs=[spec] * (4 * f_),
        out_specs=[spec] * (3 * f_),
        out_shape=[jax.ShapeDtypeStruct((p_, n_), qs[0].dtype)] * (3 * f_),
        scratch_shapes=[pltpu.VMEM((d, bn), jnp.float32)] * (2 * f_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=11 * p_ * f_ * f_ * n_,
            bytes_accessed=7 * p_ * f_ * n_ * qs[0].dtype.itemsize,
            transcendentals=num_heads * f_ * f_ * n_),
        interpret=interpret,
    )(*qs, *ks, *vs, *dos)
    return out[:f_], out[f_:2 * f_], out[2 * f_:]


def _ta_bwd_xla(num_heads, scale, res, g):
    """Per-head XLA vjp fallback: every tensor stays (F, D, N) — the
    stacked (F, H, D, N) reshape form made XLA pick a layout with 3.2x
    sublane padding, which alone OOMed the full-scale stage-2 train
    step."""
    qs, ks, vs = res
    p_, n_ = qs[0].shape
    d = p_ // num_heads
    f_ = len(qs)

    def head_ref(qh, kh, vh):
        logits = jnp.einsum("fdn,gdn->fgn", qh, kh,
                            preferred_element_type=jnp.float32) * scale
        w = jax.nn.softmax(logits, axis=1)
        return jnp.einsum("fgn,gdn->fdn", w.astype(vh.dtype), vh,
                          preferred_element_type=jnp.float32) \
            .astype(qh.dtype)

    dq_h = []  # per head: (dq, dk, dv) vjp triples
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh = jnp.stack([q[sl] for q in qs])
        kh = jnp.stack([k[sl] for k in ks])
        vh = jnp.stack([v[sl] for v in vs])
        gh = jnp.stack([gf[sl] for gf in g])
        _, vjp = jax.vjp(head_ref, qh, kh, vh)
        dq_h.append(vjp(gh))
    dqs = [jnp.concatenate([dq_h[h][0][f] for h in range(num_heads)],
                           axis=0) for f in range(f_)]
    dks = [jnp.concatenate([dq_h[h][1][f] for h in range(num_heads)],
                           axis=0) for f in range(f_)]
    dvs = [jnp.concatenate([dq_h[h][2][f] for h in range(num_heads)],
                           axis=0) for f in range(f_)]
    return dqs, dks, dvs


def _ta_bwd(num_heads, scale, block_n, res, g):
    import os
    if os.environ.get("VST_TA_XLA_BWD") == "1":
        return _ta_bwd_xla(num_heads, scale, res, g)
    qs, ks, vs = res
    dqs, dks, dvs = _bwd_kernel_call(qs, ks, vs, list(g),
                                     num_heads=num_heads, scale=scale,
                                     block_n=block_n)
    return list(dqs), list(dks), list(dvs)


_ta_frames.defvjp(_ta_fwd, _ta_bwd)


def temporal_attention_frames(qs, ks, vs, *, num_heads: int, scale=None,
                              block_n: int = 1024, impl: str = "auto"):
    """qs, ks, vs: length-F lists of (P, N) pixel-lanes arrays,
    P = heads * head_dim. Softmax attention over the frame axis
    independently per pixel n and head. Returns a length-F list of
    (P, N) outputs."""
    p_, n_ = qs[0].shape
    if scale is None:
        scale = 1.0 / math.sqrt(p_ // num_heads)
    if (p_ // num_heads) % 8 != 0 and (p_ // num_heads) != p_:
        # head_dim must tile sublanes (or be the whole array dim);
        # tiny test configs (d=4) take the XLA path
        impl = "xla"
    if impl == "xla":
        out = _reference_stacked(jnp.stack(qs), jnp.stack(ks),
                                 jnp.stack(vs), num_heads=num_heads,
                                 scale=scale)
        return [out[f] for f in range(len(qs))]
    return _ta_frames(list(qs), list(ks), list(vs), num_heads,
                      float(scale), block_n)
