"""Fused flash attention — Pallas TPU kernel.

Replaces F.scaled_dot_product_attention on the UNet's hot spatial
self-attention path (reference unzip_attention_processor.py:737-739).
SDXL@1024^2 runs seq<=4096, head_dim 64, and a 16-frame CFG-doubled video
batch makes the materialized (B*F*2, heads, 4096, 4096) logits of a naive
attention ~10 GB — the fused kernel never materializes them.

Design (online softmax, grid-accumulated):
  grid = (batch*heads, num_q_blocks, num_kv_blocks); the kv axis iterates
  fastest so k/v blocks stream through VMEM (auto double-buffered by the
  pallas pipeline), while per-q-block running max / denominator / output
  accumulators live in VMEM scratch across kv iterations. Logits compute
  in fp32 on the MXU; probabilities are cast back to the value dtype for
  the p@v matmul.

Backward: dedicated dq and dk/dv Pallas kernels using the saved
log-sum-exp — O(S) memory like the forward (an XLA recompute backward
would materialize the (BH, S, S) probability matrix: ~21 GB for a
16-frame CFG-doubled 1024^2 batch). Set VST_FLASH_XLA_BWD=1 to fall back
to the XLA recompute backward for debugging.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on v5e at SDXL shapes. Round 1 (BHSD kernel, B*H=80, S=4096,
# D=64): 512/512: 23 TF/s, 512/1024: 38, 1024/1024: 38 (XLA: 8). Round 2
# (packed kernel at the serving shape B=32, S=4096, H=10):
# 1024/2048 runs ~13% faster floor-corrected than 1024/1024
# (benchmarks/flash_sweep_packed.py). Round 2 late, chained on-chip
# protocol (benchmarks/flash_sweep_chain.py): block_k = S = 4096 runs
# single-pass — no online-softmax correction chain and the MXU row-sum
# applies — 22.4 -> 18.8 ms (+16%) over 1024/2048 at the big serving
# shape, so block_k defaults to the whole sequence for d<=128.
import os as _os
DEFAULT_BLOCK_Q = int(_os.environ.get("VST_FLASH_BLOCK_Q", "1024"))
DEFAULT_BLOCK_K = int(_os.environ.get("VST_FLASH_BLOCK_K", "4096"))
from video_style_transfer_tpu.ops.common import LOG2E, should_interpret

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                 acc_ref, *, scale: float, kv_seq: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # fold scale*log2(e) into q once per (bq, d) tile: one VPU mul over
    # bq*d elements instead of bq*bk logits (d=64 vs bk=2048 — 32x fewer
    # ops on the VPU softmax chain, the kernel's binding constraint).
    # Costs one extra input-dtype rounding of q (<= bf16's own 2^-9).
    q = q_ref[0] * (scale * LOG2E)     # (bq, d)
    k = k_ref[0]                       # (bk, d)
    v = v_ref[0]                       # (bk, d)

    # mask padded kv tail (when kv_seq % block_k != 0): the padded region
    # of k/v is uninitialized, so both the logits AND v must be masked —
    # exp(NEG_INF) == 0 does not save us because 0 * garbage may be NaN.
    tail = kv_seq - j * block_k
    if kv_seq % block_k != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < tail, v, 0)

    # logits in base-2 space (scale*log2(e) pre-folded into q above)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (bq, bk)

    if kv_seq % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < tail, s, NEG_INF)

    m_prev = m_ref[:, :1]                                    # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)               # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    corr = jnp.exp2(m_prev - m_new)                          # (bq, 1)
    p = jnp.exp2(s - m_new)                                  # (bq, bk) f32

    l_new = corr * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = (acc_ref[:] * corr
                  + jax.lax.dot_general(
                      p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                      preferred_element_type=jnp.float32))
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        denom = l_ref[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc_ref[:] / denom).astype(o_ref.dtype)
        # natural-log lse at the boundary: ln-sum-exp = ln2*(m2+log2(l))
        lse_ref[0, 0] = (m_ref[:, 0]
                         + jnp.log2(denom[:, 0])) * (1.0 / LOG2E)


def _flash_fwd_bhsd(q, k, v, *, scale: float, block_q: int, block_k: int,
                    interpret: bool = None):
    """q: (BH, Sq, D); k/v: (BH, Sk, D) -> (BH, Sq, D)."""
    if interpret is None:
        interpret = should_interpret()
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)

    grid = (bh, nq, nk)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, kv_seq=sk,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            # (bh, 1, sq): TPU lowering requires the block's last two dims
            # to divide (8, 128) or equal the array dims — a (1, block_q)
            # block on a (bh, sq) array is invalid, (1, block_q) on
            # (1, sq) rows is fine
            pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
            pltpu.VMEM((block_q, d), jnp.float32),     # output accum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=2 * bh * (sq + 2 * sk + sq) * d,
            transcendentals=bh * sq * sk),
        interpret=interpret,
    )(q, k, v)


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                        acc_ref, *, scale: float, kv_seq: int,
                        block_k: int, head_dim: int, pack: int):
    """Packed-heads variant: blocks are (block, pack*head_dim) lane
    groups holding `pack` independent heads side by side, so the kernel
    consumes (B, S, H*D) activations DIRECTLY as they leave the q/k/v
    projection matmuls — no (B,S,H,D)->(B,H,S,D) transpose ever
    materializes (profiled at ~130 ms/step of pure copies in the
    full-scale denoise step). Running max / denom live in lane-column
    t of the (block_q, 128) scratch for packed head t."""
    j = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # scale*log2(e) folded into q once per block (covers every packed
    # head's slice) — see _attn_kernel comment
    q = q_ref[0] * (scale * LOG2E)     # (bq, pack*d)
    k = k_ref[0]                       # (bk, pack*d)
    v = v_ref[0]                       # (bk, pack*d)

    tail = kv_seq - j * block_k
    masked = kv_seq % block_k != 0
    if masked:
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < tail, v, 0)

    # Softmax row-sum on the MXU: augment v with a ones block so
    # p @ [v | 1] yields the p@v numerator AND the denominator row-sum in
    # one matmul, deleting the f32 row-sum pass over the (bq, bk)
    # probability block from the VPU softmax chain along with the f32
    # materialization of p (only the bf16 cast feeding the MXU remains).
    # The denominator then sums the SAME value-dtype p as the numerator
    # (the f32-sum form normalized bf16 probabilities by their f32 sum —
    # a ~2^-9 inconsistency).
    # Measured on v5e (floor-corrected, serving shapes): the trade WINS
    # only when kv fits in a single block — (32,1024,20,64): 3.33 ->
    # 3.09 ms; at (32,4096,10,64) with two kv blocks it LOSES (21.6 ->
    # 25.3 ms: the widened 2d-lane p@v matmul is not free once the
    # accumulator is re-read per kv block), so it is gated to nk == 1.
    # VST_FLASH_VPU_ROWSUM=1 restores the VPU row-sum for A/B.
    import os
    mxu_rowsum = (2 * head_dim <= 128 and kv_seq <= block_k
                  and os.environ.get("VST_FLASH_VPU_ROWSUM") != "1")

    for t in range(pack):
        sl = slice(t * head_dim, (t + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if masked:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < tail, s, NEG_INF)
        m_prev = m_ref[:, t:t + 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        corr = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)
        if mxu_rowsum:
            v_t = v[:, sl]
            # ones are NOT tail-masked: p is already 0 past the kv tail
            vaug = jnp.concatenate([v_t, jnp.ones_like(v_t)], axis=1)
            pv2 = jax.lax.dot_general(
                p.astype(v.dtype), vaug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (bq, 2d)
            pv = pv2[:, :head_dim]
            rowsum = pv2[:, head_dim:head_dim + 1]
        else:
            rowsum = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        l_ref[:, t:t + 1] = corr * l_ref[:, t:t + 1] + rowsum
        m_ref[:, t:t + 1] = m_new
        acc_ref[:, sl] = acc_ref[:, sl] * corr + pv

    @pl.when(j == nk - 1)
    def _finalize():
        # per-head slice stores: Mosaic can't concat vectors with
        # mismatched sublane offsets, so never build (pack, bq) vectors
        for t in range(pack):
            sl = slice(t * head_dim, (t + 1) * head_dim)
            denom = l_ref[:, t:t + 1]
            denom = jnp.where(denom == 0.0, 1.0, denom)
            o_ref[0, :, sl] = (acc_ref[:, sl] / denom).astype(o_ref.dtype)
            lse_ref[0, t] = (m_ref[:, t]
                             + jnp.log2(denom[:, 0])) * (1.0 / LOG2E)


def _attn_kernel_packed_single(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                               scale: float, head_dim: int, pack: int):
    """Single-kv-block specialization of `_attn_kernel_packed` for
    nk == 1 — the default serving configuration since block_k covers the
    whole sequence (S <= 4096 at every SDXL attention site). With one kv
    block the online-softmax machinery degenerates (m_prev is NEG_INF,
    the correction factor is exactly 0), so the running max /
    denominator / output-accumulator VMEM scratch and their
    init+finalize grid passes vanish: softmax lives in registers and o
    is stored exactly once. Bitwise-identical outputs to the general
    kernel at nk == 1 (same op order; tested in
    tests/test_flash_attention.py::test_single_pass_matches_general)."""
    q = q_ref[0] * (scale * LOG2E)     # (bq, pack*d)
    k = k_ref[0]                       # (sk, pack*d)
    v = v_ref[0]                       # (sk, pack*d)

    # no kv-tail masking: block_k == kv_seq exactly (see caller gate)
    import os
    mxu_rowsum = (2 * head_dim <= 128
                  and os.environ.get("VST_FLASH_VPU_ROWSUM") != "1")

    for t in range(pack):
        sl = slice(t * head_dim, (t + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # (bq, sk)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        if mxu_rowsum:
            # see the general kernel's comment: p @ [v | 1] folds the
            # denominator row-sum into the MXU matmul
            v_t = v[:, sl]
            vaug = jnp.concatenate([v_t, jnp.ones_like(v_t)], axis=1)
            pv2 = jax.lax.dot_general(
                p.astype(v.dtype), vaug, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # (bq, 2d)
            pv = pv2[:, :head_dim]
            rowsum = pv2[:, head_dim:head_dim + 1]
        else:
            rowsum = jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        denom = jnp.where(rowsum == 0.0, 1.0, rowsum)
        o_ref[0, :, sl] = (pv / denom).astype(o_ref.dtype)
        lse_ref[0, t] = (m[:, 0]
                         + jnp.log2(denom[:, 0])) * (1.0 / LOG2E)


def _flash_fwd_bs_hd(q, k, v, *, num_heads: int, scale: float,
                     block_q: int, block_k: int, interpret=None):
    """q: (B, Sq, H*D); k/v: (B, Sk, H*D) -> ((B, Sq, H*D) out,
    (B, H, Sq) lse). Heads are packed 128//D per block."""
    if interpret is None:
        interpret = should_interpret()
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    pack = max(1, 128 // d)
    assert num_heads % pack == 0 and (d * pack) % 128 == 0
    hp = num_heads // pack
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)

    lane = pack * d
    out_shape = [
        jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        jax.ShapeDtypeStruct((b * hp, pack, sq), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=4 * b * num_heads * sq * sk * d,
        bytes_accessed=2 * b * (2 * sq + 2 * sk) * hd,
        transcendentals=b * num_heads * sq * sk)

    if nk == 1 and _os.environ.get("VST_FLASH_MULTIPASS") != "1":
        # whole kv sequence in one block (block_k == sk): scratch-free
        # single-pass kernel; VST_FLASH_MULTIPASS=1 forces the general
        # path for A/B
        return pl.pallas_call(
            functools.partial(_attn_kernel_packed_single, scale=scale,
                              head_dim=d, pack=pack),
            grid=(b, hp, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, lane), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, block_k, lane), lambda b, h, i: (b, 0, h)),
                pl.BlockSpec((1, block_k, lane), lambda b, h, i: (b, 0, h)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, lane), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, pack, block_q),
                             lambda b, h, i, _hp=hp: (b * _hp + h, 0, i)),
            ],
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)

    grid = (b, hp, nq, nk)
    return pl.pallas_call(
        functools.partial(_attn_kernel_packed, scale=scale, kv_seq=sk,
                          block_k=block_k, head_dim=d, pack=pack),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, lane), lambda b, h, i, j: (b, i, h)),
            pl.BlockSpec((1, block_k, lane), lambda b, h, i, j: (b, j, h)),
            pl.BlockSpec((1, block_k, lane), lambda b, h, i, j: (b, j, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, lane), lambda b, h, i, j: (b, i, h)),
            # lse rows: (B*HP, pack, Sq); block dims (pack, block_q) are
            # (full dim, multiple of 128) — valid TPU tiling
            pl.BlockSpec((1, pack, block_q),
                         lambda b, h, i, j, _hp=hp: (b * _hp + h, 0, i)),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
            pltpu.VMEM((block_q, lane), jnp.float32),  # output accum
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v)


def _flash_fwd_qkv_packed(qkv, *, num_heads: int, scale: float,
                          block_q: int, block_k: int, interpret=None):
    """Fused-projection forward: qkv is the (B, S, 3*H*D) output of a
    single concatenated q/k/v matmul, consumed IN PLACE — the q, k and v
    segments are addressed by three BlockSpecs with lane-group index maps
    into the same array. Avoids the 3-way `jnp.split` the separate-input
    kernel forces on the serving path (profiled at ~64 ms/step of pure
    copies: one (32,1024,3840)->3x(32,1024,1280) split per level-2
    self-attention, 16 ms per site per two steps).
    Returns ((B, S, H*D) out, lse) like _flash_fwd_bs_hd."""
    if interpret is None:
        interpret = should_interpret()
    b, sq, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    pack = max(1, 128 // d)
    assert num_heads % pack == 0 and (d * pack) % 128 == 0
    hp = num_heads // pack
    sk = sq
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)

    lane = pack * d
    out_shape = [
        jax.ShapeDtypeStruct((b, sq, hd), qkv.dtype),
        jax.ShapeDtypeStruct((b * hp, pack, sq), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=4 * b * num_heads * sq * sk * d,
        bytes_accessed=2 * b * (3 * sq + sq) * hd,
        transcendentals=b * num_heads * sq * sk)

    if nk == 1 and _os.environ.get("VST_FLASH_MULTIPASS") != "1":
        # scratch-free single-pass kernel (see _flash_fwd_bs_hd)
        return pl.pallas_call(
            functools.partial(_attn_kernel_packed_single, scale=scale,
                              head_dim=d, pack=pack),
            grid=(b, hp, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, lane), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, block_k, lane),
                             lambda b, h, i, _hp=hp: (b, 0, _hp + h)),
                pl.BlockSpec((1, block_k, lane),
                             lambda b, h, i, _hp=hp: (b, 0, 2 * _hp + h)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, lane), lambda b, h, i: (b, i, h)),
                pl.BlockSpec((1, pack, block_q),
                             lambda b, h, i, _hp=hp: (b * _hp + h, 0, i)),
            ],
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=cost,
            interpret=interpret,
        )(qkv, qkv, qkv)

    grid = (b, hp, nq, nk)
    return pl.pallas_call(
        functools.partial(_attn_kernel_packed, scale=scale, kv_seq=sk,
                          block_k=block_k, head_dim=d, pack=pack),
        grid=grid,
        in_specs=[
            # lane-group index h selects head-group h of the q segment;
            # hp + h / 2*hp + h address the k / v segments of the SAME
            # fused array
            pl.BlockSpec((1, block_q, lane), lambda b, h, i, j: (b, i, h)),
            pl.BlockSpec((1, block_k, lane),
                         lambda b, h, i, j, _hp=hp: (b, j, _hp + h)),
            pl.BlockSpec((1, block_k, lane),
                         lambda b, h, i, j, _hp=hp: (b, j, 2 * _hp + h)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, lane), lambda b, h, i, j: (b, i, h)),
            pl.BlockSpec((1, pack, block_q),
                         lambda b, h, i, j, _hp=hp: (b * _hp + h, 0, i)),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, lane), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
        interpret=interpret,
    )(qkv, qkv, qkv)


def _xla_reference(q, k, v, scale):
    logits = jnp.einsum("bsd,btd->bst", q, k,
                        preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bst,btd->bsd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Backward kernels. Shared recompute: p = exp(q k^T * scale - lse),
# ds = p * (dp - delta) * scale with dp = dO v^T and
# delta = rowsum(dO * O) (computed in XLA — cheap elementwise).
#   dq = ds k        (accumulated over kv blocks)
#   dk = ds^T q,  dv = p^T dO   (accumulated over q blocks)
# ---------------------------------------------------------------------------

def _recompute_p_ds(q, k, v, do, lse, delta, *, scale, kv_seq, block_k, j,
                    q_seq, block_q, i):
    # mask padded kv columns / rows (see forward comment re 0 * garbage)
    kv_tail = kv_seq - j * block_k
    if kv_seq % block_k != 0:
        row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < kv_tail, v, 0)
        k = jnp.where(row < kv_tail, k, 0)

    # prescaled q (same fold + op order as the forward kernels, so the
    # recomputed p matches the saved lse bit-for-bit); callers keep the
    # ORIGINAL q for the dk = ds^T q contraction
    s = jax.lax.dot_general(q * (scale * LOG2E), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_seq % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_tail, s, NEG_INF)
    p = jnp.exp2(s - lse[:, None] * LOG2E)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None]) * scale
    # padded q rows carry garbage lse/do/delta -> NaN p and ds; zero the
    # rows themselves (p == 0 is not enough: 0 * NaN == NaN, and the
    # dk/dv accumulation sums over rows)
    if q_seq % block_q != 0:
        q_tail = q_seq - i * block_q
        rowq = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        p = jnp.where(rowq < q_tail, p, 0.0)
        ds = jnp.where(rowq < q_tail, ds, 0.0)
    return p, ds


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_ref, *, scale, kv_seq, block_k, q_seq, block_q):
    i, j = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _, ds = _recompute_p_ds(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], lse_ref[0, 0],
        delta_ref[0, 0], scale=scale, kv_seq=kv_seq, block_k=block_k,
        q_seq=q_seq, block_q=block_q, i=i, j=j)
    k_blk = k_ref[0]
    if kv_seq % block_k != 0:
        # ds is zero in padded kv columns, but 0 * uninitialized-k may
        # be NaN — the contraction must see masked k rows too
        kv_tail = kv_seq - j * block_k
        rowk = jax.lax.broadcasted_iota(jnp.int32, k_blk.shape, 0)
        k_blk = jnp.where(rowk < kv_tail, k_blk, 0)
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                dv_ref, dk_acc, dv_acc, *, scale, kv_seq, block_k, q_seq,
                block_q):
    j, i = pl.program_id(1), pl.program_id(2)  # kv outer, q inner
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    p, ds = _recompute_p_ds(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], lse_ref[0, 0],
        delta_ref[0, 0], scale=scale, kv_seq=kv_seq, block_k=block_k,
        q_seq=q_seq, block_q=block_q, i=i, j=j)
    q_blk = q_ref[0]
    do_blk = do_ref[0]
    if q_seq % block_q != 0:
        # the row-sum contractions touch padded q/do rows directly; even
        # with p/ds zeroed there, 0 * garbage may be NaN — zero the rows
        q_tail = q_seq - i * block_q
        rowq = jax.lax.broadcasted_iota(jnp.int32, q_blk.shape, 0)
        q_blk = jnp.where(rowq < q_tail, q_blk, 0)
        do_blk = jnp.where(rowq < q_tail, do_blk, 0)
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dqkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                 dk_ref, dv_ref, dk_acc, dv_acc, *, scale, kv_seq,
                 block_k, q_seq, block_q):
    """Fused dq+dk+dv for nk == 1 (the production configuration: one kv
    block covers the sequence). The split kernels each recompute p / dp
    / ds per (q, kv) block pair — at nk == 1 that is exactly twice the
    recompute work (two K=64 MXU matmuls and an EUP exp pass each).
    Here the grid iterates q blocks once: dq[i] = ds k is complete per
    iteration (kv is whole) and stores directly; dk/dv accumulate in
    scratch across q blocks. Bitwise-identical to the split kernels at
    nk == 1 (same helpers, same op order; tested in
    tests/test_flash_attention.py::TestFusedBwd)."""
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    p, ds = _recompute_p_ds(
        q_ref[0], k_ref[0], v_ref[0], do_ref[0], lse_ref[0, 0],
        delta_ref[0, 0], scale=scale, kv_seq=kv_seq, block_k=block_k,
        q_seq=q_seq, block_q=block_q, i=i, j=0)

    # nk == 1 -> kv_seq % block_k == 0: k needs no tail mask (see the
    # split dq kernel's masked branch)
    dq_ref[0] = jax.lax.dot_general(
        ds.astype(k_ref.dtype), k_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    q_blk = q_ref[0]
    do_blk = do_ref[0]
    if q_seq % block_q != 0:
        q_tail = q_seq - i * block_q
        rowq = jax.lax.broadcasted_iota(jnp.int32, q_blk.shape, 0)
        q_blk = jnp.where(rowq < q_tail, q_blk, 0)
        do_blk = jnp.where(rowq < q_tail, do_blk, 0)
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do_blk.dtype), do_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_bhsd(q, k, v, do, o, lse, *, scale, block_q, block_k,
                    interpret=None):
    if interpret is None:
        interpret = should_interpret()
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(sk, block_k)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]  # (bh, 1, sq) — see lse layout

    if nk == 1 and _os.environ.get("VST_FLASH_SPLIT_BWD") != "1":
        # one kv block covers the sequence: fused dq+dk+dv kernel halves
        # the p/ds recompute; VST_FLASH_SPLIT_BWD=1 restores the split
        # kernels for A/B
        kern = dict(scale=scale, kv_seq=sk, block_k=block_k, q_seq=sq,
                    block_q=block_q)
        q_spec = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0))
        kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i: (b, 0, 0))
        row_spec = pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i))
        dq, dk, dv = pl.pallas_call(
            functools.partial(_dqkv_kernel, **kern),
            grid=(bh, nq),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec,
                      row_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
            out_shape=[jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
                       jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
                       jax.ShapeDtypeStruct((bh, sk, d), v.dtype)],
            scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                            pltpu.VMEM((block_k, d), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=10 * bh * sq * sk * d,
                bytes_accessed=2 * bh * (4 * sq + 4 * sk) * d,
                transcendentals=bh * sq * sk),
            interpret=interpret,
        )(q, k, v, do, lse, delta)
        return dq, dk, dv

    kern = dict(scale=scale, kv_seq=sk, block_k=block_k, q_seq=sq,
                block_q=block_q)
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0))
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0))
    row_spec = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **kern),
        grid=(bh, nq, nk),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * sq * sk * d,
            bytes_accessed=2 * bh * (3 * sq + 2 * sk) * d,
            transcendentals=bh * sq * sk),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # dkv grid: kv outer, q inner (accumulate over q)
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0))
    kv_spec2 = pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0))
    row_spec2 = pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **kern),
        grid=(bh, nk, nq),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, row_spec2,
                  row_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, sk, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * sq * sk * d,
            bytes_accessed=2 * bh * (2 * sq + 4 * sk) * d,
            transcendentals=bh * sq * sk),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bhsd(q, k, v, scale, block_q, block_k):
    out, _ = _flash_fwd_bhsd(q, k, v, scale=scale, block_q=block_q,
                             block_k=block_k)
    return out


def _flash_bhsd_fwd(q, k, v, scale, block_q, block_k):
    out, lse = _flash_fwd_bhsd(q, k, v, scale=scale, block_q=block_q,
                               block_k=block_k)
    return out, (q, k, v, out, lse)


def _flash_bhsd_bwd(scale, block_q, block_k, res, g):
    q, k, v, o, lse = res
    import os
    if os.environ.get("VST_FLASH_XLA_BWD") == "1":
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(q_, k_, v_, scale), q, k, v)
        return vjp(g)
    return _flash_bwd_bhsd(q, k, v, g, o, lse, scale=scale,
                           block_q=block_q, block_k=block_k)


_flash_bhsd.defvjp(_flash_bhsd_fwd, _flash_bhsd_bwd)


# ---------------------------------------------------------------------------
# Packed-heads entry: forward never transposes; backward (training only)
# routes through the BHSD kernels with explicit transposes.
# ---------------------------------------------------------------------------

def _pack_of(d: int) -> int:
    return max(1, 128 // d)


def _packable(h: int, d: int) -> bool:
    pack = _pack_of(d)
    # lane group = pack*d must tile the 128-wide registers: d=64 packs
    # two heads, d in {128,256,384,512} runs one head per block; d=192
    # etc. would trip the kernel's tiling assert — use the BHSD path
    return (d * pack) % 128 == 0 and d <= 512 and h % pack == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_packed(q, k, v, num_heads, scale, block_q, block_k):
    out, _ = _flash_fwd_bs_hd(q, k, v, num_heads=num_heads, scale=scale,
                              block_q=block_q, block_k=block_k)
    return out


def _flash_packed_fwd(q, k, v, num_heads, scale, block_q, block_k):
    out, lse = _flash_fwd_bs_hd(q, k, v, num_heads=num_heads, scale=scale,
                                block_q=block_q, block_k=block_k)
    return out, (q, k, v, out, lse)


def _flash_packed_bwd(num_heads, scale, block_q, block_k, res, g):
    q, k, v, o, lse = res
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads

    def tob(x, s):
        return jnp.swapaxes(x.reshape(b, s, num_heads, d), 1, 2) \
            .reshape(b * num_heads, s, d)

    import os
    if os.environ.get("VST_FLASH_XLA_BWD") == "1":
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(q_, k_, v_, scale),
            tob(q, sq), tob(k, sk), tob(v, sk))
        dq, dk, dv = vjp(tob(g, sq))
    else:
        dq, dk, dv = _flash_bwd_bhsd(
            tob(q, sq), tob(k, sk), tob(v, sk), tob(g, sq), tob(o, sq),
            lse.reshape(b * num_heads, 1, sq), scale=scale,
            block_q=block_q, block_k=block_k)

    def back(x, s):
        return jnp.swapaxes(x.reshape(b, num_heads, s, d), 1, 2) \
            .reshape(b, s, hd)

    return back(dq, sq), back(dk, sk), back(dv, sk)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _flash_packed_qkv(qkv, num_heads, scale, block_q, block_k):
    out, _ = _flash_fwd_qkv_packed(qkv, num_heads=num_heads, scale=scale,
                                   block_q=block_q, block_k=block_k)
    return out


def _flash_packed_qkv_fwd(qkv, num_heads, scale, block_q, block_k):
    out, lse = _flash_fwd_qkv_packed(qkv, num_heads=num_heads, scale=scale,
                                     block_q=block_q, block_k=block_k)
    return out, (qkv, out, lse)


def _flash_packed_qkv_bwd(num_heads, scale, block_q, block_k, res, g):
    # the backward is off the serving hot path (training runs LoRA'd
    # projections, which never take the fused route); slice the fused
    # residual and reuse the BHSD backward kernels
    qkv, o, lse = res
    b, sq, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // num_heads
    q, k, v = (qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:])

    def tob(x):
        return jnp.swapaxes(x.reshape(b, sq, num_heads, d), 1, 2) \
            .reshape(b * num_heads, sq, d)

    dq, dk, dv = _flash_bwd_bhsd(
        tob(q), tob(k), tob(v), tob(g), tob(o),
        lse.reshape(b * num_heads, 1, sq), scale=scale,
        block_q=block_q, block_k=block_k)

    def back(x):
        return jnp.swapaxes(x.reshape(b, num_heads, sq, d), 1, 2) \
            .reshape(b, sq, hd)

    return (jnp.concatenate([back(dq), back(dk), back(dv)], axis=-1),)


_flash_packed_qkv.defvjp(_flash_packed_qkv_fwd, _flash_packed_qkv_bwd)


def flash_attention_qkv(qkv, num_heads: int, *, scale=None,
                        block_q: int = None, block_k: int = None):
    """Self-attention over a fused projection output.

    qkv: (B, S, 3*H*D) — the concatenated q/k/v columns of one matmul —
    returns (B, S, H*D). The kernel reads the three segments in place;
    nothing is ever split or copied. Requires a packable (H, D); callers
    should check `packable_qkv` and fall back to splitting otherwise.
    """
    b, s, hd3 = qkv.shape
    d = (hd3 // 3) // num_heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if block_q is None:
        block_q = DEFAULT_BLOCK_Q if d <= 128 else 512
    if block_k is None:
        block_k = DEFAULT_BLOCK_K if d <= 128 else 512
    assert _packable(num_heads, d), (num_heads, d)
    return _flash_packed_qkv(qkv, num_heads, float(scale), block_q, block_k)


def packable_qkv(num_heads: int, head_dim: int) -> bool:
    return _packable(num_heads, head_dim)


def flash_attention(q, k, v, *, scale=None, block_q: int = None,
                    block_k: int = None):
    """q, k, v: (B, S, H, D) -> (B, S, H, D). Differentiable."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if block_q is None:
        # large head dims (VAE attention, d=512) need smaller blocks to
        # stay inside VMEM: per-block bytes scale with block * d
        block_q = DEFAULT_BLOCK_Q if d <= 128 else 512
    if block_k is None:
        block_k = DEFAULT_BLOCK_K if d <= 128 else 512

    if _packable(h, d):
        # (B,S,H,D) <-> (B,S,H*D) are free bitcasts; the kernel reads the
        # projection outputs in place
        ob = _flash_packed(q.reshape(b, sq, h * d), k.reshape(b, sk, h * d),
                           v.reshape(b, sk, h * d), h, float(scale),
                           block_q, block_k)
        return ob.reshape(b, sq, h, d)

    def to_bhsd(x, s):
        return jnp.swapaxes(x, 1, 2).reshape(b * h, s, d)

    qb = to_bhsd(q, sq)
    kb = to_bhsd(k, sk)
    vb = to_bhsd(v, sk)
    ob = _flash_bhsd(qb, kb, vb, float(scale), block_q, block_k)
    return jnp.swapaxes(ob.reshape(b, h, sq, d), 1, 2)
