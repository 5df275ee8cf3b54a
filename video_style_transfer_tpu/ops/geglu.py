"""Fused GEGLU projection — Pallas TPU kernel.

The transformer FF layer (diffusers FeedForward w/ GEGLU; reference
unzip_attention.py:222-228) computes ``h, g = split(x @ W, 2); h *
gelu(g)``. XLA materializes the full 2*inner projection (640 MB bf16 at
the SDXL mid level per execution) and gates it in a separate loop
fusion — profiled at ~95 ms per 10-layer transformer in the full-scale
denoise step. This kernel computes both halves as two MXU dots per
output tile and applies the gate in the epilogue, writing only the
gated half: one 2x-inner round trip of HBM traffic saved per FF.

W stays the checkpoint layout (C, 2*inner) with halves [W_h | W_g]; the
kernel receives it twice with index maps offset by inner, so no slice is
ever materialized. gelu is exact-erf to under the bf16 output ULP; the
in-kernel approximation is selectable (_GATES / VST_GEGLU_GATE) and the
default is the measured-fastest variant (see _DEFAULT_GATE note).

Backward: a hand-written dtype-careful VJP (_geglu_bwd) — matmul
boundaries stay in the activation dtype while the gelu'/pdf gate math
fuses in f32, so no 2x-inner intermediate is kept in fp32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _erf_as(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs error 1.5e-7 —
    below bf16 output precision and the fp32 golden-test tolerances).
    Mosaic has no erf primitive; exp2 is the VPU transcendental."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    e = jnp.exp2(-(ax * ax) * _LOG2E)
    return sign * (1.0 - poly * e)


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_as(x * (2.0 ** -0.5)))


def _gelu_cdf3(x):
    """gelu via the DIRECT normal CDF (Abramowitz-Stegun 26.2.16,
    3-term, |err(Phi)| < 1e-5 => |err(gelu)| < ~6e-5 absolute — still
    ~60x under the bf16 output ULP at |x|~2). Shorter VPU chain than the
    erf route: the 0.5/(1/sqrt2) wraps fold into the CDF constants and
    the 5-term poly drops to 3 (~17 elementwise ops vs ~23)."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.33267 * ax)
    poly = t * (0.4361836 + t * (-0.1201676 + t * 0.9372980))
    pdf = 0.3989422804014327 * jnp.exp2(-(0.5 * _LOG2E) * (ax * ax))
    phi_pos = 1.0 - pdf * poly
    phi = jnp.where(x >= 0, phi_pos, 1.0 - phi_pos)
    return x * phi


# Degree-14 polynomial for erf(x/sqrt(2)) = x*R(x^2), Chebyshev-fit in
# t = 2*x^2/XMAX^2 - 1 and evaluated by Horner in the t POWER basis — the
# [-1,1] domain keeps every partial product <= sum|coef| = 0.8, so f32
# Horner round-off stays ~1 ulp (a power-series-in-x^2 form of the same
# fit loses 3 decades to cancellation). Input clamped to +-XMAX where
# erf has saturated to 1 within 7e-8. Measured max |gelu error| vs
# float64 exact erf: 1.7e-6 over [-9, 9] in f32 arithmetic — erf5-class
# accuracy with NO transcendentals: the erf5/cdf3 chains spend most of
# the gate's VPU time in exp2 + reciprocal (multi-cycle ops); this is
# 14 fma + clamp + 3 mul of single-cycle work.
_P14_XMAX = 5.4
_P14_TSCALE = 2.0 / (_P14_XMAX * _P14_XMAX)
_P14_COEF = (
    0.26185622220921656, -0.13065609481680923, 0.09699951875067843,
    -0.07841408412755317, 0.06422728013461654, -0.051488954314033455,
    0.03932888845773156, -0.027941163343751726, 0.019183359175576342,
    -0.01340499669652595, 0.007504966895981539, -0.0023944706774313563,
    0.0016048457692697362, -0.002049756592036783, 0.00082965585022015,
)


def _gelu_poly14(x):
    xc = jnp.clip(x, -_P14_XMAX, _P14_XMAX)
    t = xc * xc * _P14_TSCALE - 1.0
    r = jnp.full_like(t, _P14_COEF[-1])
    for a in _P14_COEF[-2::-1]:
        r = r * t + a
    return 0.5 * x * (1.0 + xc * r)


_GATES = {"erf5": _gelu_exact, "cdf3": _gelu_cdf3, "poly14": _gelu_poly14}


def _make_kernel(gate):
    def _kernel(x_ref, wh_ref, wg_ref, bh_ref, bg_ref, o_ref):
        x = x_ref[...]
        h = jax.lax.dot_general(x, wh_ref[...].astype(x.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        g = jax.lax.dot_general(x, wg_ref[...].astype(x.dtype),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h + bh_ref[...].astype(jnp.float32)
        g = g + bg_ref[...].astype(jnp.float32)
        o_ref[...] = (h * gate(g)).astype(o_ref.dtype)
    return _kernel


def _fwd_call(x2d, w, b, *, inner: int, block_m: int, block_i: int,
              gate: str = "erf5", interpret=None):
    if interpret is None:
        from video_style_transfer_tpu.ops.common import should_interpret
        interpret = should_interpret()
    m, c = x2d.shape
    bm = min(block_m, m)
    bi = min(block_i, inner)
    assert inner % bi == 0, (inner, bi)  # gate-half index offset below
    grid = (pl.cdiv(m, bm), inner // bi)
    nb_i = inner // bi
    return pl.pallas_call(
        _make_kernel(_GATES[gate]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, c), lambda i, j: (i, 0)),
            # W passed twice: h half at block column j, gate half at
            # block column j + inner/bi
            pl.BlockSpec((c, bi), lambda i, j: (0, j)),
            pl.BlockSpec((c, bi), lambda i, j, _o=nb_i: (0, j + _o)),
            pl.BlockSpec((1, bi), lambda i, j: (0, j)),
            pl.BlockSpec((1, bi), lambda i, j, _o=nb_i: (0, j + _o)),
        ],
        out_specs=pl.BlockSpec((bm, bi), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, inner), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * c * inner,
            bytes_accessed=2 * (m * c + 2 * c * inner + m * inner),
            transcendentals=m * inner),
        interpret=interpret,
    )(x2d, w, w, b.reshape(1, -1), b.reshape(1, -1))


def _reference(x2d, w, b, gate: str = None):
    """XLA fallback for shapes the kernel can't tile. Applies the SAME
    gate approximation as the kernel (f32, matching op order) so the
    tiled and fallback paths agree to round-off — with exact jax.nn.gelu
    here, two calls differing only in row count (m%8) would diverge by
    the gate's full approximation error."""
    y = jnp.dot(x2d, w.astype(x2d.dtype)) + b.astype(x2d.dtype)
    h, g = jnp.split(y, 2, axis=-1)
    gate_fn = _GATES[gate] if gate else jax.nn.gelu
    if gate:
        gated = gate_fn(g.astype(jnp.float32))
    else:
        gated = jax.nn.gelu(g.astype(jnp.float32), approximate=False)
    return h * gated.astype(h.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _geglu(x2d, w, b, inner, block_m, block_i, gate):
    return _fwd_call(x2d, w, b, inner=inner, block_m=block_m,
                     block_i=block_i, gate=gate)


def _geglu_fwd(x2d, w, b, inner, block_m, block_i, gate):
    out = _fwd_call(x2d, w, b, inner=inner, block_m=block_m,
                    block_i=block_i, gate=gate)
    return out, (x2d, w, b)


def _geglu_bwd(inner, block_m, block_i, gate, res, g_out):
    """Manual backward: the jax.vjp(_reference) form materialized f32
    (M, inner) intermediates (640 MB each at the motion-FF level-0
    training shape) that, with fragmentation, pushed the full-scale
    stage-2 step over HBM. Here every tensor crossing a matmul boundary
    is activation-dtype; the f32 gelu'/pdf math stays inside one
    elementwise fusion. d/dz[z*phi(z)] = phi(z) + z*pdf(z)."""
    import math as _math
    x2d, w, b = res
    dt = x2d.dtype
    wh = w[:, :inner].astype(dt)
    wg = w[:, inner:].astype(dt)
    yh = jnp.dot(x2d, wh) + b[:inner].astype(dt)
    yg = jnp.dot(x2d, wg) + b[inner:].astype(dt)
    ygf = yg.astype(jnp.float32)
    phi = 0.5 * (1.0 + jax.lax.erf(ygf * (2.0 ** -0.5)))
    pdf = (1.0 / _math.sqrt(2.0 * _math.pi)) * jnp.exp(-0.5 * ygf * ygf)
    dyh = (g_out.astype(jnp.float32) * (ygf * phi)).astype(dt)
    dyg = (g_out.astype(jnp.float32) * yh.astype(jnp.float32)
           * (phi + ygf * pdf)).astype(dt)
    dx = jnp.dot(dyh, wh.T) + jnp.dot(dyg, wg.T)
    dw = jnp.concatenate([x2d.T @ dyh, x2d.T @ dyg],
                         axis=1).astype(w.dtype)
    db = jnp.concatenate([dyh.sum(0), dyg.sum(0)]).astype(b.dtype)
    return dx, dw, db


_geglu.defvjp(_geglu_fwd, _geglu_bwd)


def _pick_block_i(inner: int, cap: int) -> int:
    """Largest 128-multiple divisor of inner that fits the cap (0 if
    none). inner=1280 -> 256 at cap 512; 2560/5120 -> 512."""
    best = 0
    d = 128
    while d <= min(cap, inner):
        if inner % d == 0:
            best = d
        d += 128
    return best


import os as _os

# benchmarks/geglu_sweep.py (on-chip 24-iter chain, v5e): block_m=2048
# beats 512 at every serving shape — video L1 132.6 -> 140.9 TF/s, video
# L2 160.6 -> 169.3, image-b4 L2 185.8 -> 194.4 (W streams once per row
# block, so quadrupling block_m cuts W re-reads 4x; past 2048 the f32
# h/g intermediates crowd VMEM and L2-shape times regress).
_DEFAULT_BLOCK_M = int(_os.environ.get("VST_GEGLU_BLOCK_M", "2048"))
# gate variant: "cdf3" (direct 3-term normal CDF — the measured-fastest
# chain, measured max |gelu err| 2.6e-5 at x~2.4 (A-S bounds Phi to
# 1e-5, gelu err scales as |x|*1e-5; two orders of magnitude under
# bf16's own 2^-9 relative round-off),
# "erf5" (A-S 7.1.26 erf, err < 1.5e-7, the round-1 default), or
# "poly14" (transcendental-free clamped Chebyshev erf, err < 2e-6).
# 10-step e2e video A/B on v5e, two reps each: cdf3 21.18/21.19 s
# denoise, poly14 21.42/21.38, erf5 21.56/21.56 — cdf3 is ~38 ms/step
# (+1.6% e2e fps) over erf5; the VPU pipelines cdf3's exp2+reciprocal
# better than poly14's 14 serial FMAs.
#
# The default is DTYPE-GATED: cdf3's 2.6e-5 absolute error is ~100x
# under bf16 round-off (2^-9 relative) but ABOVE fp32 parity tolerances
# (torch-parity tests assert 2e-5 on f32), so f32 inputs — stage-1 fp32
# training, parity tests — get erf5 while bf16/f16 serving keeps cdf3.
_DEFAULT_GATE = _os.environ.get("VST_GEGLU_GATE", "cdf3")
_DEFAULT_GATE_F32 = _os.environ.get("VST_GEGLU_GATE_F32", "erf5")


def _default_gate_for(dtype) -> str:
    if dtype == jnp.float32 or dtype == jnp.float64:
        return _DEFAULT_GATE_F32
    return _DEFAULT_GATE


def geglu_projection(x, w, b, *, block_m: int = None, block_i: int = 512,
                     gate: str = None):
    """x: (..., C); w: (C, 2*inner); b: (2*inner,). Returns
    (..., inner) = h * gelu(g) with [h|g] = x@w + b. Falls back to the
    XLA form when shapes don't tile (tiny test configs). C needs no
    alignment — the x/W blocks span the full C dim."""
    if block_m is None:
        block_m = _DEFAULT_BLOCK_M
    if gate is None:
        gate = _default_gate_for(x.dtype)
    c = x.shape[-1]
    inner = w.shape[1] // 2
    lead = x.shape[:-1]
    x2d = x.reshape(-1, c)
    m = x2d.shape[0]
    bi = _pick_block_i(inner, block_i)
    if bi == 0 or m % 8 != 0:
        out = _reference(x2d, w.astype(x2d.dtype), b, gate)
    else:
        out = _geglu(x2d, w, b, inner, block_m, bi, gate)
    return out.reshape(lead + (inner,))
