"""3x3-conv lowering sweep: XLA conv emitter vs 9-shifted-GEMM form.

RESULT (v5e, measured): the conv emitter wins at EVERY shape — do not
lower convs to GEMMs. The hypothesis was that the fp32 VAE decoder
sites (N=1, 512-1024px, 128-512 ch), whose chunk profile shows heavy
space-to-batch plumbing, would prefer the 9-GEMM form
`sum_{dy,dx} shift(x) @ W[dy,dx]` (H*W ~ 1M rows = a clean MXU GEMM,
no space-to-batch). Measured ladder (ms/conv, floor-corrected):

  (32,64,64,640)->640 bf16 : conv  6.0 (160 TF/s) | gemm9 10.6 ( 91)
  (32,32,32,2560)->1280    : conv 11.6 (167)      | gemm9 12.8 (152)
  (1,512,512,512)->512 f32 : conv 12.7 ( 98)      | gemm9 22.9 ( 54)
  (1,1024,1024,256)->256   : conv 18.0 ( 69)      | gemm9 44.8 ( 28)
  (1,1024,1024,128)->128   : conv  7.2 ( 43)      | gemm9 22.2 ( 14)

Why: the emitter reuses the 3x3 halo in VMEM (each input element is
read from HBM once and used 9 times), while the 9-GEMM form re-reads
the whole activation from HBM per tap — at (1,1024²,128) f32 that is
9 x 512 MB and purely bandwidth-bound. The space-to-batch plumbing in
the decode profile is already mitigated by chunk-1 decode (PERF.md);
within a single conv the emitter is fine. Numerics note: the default
f32 conv/dot carry ~2.4e-3 relative error (bf16 passes); HIGH gets
1.4e-5 at ~2x cost — parity tests pass at the default, matching torch
TF32-era tolerances.

  python benchmarks/conv_sweep.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

RPC_FLOOR_S = 0.0285


def conv_xla(x, w, precision=None):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


def make_gemm9(precision):
    def conv_gemm9(x, w):
        n, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = None
        for dy in range(3):
            for dx in range(3):
                xs = jax.lax.slice(
                    xp, (0, dy, dx, 0), (n, dy + h, dx + wd, c))
                t = jax.lax.dot_general(
                    xs, w[dy, dx].astype(x.dtype),
                    (((3,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
        return acc.astype(x.dtype)
    return conv_gemm9


def bench(fn, make_args, trials=5):
    out = fn(*make_args(0))
    float(jnp.sum(out.astype(jnp.float32)))
    times = []
    for t in range(trials):
        a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
        t0 = time.time()
        float(jnp.sum(fn(*a).astype(jnp.float32)))
        times.append(time.time() - t0)
    return min(times)


def chained(fn, cin, cout, iters):
    """Repeat conv on-chip to amortize the ~28.5 ms RPC floor. When
    cin != cout the output is re-widened by tiling (same cheap HBM op
    for every variant, so the comparison stays fair)."""
    def run(x, w):
        def body(y, _):
            y = fn(y, w)
            if cin != cout:
                reps = -(-cin // cout)
                y = jnp.tile(y, (1, 1, 1, reps))[..., :cin]
            return y, None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y
    return jax.jit(run)


def main():
    P = jax.lax.Precision
    # (N, H, W, Cin, Cout, dtype, iters)
    shapes = [
        # serving-step control (bf16, CFG-doubled video batch)
        (32, 64, 64, 640, 640, jnp.bfloat16, 8),
        (32, 32, 32, 2560, 1280, jnp.bfloat16, 8),
        # fp32 VAE decoder sites (N=1, big spatial — space-to-batch land)
        (1, 512, 512, 512, 512, jnp.float32, 8),
        (1, 1024, 1024, 256, 256, jnp.float32, 8),
        (1, 1024, 1024, 128, 128, jnp.float32, 16),
    ]
    for n, h, w, cin, cout, dtype, iters in shapes:
        def make_args(seed, n=n, h=h, w=w, cin=cin, cout=cout, dtype=dtype):
            ks = jax.random.split(jax.random.PRNGKey(seed), 2)
            x = jax.random.normal(ks[0], (n, h, w, cin), dtype)
            wt = jax.random.normal(ks[1], (3, 3, cin, cout),
                                   jnp.float32) * 0.02
            return x, wt

        variants = [
            ("xla-conv", lambda x, w: conv_xla(x, w)),
            ("gemm9-def", make_gemm9(None)),
        ]
        if dtype == jnp.float32:
            variants += [
                ("xla-high", lambda x, w: conv_xla(x, w, P.HIGH)),
                ("gemm9-high", make_gemm9(P.HIGH)),
                ("gemm9-highest", make_gemm9(P.HIGHEST)),
            ]

        flops = 2 * 9 * n * h * w * cin * cout
        print(f"shape ({n},{h},{w},{cin})->{cout} {jnp.dtype(dtype).name}  "
              f"{flops/1e9:.0f} GFLOP/conv")
        for name, fn in variants:
            t = bench(chained(fn, cin, cout, iters), make_args)
            tc = max(t - RPC_FLOOR_S, 1e-6) / iters
            print(f"  {name:13s} {t*1e3:7.1f} ms raw  {tc*1e3:7.2f} ms/conv"
                  f"  {flops/tc/1e12:6.1f} TF/s")
        # numerics vs a HIGHEST-precision f32 conv oracle
        x, wt = make_args(7)
        ref = jax.jit(lambda x_, w_: conv_xla(
            x_.astype(jnp.float32), w_, P.HIGHEST))(x, wt)
        import numpy as np
        refh = jax.device_get(ref)
        scale = float(np.abs(refh).max())
        for name, fn in variants:
            y = jax.device_get(jax.jit(fn)(x, wt)).astype("float32")
            print(f"  {name:13s} max|err|/|ref|max: "
                  f"{float(np.abs(y - refh).max()) / scale:.3e}")


if __name__ == "__main__":
    main()
