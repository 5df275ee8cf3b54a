"""LayerNorm implementation sweep at the denoise-step hot shapes.

The round-2 late profile shows `convert_reduce_fusion` (the LayerNorm
statistics pass) at ~128 ms/step: the mean/var reduction runs along the
MINOR (lane) axis, which XLA lowers as strided cross-lane shuffles at
~6x off memory bandwidth. Candidate: compute the row sums on the MXU by
contracting with a ones vector (the lane axis is the natural matmul
contraction axis), squaring shifted values for the second moment (same
shifted-two-pass guard as layers.group_norm — E[(x-K)^2]-E[x-K]^2 is
exact for constant K and kills the mean^2 cancellation).

Shapes: (32, 1024, 1280) (ch1280 transformer LN sites — 6 sites x 10
scanned layers x 3 norms) and (32, 4096, 640) (ch640 sites).

  python benchmarks/ln_sweep.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

RPC_FLOOR_S = 0.0285


def bench(fn, make_args, trials=5):
    out = fn(*make_args(0))
    float(jnp.sum(out))
    times = []
    for t in range(trials):
        a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
        t0 = time.time()
        float(jnp.sum(fn(*a)))
        times.append(time.time() - t0)
    return min(times)


def ln_current(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def make_ln_dot(precision):
    def ln_dot(x, scale, bias, eps=1e-5):
        c = x.shape[-1]
        k = x[..., :1].astype(jnp.float32)          # per-row shift guard
        xs = x.astype(jnp.float32) - k
        ones = jnp.ones((c,), jnp.float32)
        cd = ((x.ndim - 1,), (0,))
        s1 = jax.lax.dot_general(xs, ones, (cd, ((), ())),
                                 precision=precision)[..., None]
        s2 = jax.lax.dot_general(xs * xs, ones, (cd, ((), ())),
                                 precision=precision)[..., None]
        mean_s = s1 / c
        var = jnp.maximum(s2 / c - mean_s * mean_s, 0.0)
        y = (x.astype(jnp.float32) - (mean_s + k)) * jax.lax.rsqrt(var + eps)
        return (y * scale + bias).astype(x.dtype)
    return ln_dot


def make_ln_pallas(stats, block_m):
    def ln_pallas(x, scale, bias, eps=1e-5):
        from video_style_transfer_tpu.ops.layer_norm import layer_norm
        return layer_norm(x, scale, bias, eps=eps, stats=stats,
                          block_m=block_m)
    return ln_pallas


VARIANTS = (
    ("current", ln_current),
    ("dot-def", make_ln_dot(None)),
    ("dot-high", make_ln_dot(jax.lax.Precision.HIGH)),
    ("dot-highest", make_ln_dot(jax.lax.Precision.HIGHEST)),
    ("pl-red-256", make_ln_pallas("reduce", 256)),
    ("pl-dot-256", make_ln_pallas("dot", 256)),
    ("pl-dot-512", make_ln_pallas("dot", 512)),
    ("pl-dot-1024", make_ln_pallas("dot", 1024)),
)


ITERS = 64  # one LN is far below the ~28.5 ms RPC floor; chain in-program


def chained(fn):
    def run(x, scale, bias):
        def body(y, _):
            return fn(y, scale, bias), None
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y
    return jax.jit(run)


def main():
    shapes = [(32, 1024, 1280), (32, 4096, 640)]
    for b, s, c in shapes:
        def make_args(seed, b=b, s=s, c=c):
            ks = jax.random.split(jax.random.PRNGKey(seed), 2)
            x = jax.random.normal(ks[0], (b, s, c), jnp.bfloat16) \
                + jax.random.normal(ks[1], (b, s, 1), jnp.bfloat16) * 8
            return (x, jnp.ones((c,), jnp.float32),
                    jnp.zeros((c,), jnp.float32))

        nbytes = 2 * b * s * c * 2  # read + write bf16
        print(f"shape ({b},{s},{c})  {nbytes/1e6:.0f} MB moved min/iter")
        for name, fn in VARIANTS:
            t = bench(chained(fn), make_args)
            tc = max(t - RPC_FLOOR_S, 1e-6) / ITERS
            print(f"  {name:12s} {t*1e3:7.2f} ms raw  {tc*1e3:7.3f} ms/iter "
                  f"corrected  {nbytes/tc/1e9:6.0f} GB/s")
        # numerical check vs float64 two-pass (single application, on-device
        # so the TPU's actual matmul quantization is what is measured)
        x, sc, bi = make_args(7)
        xh = jax.device_get(x).astype("float64")
        m = xh.mean(-1, keepdims=True)
        v = ((xh - m) ** 2).mean(-1, keepdims=True)
        ref = (xh - m) / (v + 1e-5) ** 0.5
        import numpy as np
        for name, fn in VARIANTS:
            y = jax.device_get(jax.jit(fn)(x, sc, bi)).astype("float64")
            # compare against the bf16-rounded reference: error beyond the
            # output dtype's own quantization is what matters
            refq = jax.device_get(jnp.asarray(ref).astype(x.dtype)) \
                .astype("float64")
            print(f"  {name:12s} max|err| vs f64: "
                  f"{float(np.max(np.abs(y - ref))):.3e}   "
                  f"beyond-bf16: {float(np.max(np.abs(y - refq))):.3e}")


if __name__ == "__main__":
    main()
