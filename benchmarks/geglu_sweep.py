"""GEGLU projection kernel block-size sweep at the real serving shapes.

Hypothesis (round-2 profile: GEGLU bucket 455 ms/step at ~175 TF/s):
the kernel is W-bandwidth-bound, not MXU-bound. With grid
(m/block_m, inner/block_i) and j fastest, the x block stays VMEM-resident
across j (its index map ignores j — Pallas skips the refetch) but the FULL
W (2*c*inner bytes) streams once per row block: at the 1280-channel serving
level W = 26 MB and m/block_m = 64, i.e. ~1.7 GB of HBM traffic against
~2.2 ms of MXU work. Larger block_m divides W traffic linearly.

  python benchmarks/geglu_sweep.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

RPC_FLOOR_S = 0.0285
ITERS = 24  # one GEGLU (~1-5 ms) is below the RPC floor; chain in-program


def chained(fn):
    """Sequential on-chip chain: feed a slice of each output back into x
    so XLA cannot dedupe or parallelize the iterations."""
    def run(x, w, b):
        c = x.shape[-1]

        def body(xc, _):
            y = fn(xc, w, b)
            return xc + y[:, :c].astype(xc.dtype) * jnp.bfloat16(2 ** -14), None

        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y
    return jax.jit(run)


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


def main():
    from video_style_transfer_tpu.ops.geglu import geglu_projection

    # (label, m, c). inner = 2*c per SDXL FF (proj to 2*(4c), gate to 4c).
    shapes = [
        ("video L1 (32x4096, 640)", 32 * 4096, 640),
        ("video L2 (32x1024, 1280)", 32 * 1024, 1280),
        ("image b4 L1 (8x4096, 640)", 8 * 4096, 640),
        ("image b4 L2 (8x1024, 1280)", 8 * 1024, 1280),
    ]
    for label, m, c in shapes:
        inner = 4 * c
        flops = 4 * m * c * inner

        def make_args(seed, m=m, c=c, inner=inner):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            x = jax.random.normal(ks[0], (m, c), jnp.bfloat16)
            w = jax.random.normal(ks[1], (c, 2 * inner),
                                  jnp.bfloat16) / (c ** 0.5)
            b = jax.random.normal(ks[2], (2 * inner,), jnp.bfloat16)
            return x, w, b

        print(f"{label}  inner={inner}  ({flops/1e9:.0f} GFLOP)")
        gates = (os.environ.get("VST_SWEEP_GATES", "erf5").split(","))
        blocks = [int(v) for v in
                  os.environ.get("VST_SWEEP_BM", "512,1024,2048,4096")
                  .split(",")]
        for gate in gates:
            for bm in blocks:
                for bi in (512, 1024):
                    if inner % bi:
                        continue
                    fn = chained(
                        lambda x, w, b, bm=bm, bi=bi, g=gate:
                        geglu_projection(x, w, b, block_m=bm, block_i=bi,
                                         gate=g))
                    try:
                        t = bench(fn, make_args)
                    except Exception as e:  # noqa: BLE001
                        print(f"  {gate} bm={bm:4d} bi={bi:4d}  FAILED: "
                              f"{type(e).__name__}: {e}")
                        continue
                    tc = max(t - RPC_FLOOR_S, 1e-6) / ITERS
                    print(f"  {gate} bm={bm:4d} bi={bi:4d}  "
                          f"{tc*1e3:7.2f} ms/iter  "
                          f"{flops/tc/1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()
