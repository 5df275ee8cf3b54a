"""Per-shard kernel efficiency: full-batch vs 1/8-batch shapes.

The v5e-8 projection divides single-chip denoise time by 8, which
assumes the row-sharded kernels run at the SAME TF/s on 1/8 of the
rows. This measures that assumption (VERDICT r4 next-item 2): each
kernel family at its full 16-frame CFG-pair serving shape AND at the
per-device shape under 8-way frame sharding (rows/8, pixels/8), on one
chip, chained in-program to amortize the tunnel's ~28.5 ms RPC floor.

Families (the serving step's Pallas kernels):
  flash     packed spatial self-attention (rows B*F -> B*F/8)
  geglu     FF projection (rows M -> M/8)
  temporal  pixel-lanes frame attention (pixels N -> N/8; F stays 16 —
            the all-to-all hands every device ALL frames of 1/8 of the
            pixels)

Output: one JSON line per (family, shape, variant) with ms + TF/s, and
a final summary line with the per-family shard/full efficiency ratios
plus the row-weighted denoise slowdown factor bench.py's corrected
projection uses.

  python benchmarks/shard_efficiency.py            # TPU
  python benchmarks/shard_efficiency.py --tiny     # wiring smoke
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

RPC_FLOOR_S = 0.0285


def timed_chain(build_run, make_args, iters, trials):
    """build_run(iters) -> run(*args). Adaptive chain length: if the
    whole chain lands near the ~28.5 ms RPC floor the per-iter time is
    noise (observed: a "423 TF/s" GEGLU reading ABOVE the 197 TF/s
    chip peak at 16 iters on a 1/8-rows shape) — quadruple iters until
    the chain takes >= 150 ms, then subtract the floor once."""
    while True:
        run = build_run(iters)
        run(*make_args(0))  # compile + warm
        times = []
        for t in range(trials):
            a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
            t0 = time.time()
            run(*a)
            times.append(time.time() - t0)
        tmin = min(times)
        if tmin >= 0.15 or iters >= 4096:
            return max(tmin - RPC_FLOOR_S, 1e-6) / iters
        iters *= 4


def bench_flash(shapes, iters, trials):
    from video_style_transfer_tpu.ops.flash_attention import _flash_packed

    out = []
    for b, s, h, d in shapes:
        def make_args(seed, b=b, s=s, h=h, d=d):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            return tuple(jax.random.normal(k, (b, s, h * d), jnp.bfloat16)
                         for k in ks)

        flops = 4 * b * h * s * s * d

        def build_run(n_it, s=s, h=h, d=d):
            @jax.jit
            def chain(q, k, v):
                for _ in range(n_it):
                    q = _flash_packed(q, k, v, h, d ** -0.5, 1024,
                                      min(4096, s))
                    q = (q * 4.0).astype(jnp.bfloat16)
                return q

            return lambda q, k, v: float(
                jnp.sum(chain(q, k, v).astype(jnp.float32)))

        sec = timed_chain(build_run, make_args, iters, trials)
        rec = {"family": "flash", "shape": [b, s, h, d],
               "ms": round(sec * 1e3, 3),
               "tflops": round(flops / sec / 1e12, 1)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def bench_geglu(shapes, iters, trials):
    from video_style_transfer_tpu.ops.geglu import geglu_projection

    out = []
    for m, c in shapes:
        inner = 4 * c
        flops = 4 * m * c * inner

        def make_args(seed, m=m, c=c, inner=inner):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            x = jax.random.normal(ks[0], (m, c), jnp.bfloat16)
            w = jax.random.normal(ks[1], (c, 2 * inner),
                                  jnp.bfloat16) / (c ** 0.5)
            b = jax.random.normal(ks[2], (2 * inner,), jnp.bfloat16)
            return x, w, b

        def build_run(n_it, c=c):
            @jax.jit
            def chain(x, w, b):
                def body(xc, _):
                    y = geglu_projection(xc, w, b)
                    return xc + y[:, :c].astype(xc.dtype) \
                        * jnp.bfloat16(2 ** -14), None

                y, _ = jax.lax.scan(body, x, None, length=n_it)
                return y

            return lambda x, w, b: float(
                jnp.sum(chain(x, w, b).astype(jnp.float32)))

        sec = timed_chain(build_run, make_args, iters, trials)
        rec = {"family": "geglu", "shape": [m, c],
               "ms": round(sec * 1e3, 3),
               "tflops": round(flops / sec / 1e12, 1)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def bench_temporal(shapes, iters, trials, f):
    """shapes: (P_channels, N_pixels); heads = channels/64 (SDXL motion:
    head_dim 64 at every level — 320ch/5h is actually 8 heads of 40...
    use the model's own convention: heads=8, head_dim=ch/8)."""
    from video_style_transfer_tpu.ops.temporal_attention import (
        temporal_attention_frames)

    out = []
    for p, n in shapes:
        heads = 8
        flops = 4 * n * p * f * f  # per head: 2*2*F^2*d matmuls, summed

        def make_args(seed, p=p, n=n):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3 * f)
            qs = [jax.random.normal(ks[3 * i], (p, n), jnp.bfloat16)
                  for i in range(f)]
            kv = [jax.random.normal(ks[3 * i + 1], (p, n), jnp.bfloat16)
                  for i in range(f)]
            vs = [jax.random.normal(ks[3 * i + 2], (p, n), jnp.bfloat16)
                  for i in range(f)]
            return qs, kv, vs

        def build_run(n_it):
            @jax.jit
            def chain(qs, ks_, vs):
                for _ in range(n_it):
                    os_ = temporal_attention_frames(qs, ks_, vs,
                                                    num_heads=heads)
                    qs = [(o * 4.0).astype(jnp.bfloat16) for o in os_]
                return qs

            return lambda qs, ks_, vs: float(
                sum(jnp.sum(q.astype(jnp.float32))
                    for q in chain(qs, ks_, vs)))

        sec = timed_chain(build_run, make_args, iters, trials)
        rec = {"family": "temporal", "shape": [p, f, n],
               "ms": round(sec * 1e3, 3),
               "tflops": round(flops / sec / 1e12, 2)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def bench_conv(shapes, iters, trials):
    """3x3 NHWC/HWIO conv (the UNet resnet stem) at full vs 1/8 batch:
    the non-Pallas spatial FLOPs (XLA's kOutput fusions) whose tiling
    could degrade at small N."""
    from jax import lax

    out = []
    for n_, hw, c in shapes:
        flops = 2 * n_ * hw * hw * c * c * 9

        def make_args(seed, n_=n_, hw=hw, c=c):
            ks = jax.random.split(jax.random.PRNGKey(seed), 2)
            x = jax.random.normal(ks[0], (n_, hw, hw, c), jnp.bfloat16)
            w = jax.random.normal(ks[1], (3, 3, c, c),
                                  jnp.bfloat16) / (3 * c ** 0.5)
            return x, w

        def build_run(n_it):
            @jax.jit
            def chain(x, w):
                def body(xc, _):
                    y = lax.conv_general_dilated(
                        xc, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                    return (y * 2 ** -6).astype(jnp.bfloat16), None

                y, _ = jax.lax.scan(body, x, None, length=n_it)
                return y

            return lambda x, w: float(
                jnp.sum(chain(x, w).astype(jnp.float32)))

        sec = timed_chain(build_run, make_args, iters, trials)
        rec = {"family": "conv", "shape": [n_, hw, c],
               "ms": round(sec * 1e3, 3),
               "tflops": round(flops / sec / 1e12, 1)}
        out.append(rec)
        print(json.dumps(rec), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--shard_div", type=int, default=8,
                    help="devices the frame axis shards over")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--families", default="flash,geglu,conv,temporal")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.expanduser("~"), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    n = args.shard_div
    fams = args.families.split(",")
    results = {}
    if args.tiny:
        if "flash" in fams:
            results["flash"] = bench_flash([(2, 256, 2, 64),
                                            (1, 256, 2, 64)], 4096, 1)
        print(json.dumps({"summary": "tiny smoke ok"}))
        return

    # serving shapes: 16f CFG pair = 32 rows. Full vs rows/n.
    if "flash" in fams:
        results["flash"] = bench_flash(
            [(32, 4096, 10, 64), (32 // n, 4096, 10, 64),
             (32, 1024, 20, 64), (32 // n, 1024, 20, 64)],
            args.iters, args.trials)
    if "geglu" in fams:
        results["geglu"] = bench_geglu(
            [(32 * 4096, 640), (32 * 4096 // n, 640),
             (32 * 1024, 1280), (32 * 1024 // n, 1280)],
            args.iters, args.trials)
    if "conv" in fams:
        # UNet resnet 3x3 convs per level (rows = B*F = 32 -> 4)
        results["conv"] = bench_conv(
            [(32, 128, 320), (32 // n, 128, 320),
             (32, 64, 640), (32 // n, 64, 640),
             (32, 32, 1280), (32 // n, 32, 1280)],
            args.iters, args.trials)
    if "temporal" in fams:
        # pixel-lanes shapes per motion level (CFG pair batch 2):
        # level 0: 320ch, 2*128^2 px; level 1: 640ch, 2*64^2;
        # level 2: 1280ch, 2*32^2. Sharded: pixels/n, all 16 frames.
        results["temporal"] = bench_temporal(
            [(320, 2 * 128 * 128), (320, 2 * 128 * 128 // n),
             (640, 2 * 64 * 64), (640, 2 * 64 * 64 // n),
             (1280, 2 * 32 * 32), (1280, 2 * 32 * 32 // n)],
            args.iters, args.trials, f=16)

    summary = {"summary": "shard_efficiency", "shard_div": n}
    for fam, recs in results.items():
        ratios = []
        for i in range(0, len(recs), 2):
            full, shard = recs[i], recs[i + 1]
            # efficiency ratio: per-row time at shard shape vs full
            # (1.0 = perfect; >1 = the small shape runs slower per row)
            rows_full = full["shape"][0] if fam != "temporal" \
                else full["shape"][2]
            rows_shard = shard["shape"][0] if fam != "temporal" \
                else shard["shape"][2]
            slow = (shard["ms"] / rows_shard) / (full["ms"] / rows_full)
            ratios.append(round(slow, 3))
        summary[f"{fam}_per_row_slowdown"] = ratios
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
