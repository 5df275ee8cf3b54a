"""Packed-heads flash kernel block sweep — on-chip chained protocol.

The single-call-per-fetch protocol of flash_sweep_packed.py is unusable
when per-call time is near the tunnel's ~28.5 ms RPC floor (observed
60-270 ms scatter for a ~24 ms kernel). Here each trial jits a chain of
ITERS dependent kernel calls (q_{i+1} = out_i, k/v fixed) so one fetch
amortizes the floor and the chain defeats the (program, inputs) result
cache; per-iter time = (t_chain - floor) / ITERS.

  python benchmarks/flash_sweep_chain.py [--iters 16]
  python benchmarks/flash_sweep_chain.py --bwd   # fwd+bwd chain: fused
      # dq/dk/dv kernel (nk==1 default) vs VST_FLASH_SPLIT_BWD=1 split
      # kernels, at the training block configs
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

RPC_FLOOR_S = 0.0285


def bwd_mode(args):
    """A/B the nk==1 fused dq/dk/dv backward kernel against the split
    dq + dk/dv kernels (VST_FLASH_SPLIT_BWD=1), chained fwd+bwd per
    iteration. The env var is read at trace time, so each variant gets
    its own freshly-defined jitted chain."""
    from video_style_transfer_tpu.ops.flash_attention import _flash_packed

    shapes = ([(2, 256, 2, 64)] if args.tiny
              else [(32, 4096, 10, 64), (32, 1024, 20, 64)])
    for b, s, h, d in shapes:
        def make_args(seed, b=b, s=s, h=h, d=d):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            q = jax.random.normal(ks[0], (b, s, h * d), jnp.bfloat16)
            k = jax.random.normal(ks[1], (b, s, h * d), jnp.bfloat16)
            v = jax.random.normal(ks[2], (b, s, h * d), jnp.bfloat16)
            return q, k, v

        # fwd 4 + bwd 10 matmul-flops factors (kernel cost estimates)
        flops = 14 * b * h * s * s * d
        for variant in ("fused", "split"):
            os.environ["VST_FLASH_SPLIT_BWD"] = (
                "1" if variant == "split" else "0")

            @jax.jit
            def chain(q, k, v, s=s, h=h, d=d):
                def loss(q, k, v):
                    o = _flash_packed(q, k, v, h, d ** -0.5, 1024,
                                      min(4096, s))
                    return jnp.sum(o.astype(jnp.float32) ** 2)

                g = jax.grad(loss, argnums=(0, 1, 2))
                for _ in range(args.iters):
                    dq, dk, dv = g(q, k, v)
                    # feed grads back so iterations are data-dependent
                    # (defeats the result cache) with bounded magnitude
                    q = (q + 1e-3 * dq).astype(jnp.bfloat16)
                    k = (k + 1e-3 * dk).astype(jnp.bfloat16)
                    v = (v + 1e-3 * dv).astype(jnp.bfloat16)
                return q

            def run(q, k, v, chain=chain):
                return float(jnp.sum(chain(q, k, v).astype(jnp.float32)))

            try:
                run(*make_args(0))  # compile
                times = []
                for t in range(args.trials):
                    a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
                    t0 = time.time()
                    run(*a)
                    times.append(time.time() - t0)
                sec = max(min(times) - RPC_FLOOR_S, 1e-6) / args.iters
            except Exception as e:
                print(json.dumps({"shape": [b, s, h, d], "impl": variant,
                                  "error": str(e)[:200]}), flush=True)
                continue
            print(json.dumps({
                "shape": [b, s, h, d], "impl": f"fwdbwd_{variant}",
                "ms": round(sec * 1e3, 2),
                "tflops": round(flops / sec / 1e12, 1)}), flush=True)
    os.environ.pop("VST_FLASH_SPLIT_BWD", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--bwd", action="store_true",
                    help="chain fwd+bwd; A/B fused vs split backward")
    ap.add_argument("--tiny", action="store_true",
                    help="wiring smoke at a tiny shape (CPU interpret ok)")
    args = ap.parse_args()
    if args.bwd:
        bwd_mode(args)
        return
    from video_style_transfer_tpu.ops.flash_attention import _flash_packed

    # (B, S, H, D): 640ch level = 32 rows x 10 heads x 4096 tokens;
    # 1280ch level = 32 rows x 20 heads x 1024 tokens
    shapes = [(32, 4096, 10, 64), (32, 1024, 20, 64)]
    for b, s, h, d in shapes:
        def make_args(seed, b=b, s=s, h=h, d=d):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            q = jax.random.normal(ks[0], (b, s, h * d), jnp.bfloat16)
            k = jax.random.normal(ks[1], (b, s, h * d), jnp.bfloat16)
            v = jax.random.normal(ks[2], (b, s, h * d), jnp.bfloat16)
            return q, k, v

        flops = 4 * b * h * s * s * d
        for bq, bk in [(512, 1024), (1024, 1024), (512, 2048),
                       (1024, 2048), (512, 4096), (256, 4096),
                       (1024, 4096)]:
            if bq > s or bk > s:
                continue

            @jax.jit
            def chain(q, k, v, bq=bq, bk=bk):
                for _ in range(args.iters):
                    # outputs are softmax-averaged rows (|q| shrinks);
                    # rescale so logits stay in a realistic range
                    q = _flash_packed(q, k, v, h, d ** -0.5, bq, bk)
                    q = (q * 4.0).astype(jnp.bfloat16)
                return q

            def run(q, k, v, chain=chain):
                return float(jnp.sum(chain(q, k, v).astype(jnp.float32)))

            try:
                run(*make_args(0))  # compile
                times = []
                for t in range(args.trials):
                    a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
                    t0 = time.time()
                    run(*a)
                    times.append(time.time() - t0)
                sec = max(min(times) - RPC_FLOOR_S, 1e-6) / args.iters
            except Exception as e:
                print(json.dumps({"shape": [b, s, h, d],
                                  "impl": f"packed_{bq}_{bk}",
                                  "error": str(e)[:120]}), flush=True)
                continue
            print(json.dumps({
                "shape": [b, s, h, d], "impl": f"packed_{bq}_{bk}",
                "ms": round(sec * 1e3, 2),
                "tflops": round(flops / sec / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
