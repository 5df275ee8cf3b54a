"""Packed-heads flash kernel block sweep at the real serving shapes
(the production path: (B, S, H*D) activations straight from the
projections). Sweeps kv-block sizes up to the whole sequence — block_k =
S runs single-pass with no online-softmax correction chain.

  python benchmarks/flash_sweep_packed.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp


def bench(fn, make_args, trials=3):
    fn(*make_args(0))
    times = []
    for t in range(trials):
        a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
        t0 = time.time()
        fn(*a)
        times.append(time.time() - t0)
    return min(times)


def main():
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
        for bq, bk in [(1024, 1024), (512, 2048), (1024, 2048),
                       (512, 4096), (256, 4096), (1024, 4096),
                       (2048, 2048), (2048, 4096)]:
            if bq > s or bk > s:
                continue

            @jax.jit
            def flash(q, k, v, bq=bq, bk=bk):
                return _flash_packed(q, k, v, h, d ** -0.5, bq, bk)

            def run(q, k, v, flash=flash):
                return float(jnp.sum(flash(q, k, v).astype(jnp.float32)))

            try:
                sec = bench(run, make_args)
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
