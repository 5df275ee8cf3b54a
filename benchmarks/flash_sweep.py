"""Flash-attention kernel block sweep at the real denoise shapes.

The 16-frame CFG-doubled 1024^2 video workload hits spatial self-attention
at (BH=320, S=4096, D=64) [32 rows x 10 heads, 640ch level] and
(BH=640, S=1024, D=64) [32 rows x 20 heads, 1280ch level]. This sweeps
kernel block sizes against the XLA attention baseline, with the tunnel's
forced-fetch / fresh-input protocol.

  python benchmarks/flash_sweep.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp


def bench(fn, make_args, trials=3):
    fn(*make_args(0))  # compile+warm (fetches inside)
    times = []
    for t in range(trials):
        a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
        t0 = time.time()
        fn(*a)
        times.append(time.time() - t0)
    return min(times)


def main():
    from video_style_transfer_tpu.ops.flash_attention import _flash_bhsd

    shapes = [(320, 4096, 64), (640, 1024, 64)]
    results = []
    for bh, s, d in shapes:
        def make_args(seed, bh=bh, s=s, d=d):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            q = jax.random.normal(ks[0], (bh, s, d), jnp.bfloat16)
            k = jax.random.normal(ks[1], (bh, s, d), jnp.bfloat16)
            v = jax.random.normal(ks[2], (bh, s, d), jnp.bfloat16)
            return q, k, v

        flops = 4 * bh * s * s * d

        # XLA baseline on (BH, S, D) directly
        @jax.jit
        def xla_attn(q, k, v):
            logits = jnp.einsum("bsd,btd->bst", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (d ** -0.5)
            w = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bst,btd->bsd", w.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            return o.astype(q.dtype)

        def run_xla(q, k, v):
            return float(jnp.sum(xla_attn(q, k, v).astype(jnp.float32)))

        sec = bench(run_xla, make_args)
        results.append({"shape": [bh, s, d], "impl": "xla",
                        "ms": round(sec * 1e3, 2),
                        "tflops": round(flops / sec / 1e12, 1)})
        print(json.dumps(results[-1]), flush=True)

        for bq, bk in [(256, 1024), (512, 512), (512, 1024), (512, 2048),
                       (1024, 512), (1024, 1024), (1024, 2048),
                       (2048, 1024), (2048, 2048), (1024, 4096),
                       (2048, 512)]:
            if bq > s or bk > s:
                continue

            @jax.jit
            def flash(q, k, v, bq=bq, bk=bk):
                return _flash_bhsd(q, k, v, d ** -0.5, bq, bk)

            def run_flash(q, k, v, flash=flash):
                return float(jnp.sum(flash(q, k, v).astype(jnp.float32)))

            sec = bench(run_flash, make_args)
            results.append({"shape": [bh, s, d], "impl": f"flash_{bq}_{bk}",
                            "ms": round(sec * 1e3, 2),
                            "tflops": round(flops / sec / 1e12, 1)})
            print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
