"""Cross-attention (kv=77) implementation sweep at the real denoise shapes.

The round-2 serving profile showed the flash kernel running latency-bound on
cross-attention (seq_k = 77 text tokens): ~5 TF/s and ~160 ms/step at the
1280-channel level. Candidates:

  pallas      : current packed-heads flash kernel (block_k min'd to 77)
  xla_bhsd    : sdpa_xla — materialized swapaxes to (B,H,S,D)
  xla_native  : einsum directly on (B,S,H,D) — logits (B,S,H,K), softmax on
                the minor (lane) axis, no explicit transposes

Shapes: video serving, 32 CFG-doubled rows — (32, 4096, 10, 64) @ level 0,
(32, 1024, 20, 64) @ level 1; kv = 77.

  python benchmarks/xattn_sweep.py
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
    float(jnp.sum(out))  # compile + warm, force fetch
    times = []
    for t in range(trials):
        a = make_args(int(time.time() * 1e3) % (2 ** 31) + t)
        t0 = time.time()
        float(jnp.sum(fn(*a)))
        times.append(time.time() - t0)
    return min(times)


def main():
    from video_style_transfer_tpu.ops.flash_attention import flash_attention
    from video_style_transfer_tpu.ops.attention import sdpa_xla

    shapes = [(32, 4096, 10, 64), (32, 1024, 20, 64)]
    kv = 77
    for b, s, h, d in shapes:
        def make_args(seed, b=b, s=s, h=h, d=d):
            ks = jax.random.split(jax.random.PRNGKey(seed), 3)
            q = jax.random.normal(ks[0], (b, s, h, d), jnp.bfloat16)
            k = jax.random.normal(ks[1], (b, kv, h, d), jnp.bfloat16)
            v = jax.random.normal(ks[2], (b, kv, h, d), jnp.bfloat16)
            return q, k, v

        flops = 4 * b * h * s * kv * d
        scale = d ** -0.5

        impls = {
            "pallas": jax.jit(lambda q, k, v: flash_attention(q, k, v)),
            "xla_bhsd": jax.jit(lambda q, k, v: sdpa_xla(q, k, v)),
        }

        @jax.jit
        def xla_native(q, k, v):
            logits = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                                preferred_element_type=jnp.float32) * scale
            w = jax.nn.softmax(logits, axis=-1)
            o = jnp.einsum("bqhk,bkhd->bqhd", w.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            return o.astype(q.dtype)

        impls["xla_native"] = xla_native

        print(f"shape q=({b},{s},{h},{d}) kv={kv}  "
              f"({flops/1e9:.1f} GFLOP)")
        for name, fn in impls.items():
            try:
                t = bench(fn, make_args)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:10s}  FAILED: {type(e).__name__}: {e}")
                continue
            tc = max(t - RPC_FLOOR_S, 1e-6)
            print(f"  {name:10s}  {t*1e3:7.2f} ms raw  "
                  f"{tc*1e3:7.2f} ms corrected  {flops/tc/1e12:6.2f} TF/s")


if __name__ == "__main__":
    main()
