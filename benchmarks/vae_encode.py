"""VAE encode sec/frame at the training workload (fp32, 1024^2).

Both trainers encode pixels per step like the reference
(train_unziplora.py:2023-2024, train_animatediff.py:220-224) — stage 2
encodes 8 consecutive frames per batch outside the jitted train step
(cli/train_animatediff.py -> common.encode_latents). This measures that
cost per frame with the per-chunk call protocol the tunnel requires.

  python benchmarks/vae_encode.py [--tiny] [--chunk 1] [--frames 8]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _zeros_init(fn, *a, **kw):
    shapes = jax.eval_shape(fn, *a, **kw)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.expanduser("~"), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from video_style_transfer_tpu.config import VAEConfig
    from video_style_transfer_tpu.models.vae import init_vae, vae_encode

    cfg = VAEConfig.tiny() if args.tiny else VAEConfig.sdxl()
    res = 16 if args.tiny else args.res
    dt = jnp.dtype(args.dtype)
    chunk = min(args.chunk, args.frames)

    params = _zeros_init(lambda k: init_vae(k, cfg, dtype=dt),
                         jax.random.PRNGKey(0))

    @jax.jit
    def encode_chunk(params, x, key):
        return vae_encode(params, cfg, x.astype(dt), key=key)

    def run(seed):
        total = 0.0
        for c in range(args.frames // chunk):
            x = jax.random.normal(jax.random.PRNGKey(seed + c),
                                  (chunk, res, res, 3), jnp.float32)
            z = encode_chunk(params, x, jax.random.PRNGKey(seed * 7 + c))
            total += float(jnp.sum(z.astype(jnp.float32)))
        return total

    run(0)  # compile + warm
    times = []
    for t in range(args.trials):
        seed = int(time.time() * 1e3) % (2 ** 31) + t * 1013
        t0 = time.time()
        run(seed)
        times.append(time.time() - t0)

    sec = min(times)
    per_frame = sec / args.frames
    print(json.dumps({
        "metric": f"vae_encode_{res}px_{args.dtype}_sec_per_frame",
        "value": round(per_frame, 4),
        "unit": "sec/frame/chip",
        "chunk": chunk,
        "stage2_batch_8f_s": round(per_frame * 8, 3),
    }))


if __name__ == "__main__":
    main()
