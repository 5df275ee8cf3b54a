"""VAE decode timing: fp32 1024^2 frame decodes (the non-denoise half of
the <20 s end-to-end video budget).

Reference insists on fp32 VAE (inference_animatediff.py:164-169) with
per-frame decodes (:136-144). Here frames decode in chunks through the
jitted decoder (flash attention covers the 16384-token mid-block attn at
1024^2). Prints sec/frame and the projected 8-chip wall time for 16
frames (frame-sharded decode).

  python benchmarks/vae_decode.py [--tiny] [--chunk 2] [--dtype float32]
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
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=2)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.expanduser("~"), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from video_style_transfer_tpu.config import VAEConfig
    from video_style_transfer_tpu.models.vae import init_vae, vae_decode

    cfg = VAEConfig.tiny() if args.tiny else VAEConfig.sdxl()
    res = 16 if args.tiny else args.res
    vsf = 2 if args.tiny else 8
    dt = jnp.dtype(args.dtype)
    chunk = min(args.chunk, args.frames)

    params = _zeros_init(lambda k: init_vae(k, cfg, dtype=dt),
                         jax.random.PRNGKey(0))
    lat = res // vsf

    @jax.jit
    def decode_chunk(params, z):
        return vae_decode(params, cfg, z.astype(dt))

    def run(seed):
        total = 0.0
        for c in range(args.frames // chunk):
            z = jax.random.normal(jax.random.PRNGKey(seed + c),
                                  (chunk, lat, lat, 4), jnp.float32)
            img = decode_chunk(params, z)
            total += float(jnp.sum(img.astype(jnp.float32)))
        return total

    run(0)  # compile + warm
    times = []
    for t in range(args.trials):
        seed = int(time.time() * 1e3) % (2 ** 31) + t * 1000
        t0 = time.time()
        run(seed)
        times.append(time.time() - t0)

    sec = min(times)
    per_frame = sec / args.frames
    print(json.dumps({
        "metric": f"vae_decode_{res}px_{args.dtype}_sec_per_frame",
        "value": round(per_frame, 4),
        "unit": "sec/frame/chip",
        "chunk": chunk,
        "all_16f_single_chip_s": round(sec, 3),
        "projected_16f_8chip_s": round(per_frame * args.frames / 8, 3),
    }))


if __name__ == "__main__":
    main()
