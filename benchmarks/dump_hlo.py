"""Dump the optimized HLO of the full-scale bench step to a file.

Reuses bench.build's exact construction (args form) so the compiled
program matches the headline measurement, then writes
compiled.as_text() for offline op-level analysis.

  python benchmarks/dump_hlo.py [--tiny] [--out /tmp/step.hlo]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/step.hlo")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.expanduser("~"), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    import bench
    import functools
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import (
        insert_unziplora, fold_unziplora)
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.pipelines.image import default_time_ids
    from video_style_transfer_tpu.pipelines.sampling import (
        Conditioning, make_cfg_denoiser)
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.schedulers.euler import (
        euler_step, euler_timetable, scale_model_input)

    frames = 4 if args.tiny else args.frames
    res = 16 if args.tiny else args.res
    cfg = (UNetConfig.tiny(use_motion_modules=True) if args.tiny
           else UNetConfig.sdxl(use_motion_modules=True))
    dt = jnp.bfloat16
    vsf = 2 if args.tiny else 8

    def make(key):
        p = init_unet(key, cfg, dtype=dt)
        return insert_unziplora(p, key, rank=4 if args.tiny else 64,
                                dtype=dt)

    params, state_z = bench._zeros_init(make, jax.random.PRNGKey(0))

    def fix(tree, name=None):
        if isinstance(tree, dict):
            return {k: fix(v, k) for k, v in tree.items()}
        if name and name.startswith("on_"):
            return jnp.ones(tree.shape, tree.dtype)
        return tree

    state = fix(state_z)
    params, _ = fold_unziplora(params, state, mode="both",
                               fold_cross_kv=True)

    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)

    def cond(seed):
        k1, k2, _, _ = jax.random.split(jax.random.PRNGKey(seed), 4)
        return Conditioning(
            ctx=(jax.random.normal(k1, (1, 77, xdim), dt), None, None),
            pooled=jax.random.normal(k2, (1, pooled_dim), dt),
            time_ids=default_time_ids(res, res, 1, dt))

    uncond_c, cond_c = cond(1), cond(2)

    def step_math(params, state, x, sigma, t, sigma_next):
        eps_fn = make_cfg_denoiser(params, cfg, uncond_c, cond_c,
                                   cfg_scale=7.5, mode="both",
                                   state=state, num_frames=frames,
                                   impl="auto")
        model_in = scale_model_input(x, sigma)
        eps = eps_fn(model_in, t)
        return euler_step(x, eps, sigma, sigma_next)

    lat_shape = (frames, res // vsf, res // vsf, cfg.in_channels)
    z = jnp.zeros(lat_shape, dt)
    s0 = jnp.zeros((), jnp.float32)
    compiled = jax.jit(step_math).lower(
        params, state, z, s0, s0, s0).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {args.out} ({len(txt)/1e6:.1f} MB)")
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops")
        print(f"cost_analysis flops={flops}")
    except Exception as e:
        print("cost_analysis failed:", repr(e))


if __name__ == "__main__":
    main()
