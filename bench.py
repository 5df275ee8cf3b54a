"""Headline benchmark: 16-frame 1024^2 AnimateDiff-XL stylized-video
denoise throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Workload (BASELINE.md): SDXL motion UNet + UnZipLoRA 'both' mode, bf16,
CFG-batched pair, Euler schedule, 16 frames at 1024^2 (latents 128^2),
flash-attention kernels. The reference publishes no numbers; the
driver-set north star is a 30-step 16-frame video in < 20 s end-to-end on
v5e-8. vs_baseline = (20 s * n_chips_equivalent) / projected_single_chip
— i.e. >= 1.0 means the single-chip rate extrapolated to 8 ideal chips
meets the target.

Timing protocol: this environment's TPU tunnel executes lazily and
caches repeated (program, input) pairs — block_until_ready returns
immediately. Every measurement here forces a host fetch of a reduction
over the result, uses fresh time-seeded inputs, and warms up with
different inputs first.
"""
import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp


def _zeros_init(fn, *a, **kw):
    shapes = jax.eval_shape(fn, *a, **kw)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def build(frames: int, res: int, steps: int, tiny: bool):
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    from video_style_transfer_tpu.pipelines.image import default_time_ids
    from video_style_transfer_tpu.pipelines.sampling import Conditioning
    from video_style_transfer_tpu.pipelines.video import generate_video_latents

    cfg = (UNetConfig.tiny(use_motion_modules=True) if tiny
           else UNetConfig.sdxl(use_motion_modules=True))
    dt = jnp.bfloat16

    def make(key):
        p = __import__(
            "video_style_transfer_tpu.models.unet", fromlist=["init_unet"]
        ).init_unet(key, cfg, dtype=dt)
        return insert_unziplora(p, key, rank=64 if not tiny else 4, dtype=dt)

    params, state_z = _zeros_init(make, jax.random.PRNGKey(0))

    def fix(tree, name=None):
        if isinstance(tree, dict):
            return {k: fix(v, k) for k, v in tree.items()}
        if name and name.startswith("on_"):
            return jnp.ones(tree.shape, tree.dtype)
        return tree

    state = fix(state_z)

    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)

    def cond(seed):
        k = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(k)
        return Conditioning(
            ctx=(jax.random.normal(k1, (1, 77, xdim), dt), None, None),
            pooled=jax.random.normal(k2, (1, pooled_dim), dt),
            time_ids=default_time_ids(res, res, 1, dt))

    @jax.jit
    def run(params, key):
        lat = generate_video_latents(
            params, cfg, cond(1), cond(2), key, num_frames=frames,
            height=res, width=res, num_steps=steps, mode="both",
            state=state, impl="auto", dtype=dt,
            vae_scale_factor=8 if not tiny else 2)
        return jnp.sum(lat.astype(jnp.float32))

    return run, params


def force(x):
    return float(x)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config smoke mode")
    args = ap.parse_args()

    run, params = build(args.frames, args.res, args.steps, args.tiny)
    seed = int(time.time() * 1e3) % (2 ** 31)

    # compile + warm (forced), then measure on fresh inputs
    force(run(params, jax.random.PRNGKey(seed)))
    times = []
    for i in range(1, 3):
        t0 = time.time()
        force(run(params, jax.random.PRNGKey(seed + i)))
        times.append(time.time() - t0)
    denoise_s = min(times)

    fps = args.frames / denoise_s
    # extrapolate the <20 s v5e-8 target: frame-parallel denoise scales
    # near-linearly over 8 chips at F=16
    projected_8chip_s = denoise_s / 8
    vs_baseline = 20.0 / max(projected_8chip_s, 1e-9)

    print(json.dumps({
        "metric": f"animatediffxl_denoise_{args.frames}f_{args.res}px_"
                  f"{args.steps}step_fps_per_chip",
        "value": round(fps, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    main()
