"""Stage-2 train-step timing at the reference workload.

Reference recipe (train_animatediff.sh:25-26,35-41): 8 frames @ 1024^2,
bf16, gradient checkpointing, temporal-LoRA rank 32 on the SDXL motion
UNet, spatial UnZipLoRA rank 64 frozen. This times ONE full jitted train
step (forward + flash-attention backward + remat + masked AdamW update)
on the session's single TPU chip, with the forced-fetch / fresh-input
protocol the tunnel requires (see bench.py docstring).

  python benchmarks/stage2_step.py             # full scale
  python benchmarks/stage2_step.py --tiny      # wiring smoke
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax

# the container sitecustomize force-registers the TPU plugin via
# jax.config.update, overriding a JAX_PLATFORMS=cpu env var; honor the
# env var (CPU smoke runs) before any backend query locks it in
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def _zeros_init(fn, *a, **kw):
    shapes = jax.eval_shape(fn, *a, **kw)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=5,
                    help="min-of-N protocol (N>=5 resolves sub-5% deltas\n                         through the tunnel spread; PERF.md round 5)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas"])
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--remat_policy", default=None,
                    choices=["component", "component_lite",
                             "component_lite1"],
                    help="override the stage-2 remat policy (default: "
                         "stage2.make_train_step's mapping of True)")
    ap.add_argument("--profile", action="store_true",
                    help="capture an xplane trace of one timed step; "
                         "parse with benchmarks/xplane_report.py")
    args = ap.parse_args()

    cache = os.path.join(os.path.expanduser("~"), ".cache", "jax")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import (
        insert_temporal_lora, insert_unziplora, spatial_pairs)
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage2

    cfg = (UNetConfig.tiny(use_motion_modules=True) if args.tiny
           else UNetConfig.sdxl(use_motion_modules=True))
    dt = jnp.bfloat16
    res = 16 if args.tiny else args.res
    vsf = 2 if args.tiny else 8
    f = 2 if args.tiny else args.frames
    rank_s = 4 if args.tiny else 64
    rank_t = 4 if args.tiny else 32

    def build(key):
        p = init_unet(key, cfg, dtype=dt)
        p, ls = insert_unziplora(p, key, rank=rank_s, dtype=dt)
        p = insert_temporal_lora(p, key, rank=rank_t, dtype=dt)
        return p, ls

    params, state_z = _zeros_init(build, jax.random.PRNGKey(0))

    def fix(tree, name=None):
        if isinstance(tree, dict):
            return {k: fix(v, k) for k, v in tree.items()}
        if name and name.startswith("on_"):
            return jnp.ones(tree.shape, tree.dtype)
        return tree

    lora_state = fix(state_z)
    pairs = spatial_pairs(params)

    mask = stage2.trainable_mask(params)
    opt = stage2.make_optimizer(mask, total_steps=1000)
    st = stage2.init_state(params, opt)
    sched = make_schedule()

    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
    lat = res // vsf

    def batch_for(seed):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        return {
            "latents": jax.random.normal(k1, (1, f, lat, lat, 4), dt),
            "ctx": jax.random.normal(k2, (1, 77, xdim), dt),
            "pooled": jax.random.normal(k3, (1, pooled_dim), dt),
            "time_ids": jnp.asarray([[res, res, 0, 0, res, res]], dt),
        }

    if args.remat_policy and args.no_remat:
        ap.error("--remat_policy conflicts with --no_remat")
    remat = args.remat_policy or (not args.no_remat)
    step = stage2.make_train_step(cfg, sched, opt, pairs, mask=mask,
                                  lora_state=lora_state, impl=args.impl,
                                  remat=remat)
    jit_step = jax.jit(step, donate_argnums=0)

    # compile + warm
    st, m = jit_step(st, batch_for(0), jax.random.PRNGKey(0))
    _ = float(m["loss"])

    if args.profile:
        import glob
        import tempfile
        logdir = tempfile.mkdtemp(prefix="vst_s2_trace_")
        seed = int(time.time() * 1e3) % (2 ** 31)
        b = batch_for(seed)
        jax.profiler.start_trace(logdir)
        st, m = jit_step(st, b, jax.random.PRNGKey(seed))
        _ = float(m["loss"])
        jax.profiler.stop_trace()
        files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                          recursive=True)
        print("xplane files:", files)

    times = []
    for t in range(args.trials):
        seed = int(time.time() * 1e3) % (2 ** 31) + t
        b = batch_for(seed)
        t0 = time.time()
        st, m = jit_step(st, b, jax.random.PRNGKey(seed))
        _ = float(m["loss"])          # forced fetch
        times.append(time.time() - t0)

    sec = min(times)
    # MFU from the compiled step's own cost analysis (the AOT compile
    # dedupes against the warm call through the persistent cache)
    try:
        ca = jit_step.lower(st, batch_for(0),
                            jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        flops = None
    perf = {}
    if flops:
        perf = {"tflops": round(flops / 1e12, 2),
                "tflops_per_s": round(flops / sec / 1e12, 2),
                "mfu": round(flops / sec / 197e12, 4),  # v5e bf16 peak
                # cost analysis counts XLA ops only; Pallas custom
                # calls (flash fwd+bwd, GEGLU, temporal) report zero
                # flops, so true MFU is HIGHER (see bench.py's
                # analytic pallas model for the serving path)
                "flops_model": "xla_cost_analysis_excl_pallas"}
    print(json.dumps({
        "metric": f"stage2_train_step_{f}f_{res}px_sec",
        "value": round(sec, 4),
        "unit": "sec/step/chip",
        "impl": args.impl,
        "remat": remat,
        "all_trials": [round(x, 4) for x in times],
        "spread": round(max(times) - sec, 4),
        **perf,
    }))


if __name__ == "__main__":
    main()
