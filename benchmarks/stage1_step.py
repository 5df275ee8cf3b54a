"""Stage-1 train-step timing at the reference workload.

Reference recipe (train.sh:6,32,54-55,65): 600 steps, batch 1 @ 1024^2,
UnZipLoRA rank 64, fp32 params (bf16 option here), triple-prompt
forward, merger-cosine similarity loss, column-separation schedule
active. Times ONE full jitted train step (forward + flash backward +
column-sep state machine + 3-group AdamW) on the session's single TPU
chip with the forced-fetch / fresh-input protocol.

  python benchmarks/stage1_step.py            # full scale, bf16
  python benchmarks/stage1_step.py --dtype float32   # reference recipe
  python benchmarks/stage1_step.py --tiny     # wiring smoke
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
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--trials", type=int, default=5,
                    help="min-of-N protocol (N>=5 resolves sub-5% deltas\n                         through the tunnel spread; PERF.md round 5)")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "mixed"],
                    help="mixed = bf16 frozen base + fp32 LoRA storage "
                         "(full-fp32 params are 11.7 GB and exceed one "
                         "chip's HBM; LoRA math is fp32 in all modes)")
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--optimizer", default="adamw",
                    choices=["adamw", "adamw8bit", "prodigy"],
                    help="A/B the optimizer family; adamw8bit measures "
                         "the blockwise-quantized moments' per-step "
                         "dequant/requant cost and reports the "
                         "optimizer-state HBM cut")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.expanduser("~"), ".cache", "jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import (
        insert_unziplora, layer_assignments)
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage1

    cfg = (UNetConfig.tiny() if args.tiny else UNetConfig.sdxl())
    mixed = args.dtype == "mixed"
    dt = jnp.bfloat16 if mixed else jnp.dtype(args.dtype)
    lora_dt = jnp.float32 if mixed else dt
    res = 16 if args.tiny else args.res
    vsf = 2 if args.tiny else 8
    rank = 4 if args.tiny else 64

    def build(key):
        p = init_unet(key, cfg, dtype=dt)
        return insert_unziplora(p, key, rank=rank, dtype=lora_dt)

    params, lora_state = _zeros_init(build, jax.random.PRNGKey(0))

    def fix(tree, name=None):
        if isinstance(tree, dict):
            return {k: fix(v, k) for k, v in tree.items()}
        if name and name.startswith("on_"):
            return jnp.ones(tree.shape, tree.dtype)
        return tree

    lora_state = fix(lora_state)
    assignments = layer_assignments(params, {}, {})
    sep = stage1.ColumnSepConfig(enabled=True, max_steps=600,
                                 sample_times=3, steps_per_epoch=1,
                                 column_ratio=0.1)
    opt = stage1.make_optimizer(params, total_steps=600,
                                optimizer=args.optimizer)
    step = stage1.make_train_step(cfg, make_schedule(), opt, sep_cfg=sep,
                                  assignments=assignments,
                                  mask=stage1.trainable_mask(params),
                                  remat=not args.no_remat)
    jit_step = jax.jit(step, donate_argnums=0)
    st = stage1.init_state(params, lora_state, opt)
    if args.optimizer == "prodigy":
        # optax.contrib.prodigy's init aliases params0 to the params
        # buffer; donate_argnums=0 would then donate the same buffer
        # twice ("Attempt to donate the same buffer twice")
        st = jax.tree.map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, st)

    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)
    lat = res // vsf

    def batch_for(seed):
        ks = jax.random.split(jax.random.PRNGKey(seed), 5)
        return {
            "latents": jax.random.normal(ks[0],
                                         (args.batch, lat, lat, 4), dt),
            "ctx": jax.random.normal(ks[1], (args.batch, 77, xdim), dt),
            "ctx_content": jax.random.normal(ks[2],
                                             (args.batch, 77, xdim), dt),
            "ctx_style": jax.random.normal(ks[3],
                                           (args.batch, 77, xdim), dt),
            "pooled": jax.random.normal(ks[4], (args.batch, pooled_dim),
                                        dt),
            "time_ids": jnp.asarray([[res, res, 0, 0, res, res]] *
                                    args.batch, dt),
        }

    st, m = jit_step(st, batch_for(0), jax.random.PRNGKey(0))
    _ = float(m["loss"])

    times = []
    for t in range(args.trials):
        seed = int(time.time() * 1e3) % (2 ** 31) + t
        b = batch_for(seed)
        t0 = time.time()
        st, m = jit_step(st, b, jax.random.PRNGKey(seed))
        _ = float(m["loss"])
        times.append(time.time() - t0)

    opt_bytes = sum(x.size * x.dtype.itemsize
                    for x in jax.tree.leaves(st.opt_state)
                    if hasattr(x, "dtype"))
    sec = min(times)
    # MFU from the compiled step's own cost analysis
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
        "metric": f"stage1_train_step_b{args.batch}_{res}px_"
                  f"{args.dtype}_sec",
        "value": round(sec, 4),
        "unit": "sec/step/chip",
        "remat": not args.no_remat,
        "optimizer": args.optimizer,
        "opt_state_mb": round(opt_bytes / 1e6, 1),
        "all_trials": [round(x, 4) for x in times],
        "spread": round(max(times) - sec, 4),
        **perf,
    }))


if __name__ == "__main__":
    main()
