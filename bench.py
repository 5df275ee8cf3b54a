"""Headline benchmark: 16-frame 1024^2 AnimateDiff-XL stylized-video
generation, measured END-TO-END on one TPU chip: dual-CLIP text encode +
30-step denoise + fp32 VAE decode, each component timed on chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip",
   "vs_baseline": N, "components_s": {...}, "projected_v5e8_s": N}

Workload (BASELINE.md): SDXL motion UNet + UnZipLoRA 'both' mode, bf16,
CFG-batched pair, Euler schedule, 16 frames at 1024^2 (latents 128^2),
Pallas flash-attention kernels, fp32 decode. The reference publishes no
numbers; the driver-set north star is a 30-step 16-frame video in < 20 s
end-to-end on v5e-8. vs_baseline = 20 s / projected_v5e8_s where
projected_v5e8_s = text_encode + denoise * slowdown / 8 + ICI +
decode / 8 — the round-5 efficiency-corrected frame-parallel model
(per-shard kernel efficiency measured by benchmarks/shard_efficiency.py
weighted over the serving-step profile buckets, plus the audited ICI
time; see the constants below). Labeled as a PROJECTION: multi-chip
hardware is not reachable from this session; the sharded serving
program itself is exercised by __graft_entry__.dryrun_multichip and
tests/test_pipelines.py. --denoise_only restores the round-1
denoise-fps metric for comparisons.

Execution protocol for this environment's TPU tunnel (which executes
lazily, caches repeated (program, input) pairs, and kills long-running
single executions):
- the denoiser runs as ONE JITTED EULER STEP invoked num_steps times
  with the latent chained through (production uses the lax.scan sampler
  in pipelines/, which is the right shape for real TPUs — use --scan
  here to benchmark it where long executions are allowed);
- every measurement forces a host fetch of a reduction over the result;
- fresh time-derived PRNG seeds defeat the result cache.
"""
import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


LAST_RESULT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_last.json")


def _wait_for_backend(max_tries: int = 10, sleep_s: int = 120):
    """The session's TPU worker restarts take 20-40 min (sometimes
    hours), during which the plugin fails to register. Re-exec with
    backoff; after max_tries, fall back to re-emitting the last MEASURED
    result, explicitly labeled as such."""
    try:
        jax.devices()
        return
    except RuntimeError as e:
        tries = int(os.environ.get("VST_BENCH_TRIES", "0"))
        if tries >= max_tries:
            if os.path.exists(LAST_RESULT):
                rec = json.load(open(LAST_RESULT))
                rec["metric"] += "_cached_prior_measurement_tpu_down"
                print(json.dumps(rec))
                sys.exit(0)
            raise
        print(f"backend unavailable ({e}); retry {tries + 1}/{max_tries} "
              f"in {sleep_s}s", file=sys.stderr)
        time.sleep(sleep_s)
        os.environ["VST_BENCH_TRIES"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


def _zeros_init(fn, *a, **kw):
    shapes = jax.eval_shape(fn, *a, **kw)
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


# v5e bf16 matmul peak (the chip spec number used throughout PERF.md);
# MFU below is measured-FLOPs / wall-clock / this peak — auditable from
# the emitted JSON alone (VERDICT r4 weak-item 2)
V5E_BF16_PEAK_FLOPS = 197e12

# Frame-parallel v5e-8 projection model (replaces the round 1-4 naive
# /8, which assumed per-shard kernels keep full-batch efficiency).
# Measured round 5 (PERF.md):
#  - serving-step xplane buckets (2045 ms/step single chip) weighted by
#    each bucket's per-shard (rows/8, pixels/8) efficiency from
#    benchmarks/shard_efficiency.py: Pallas spatial 0.95x (flash
#    0.93-0.97, GEGLU 0.90-0.96 — slightly FASTER per row), temporal
#    pixel-lanes 1.46x, XLA matmul fusions 0.93x, convolutions
#    1.27-1.51x (1.39x weighted), bandwidth-bound buckets 1.0x
#    -> weighted compute slowdown 1.054
#  - ICI: 0.029 s per 16-frame CFG-pair UNet call at the conservative
#    single-45GB/s-link ring model (benchmarks/collective_volume.py
#    audit: 1.47 GB/call, zero all-gathers); bytes scale with F
SHARD_COMPUTE_SLOWDOWN = 1.054
ICI_S_PER_UNET_CALL_16F = 0.029


def project_v5e8_denoise(denoise_s: float, steps: int,
                         frames: int) -> float:
    """Efficiency-corrected 8-chip frame-parallel denoise projection."""
    ici = steps * ICI_S_PER_UNET_CALL_16F * frames / 16.0
    return denoise_s * SHARD_COMPUTE_SLOWDOWN / 8.0 + ici


def _parse_cost(ca):
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    val = float(ca.get("flops", 0.0))
    return val if val > 0 else None


def pallas_flops_per_step(res: int, rows: int, frames: int = 1) -> float:
    """FLOPs of the Pallas-kernel ops per denoise step that XLA's cost
    analysis cannot see (custom calls report zero flops — measured:
    24 TFLOP/step reported vs ~112 TFLOP/step actual at the video
    workload): flash self-attention, packed cross-attention (77 kv),
    GEGLU projection, temporal attention. SDXL attention layout: 10
    transformer layers at the 640ch S=(res/16)^2 level, 60 at 1280ch
    S=(res/32)^2 (transformer_layers_per_block (1, 2, 10), level 0 has
    no attention); motion modules 5 per level. `rows` = CFG-doubled
    batch rows."""
    total = 0.0
    for layers, ch, heads, div in ((10, 640, 10, 16), (60, 1280, 20, 32)):
        s = (res // div) ** 2
        total += layers * 4.0 * rows * heads * s * s * 64   # self-attn
        total += layers * 4.0 * rows * heads * s * 77 * 64  # cross-attn
        total += layers * 4.0 * (rows * s) * ch * (4 * ch)  # GEGLU
    if frames > 1:
        b = max(rows // frames, 1)
        for ch, div in ((320, 8), (640, 16), (1280, 32)):
            n_pix = b * (res // div) ** 2
            total += 5 * 4.0 * n_pix * ch * frames * frames  # temporal
    return total


def vae_attn_flops(res: int, frames: int) -> float:
    """The fp32 decoder's mid-block attention (S=(res/8)^2, 512ch, one
    head) takes the Pallas flash path at full scale — also invisible to
    cost analysis."""
    s = (res // 8) ** 2
    return frames * 4.0 * s * s * 512


def _flops_of(jitted, *example_args):
    """Total FLOPs of one execution of `jitted(*example_args)` by XLA's
    compiled cost analysis. The AOT lower+compile here dedupes against
    the measurement call's compile through the persistent compilation
    cache. Returns None when the backend doesn't report flops."""
    try:
        return _parse_cost(
            jitted.lower(*example_args).compile().cost_analysis())
    except Exception:
        return None


def build(frames: int, res: int, steps: int, tiny: bool, scan: bool,
          workload: str = "video", impl: str = "auto",
          const: bool = False, randinit: bool = False,
          autolayout: bool = False, batch: int = 1,
          steps_per_call: int = 1, fold_cross_kv: bool = False):
    from video_style_transfer_tpu.config import UNetConfig
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    from video_style_transfer_tpu.models.unet import init_unet
    from video_style_transfer_tpu.pipelines.image import default_time_ids
    from video_style_transfer_tpu.pipelines.sampling import (
        Conditioning, make_cfg_denoiser)
    from video_style_transfer_tpu.pipelines.video import (
        generate_video_latents)
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.schedulers.euler import (
        euler_step, euler_timetable, scale_model_input)

    motion = workload == "video"
    cfg = (UNetConfig.tiny(use_motion_modules=motion) if tiny
           else UNetConfig.sdxl(use_motion_modules=motion))
    dt = jnp.bfloat16
    vsf = 8 if not tiny else 2

    def make(key):
        p = init_unet(key, cfg, dtype=dt)
        return insert_unziplora(p, key, rank=64 if not tiny else 4,
                                dtype=dt)

    if randinit:
        # real random weights: rules out zero-propagation folding when
        # weights are baked as compile-time constants (--const)
        params, state_z = make(jax.random.PRNGKey(0))
    else:
        params, state_z = _zeros_init(make, jax.random.PRNGKey(0))

    def fix(tree, name=None):
        if isinstance(tree, dict):
            return {k: fix(v, k) for k, v in tree.items()}
        if name and name.startswith("on_"):
            return jnp.ones(tree.shape, tree.dtype)
        return tree

    state = fix(state_z)

    # production serving path: video uses a single shared prompt -> LoRA
    # folds fully; the image workload keeps distinct content/style
    # prompts -> cross-attn k/v stay dynamic
    # --fold_cross_kv on the image workload measures the shared-prompt
    # special case (content == style == combined prompt folds all 12/12
    # projections) — the A/B that prices the triple-prompt dynamic
    # cross-attn LoRA branches for the precision study (PERF.md round 4)
    from video_style_transfer_tpu.lora.surgery import fold_unziplora
    params, _ = fold_unziplora(
        params, state, mode="both",
        fold_cross_kv=(workload == "video" or fold_cross_kv))

    xdim = cfg.cross_attention_dim
    pooled_dim = (cfg.projection_class_embeddings_input_dim
                  - 6 * cfg.addition_time_embed_dim)

    rows = frames if workload == "video" else batch
    nf = frames if workload == "video" else 1

    def cond(seed):
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
        if workload == "video":
            ctx = (jax.random.normal(k1, (1, 77, xdim), dt), None, None)
        else:
            # triple-prompt conditioning (UnZipLoRA image workload);
            # --batch B serves B samples of the same prompt set per call
            ctx = (jax.random.normal(k1, (1, 77, xdim), dt),
                   jax.random.normal(k3, (1, 77, xdim), dt),
                   jax.random.normal(k4, (1, 77, xdim), dt))
        c = Conditioning(
            ctx=ctx,
            pooled=jax.random.normal(k2, (1, pooled_dim), dt),
            time_ids=default_time_ids(res, res, 1, dt))
        if workload != "video" and batch > 1:
            tile = lambda e: (None if e is None
                              else jnp.tile(e, (batch,) + (1,) * (e.ndim - 1)))
            c = Conditioning(ctx=tuple(tile(e) for e in c.ctx),
                             pooled=tile(c.pooled),
                             time_ids=tile(c.time_ids))
        return c

    sched = make_schedule()
    table = euler_timetable(sched, steps)
    lat_shape = (rows, res // vsf, res // vsf, cfg.in_channels)

    if scan:
        @jax.jit
        def run_all(params, key):
            lat = generate_video_latents(
                params, cfg, cond(1), cond(2), key, num_frames=nf,
                height=res, width=res, num_steps=steps, mode="both",
                state=state, impl=impl, dtype=dt, vae_scale_factor=vsf)
            return jnp.sum(lat.astype(jnp.float32))

        def execute(seed):
            return float(run_all(params, jax.random.PRNGKey(seed)))

        def flops():
            return _flops_of(run_all, params, jax.random.PRNGKey(0))

        return execute, flops

    uncond_c, cond_c = cond(1), cond(2)

    # params/state enter as jit ARGUMENTS by default (not captured
    # constants): the closure form bakes ~6 GB of weight constants into
    # the HLO, which multiplies lowering+compile time — and with the
    # zeros-init benchmark weights would let XLA's algebraic simplifier
    # fold real work away. --const restores the baked-weights serving
    # mode (legitimate for a fixed deployed model; pair with --randinit).
    def step_math(params, state, x, sigma, t, sigma_next):
        eps_fn = make_cfg_denoiser(params, cfg, uncond_c, cond_c,
                                   cfg_scale=7.5, mode="both",
                                   state=state, num_frames=nf, impl=impl)
        model_in = scale_model_input(x, sigma)
        eps = eps_fn(model_in, t)
        return euler_step(x, eps, sigma, sigma_next)

    sig = jnp.asarray(table["sigmas"], jnp.float32)
    ts = jnp.asarray(table["timesteps"], jnp.float32)

    if steps_per_call > 1 and not const and not autolayout:
        # k steps per fetched call via an in-program lax.scan: amortizes
        # this tunnel's fixed ~28.5 ms RPC floor (6% of a 480 ms image
        # step at k=1) while keeping each execution well under the
        # ~1-minute watchdog. Same math as the production scan sampler.
        assert steps % steps_per_call == 0, (steps, steps_per_call)
        k = steps_per_call

        def k_steps(params, state, x, sigs, ts):
            eps_fn = make_cfg_denoiser(params, cfg, uncond_c, cond_c,
                                       cfg_scale=7.5, mode="both",
                                       state=state, num_frames=nf,
                                       impl=impl)

            def body(x_, i):
                model_in = scale_model_input(x_, sigs[i])
                eps = eps_fn(model_in, ts[i])
                return euler_step(x_, eps, sigs[i], sigs[i + 1]), None

            x, _ = jax.lax.scan(body, x, jnp.arange(k))
            return x

        _jitted_k = jax.jit(k_steps)

        def execute(seed):
            x = jax.random.normal(jax.random.PRNGKey(seed), lat_shape, dt)
            x = x * table["init_sigma"].astype(dt)
            for i in range(steps // k):
                x = _jitted_k(params, state, x, sig[i * k: i * k + k + 1],
                              ts[i * k: i * k + k])
            return float(jnp.sum(x.astype(jnp.float32)))

        def flops():
            f1 = _flops_of(_jitted_k, params, state,
                           jnp.zeros(lat_shape, dt), sig[:k + 1], ts[:k])
            return None if f1 is None else f1 * (steps // k)

        return execute, flops

    z0 = jnp.zeros(lat_shape, dt)
    s0 = jnp.zeros((), jnp.float32)
    if const:
        one_step = jax.jit(functools.partial(step_math, params, state))
        step_flops = lambda: _flops_of(one_step, z0, s0, s0, s0)
    elif autolayout:
        # weights stay runtime arguments, but XLA picks their layouts
        # (as it would for baked constants) and the tree is re-laid-out
        # once up front — the production serving recipe
        from jax.experimental.layout import Format, Layout
        auto = Format(Layout.AUTO)
        jitted = jax.jit(step_math,
                         in_shardings=(auto, auto, None, None, None, None))
        z = jnp.zeros(lat_shape, dt)
        s0 = jnp.zeros((), jnp.float32)
        compiled = jitted.lower(params, state, z, s0, s0, s0).compile()
        pf, sf = compiled.input_formats[0][:2]
        params = jax.tree.map(jax.device_put, params, pf)
        state = jax.tree.map(jax.device_put, state, sf)
        one_step = functools.partial(compiled, params, state)

        def step_flops():
            try:
                return _parse_cost(compiled.cost_analysis())
            except Exception:
                return None
    else:
        _jitted = jax.jit(step_math)
        one_step = functools.partial(_jitted, params, state)
        step_flops = lambda: _flops_of(_jitted, params, state,
                                       z0, s0, s0, s0)

    def execute(seed):
        x = jax.random.normal(jax.random.PRNGKey(seed), lat_shape, dt)
        x = x * table["init_sigma"].astype(dt)
        for i in range(steps):
            x = one_step(x, sig[i], ts[i], sig[i + 1])
        return float(jnp.sum(x.astype(jnp.float32)))

    def flops():
        f1 = step_flops()
        return None if f1 is None else f1 * steps

    return execute, flops


def build_text_encode(tiny: bool):
    """SDXL dual-encoder text conditioning (cond+uncond batched), weights
    as jit arguments. Returns execute(seed) -> fetches the embeddings."""
    from video_style_transfer_tpu.config import CLIPConfig
    from video_style_transfer_tpu.models.clip import (
        encode_sdxl_prompt, init_clip)

    lcfg = CLIPConfig.tiny() if tiny else CLIPConfig.sdxl_clip_l()
    gcfg = (CLIPConfig.tiny(projection_dim=16) if tiny
            else CLIPConfig.sdxl_big_g())
    pl_ = _zeros_init(lambda k: init_clip(k, lcfg, dtype=jnp.bfloat16),
                      jax.random.PRNGKey(0))
    pg = _zeros_init(lambda k: init_clip(k, gcfg, dtype=jnp.bfloat16),
                     jax.random.PRNGKey(1))

    @jax.jit
    def fn(pl, pg_, ids_l, ids_g):
        emb, pooled = encode_sdxl_prompt(pl, lcfg, pg_, gcfg, ids_l, ids_g)
        return (jnp.sum(emb.astype(jnp.float32))
                + jnp.sum(pooled.astype(jnp.float32)))

    s = lcfg.max_position_embeddings

    def execute(seed):
        k = jax.random.PRNGKey(seed)
        ids = jax.random.randint(k, (2, s), 0,
                                 min(lcfg.vocab_size, gcfg.vocab_size),
                                 jnp.int32)
        return float(fn(pl_, pg, ids, ids))

    def flops():
        ids = jnp.zeros((2, s), jnp.int32)
        return _flops_of(fn, pl_, pg, ids, ids)

    return execute, flops


def build_decode(tiny: bool, frames: int, res: int, chunk: int = 1,
                 dtype=None):
    """fp32 per-frame VAE decode in per-chunk calls (the tunnel kills
    single executions > ~1 min; chunked calls are both the production
    memory shape AND watchdog-safe). chunk 1 measured FASTEST per frame
    (0.179 s/f with strip-batched 64-row convs — layers._conv3x3_strips
    replaces XLA's space-to-batch plumbing — vs 0.197 at chunk 4);
    chunk 4's fp32 decoder activations additionally flirt with 16 GB
    HBM with the UNet+CLIP weights resident."""
    from video_style_transfer_tpu.config import VAEConfig
    from video_style_transfer_tpu.models.vae import init_vae
    from video_style_transfer_tpu.pipelines.image import decode_images

    vcfg = VAEConfig.tiny() if tiny else VAEConfig.sdxl()
    vsf = 2 if tiny else 8
    vp = _zeros_init(lambda k: init_vae(k, vcfg), jax.random.PRNGKey(2))
    chunk = min(chunk, frames)
    # frames decoded per fetched call: the production pipeline decodes
    # ALL frames inside one jitted program (pipelines/video.py), so a
    # per-frame fetch here over-counts this tunnel's fixed ~28.5 ms RPC
    # floor 16x (~0.45 s of a ~2.9 s decode). lax.map over chunk-sized
    # slices keeps the fast N=1 conv shapes (chunk 1 measured 0.179 s/f
    # vs 0.197+ batched) while one call covers 4 frames (~0.72 s on
    # chip — far under the ~1-min execution watchdog).
    per_call = max(4 // chunk, 1)

    dtype = dtype or jnp.float32

    @jax.jit
    def dec(vp_, zs):
        out = jax.lax.map(
            lambda z: jnp.sum(decode_images(vp_, vcfg, z, dtype=dtype)
                              .astype(jnp.float32)), zs)
        return jnp.sum(out)

    lat_shape = (per_call, chunk, res // vsf, res // vsf, 4)

    def execute(seed):
        total = 0.0
        for i in range(max(frames // (chunk * per_call), 1)):
            z = jax.random.normal(jax.random.PRNGKey(seed * 131 + i),
                                  lat_shape, jnp.float32)
            total += float(dec(vp, z))
        return total

    def flops():
        f1 = _flops_of(dec, vp, jnp.zeros(lat_shape, jnp.float32))
        calls = max(frames // (chunk * per_call), 1)
        return None if f1 is None else f1 * calls

    return execute, flops


def main():
    # persistent compile cache: repeat bench runs skip the multi-minute
    # SDXL compile (cold/warm numbers: PERF.md round-3 serving-start
    # section). --compilation_cache_dir (parsed early, pre-argparse, so
    # the config lands before any jit) overrides the env default.
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "jax")
    for i, a in enumerate(sys.argv):
        if a.startswith("--compilation_cache_dir="):
            cache = a.split("=", 1)[1]
        elif a == "--compilation_cache_dir" and i + 1 < len(sys.argv):
            cache = sys.argv[i + 1]
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--compilation_cache_dir", default=None,
                    help="persistent XLA compile-cache dir (default "
                         "$JAX_COMPILATION_CACHE_DIR or ~/.cache/jax)")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--scan", action="store_true",
                    help="benchmark the production lax.scan sampler "
                         "(one long execution)")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas"],
                    help="attention implementation (ablation)")
    ap.add_argument("--const", action="store_true",
                    help="bake weights as compile-time constants "
                         "(deployed-fixed-model serving mode)")
    ap.add_argument("--randinit", action="store_true",
                    help="real random weights instead of zeros")
    ap.add_argument("--autolayout", action="store_true",
                    help="XLA-chosen weight layouts (one-time relayout "
                         "of the param tree; weights stay jit arguments)")
    ap.add_argument("--batch", type=int, default=None,
                    help="image workload only: samples per serving call "
                         "(default 4 — batched serving is the production "
                         "image mode; the CFG pair of a single sample "
                         "underutilizes the chip)")
    ap.add_argument("--steps_per_call", type=int, default=None,
                    help="denoise steps per fetched execution (scan "
                         "inside the program; amortizes the tunnel's "
                         "~28.5 ms RPC floor; default 5, must divide "
                         "--steps; 1 restores the per-step protocol)")
    ap.add_argument("--decode_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="VAE decode dtype; float32 (default) is the "
                         "reference-parity headline protocol, bfloat16 "
                         "measures the opt-in fast decode (--vae_dtype "
                         "on the CLIs)")
    ap.add_argument("--denoise_only", action="store_true",
                    help="video: emit the denoise-only fps metric instead "
                         "of the measured end-to-end (text-encode + "
                         "denoise + fp32 decode) metric")
    ap.add_argument("--workload", default="video",
                    choices=["video", "image"],
                    help="video: 16f AnimateDiff-XL denoise (headline); "
                         "image: triple-prompt UnZipLoRA SDXL image")
    ap.add_argument("--fold_cross_kv", action="store_true",
                    help="image workload: fold ALL 12/12 projections "
                         "(shared-prompt special case — prices the "
                         "triple-prompt dynamic cross-attn LoRA "
                         "branches; exact-parity only when content == "
                         "style == combined prompt)")
    args = ap.parse_args()

    if args.workload == "image" and args.steps == 30:
        args.steps = 50  # reference image default (infer.py:99)
    if args.batch is None:
        args.batch = 4 if args.workload == "image" else 1
    if args.steps_per_call is None:
        args.steps_per_call = 5 if args.steps % 5 == 0 else 1
        if args.workload == "video" and args.frames >= 32 and not args.tiny:
            # the 5-step scanned program at 64 CFG rows + the
            # frame-repeated KV cache exceeds 16 GB HBM at compile
            # (measured round 4); the per-step protocol fits
            args.steps_per_call = 1
    _wait_for_backend()
    execute, denoise_flops = build(
        args.frames, args.res, args.steps, args.tiny,
        args.scan, args.workload, args.impl,
        const=args.const, randinit=args.randinit,
        autolayout=args.autolayout, batch=args.batch,
        steps_per_call=args.steps_per_call,
        fold_cross_kv=args.fold_cross_kv)
    seed = int(time.time() * 1e3) % (2 ** 31)

    def timed(fn, warm_seed):
        fn(warm_seed)  # compile + warm (forced fetch)
        ts = []
        for t in range(args.trials):
            t0 = time.time()
            fn(warm_seed + 1 + t * 7919)
            ts.append(time.time() - t0)
        return min(ts)

    def perf_fields(flops_val, secs):
        """Auditable perf triple: FLOPs from compiled cost analysis,
        the TF/s they ran at, and MFU against the v5e bf16 peak."""
        if not flops_val or secs <= 0:
            return {}
        tf_s = flops_val / secs
        return {"tflops": round(flops_val / 1e12, 2),
                "tflops_per_s": round(tf_s / 1e12, 2),
                "mfu": round(tf_s / V5E_BF16_PEAK_FLOPS, 4)}

    denoise_s = timed(execute, seed)
    denoise_fl = denoise_flops()
    if denoise_fl is not None and not args.tiny and args.impl != "xla":
        # add the Pallas-kernel FLOPs the XLA cost analysis can't see
        rows = 2 * (args.frames if args.workload == "video"
                    else args.batch)
        denoise_fl += args.steps * pallas_flops_per_step(
            args.res, rows,
            args.frames if args.workload == "video" else 1)

    if args.workload == "image":
        # e2e like the video metric: triple-prompt text encode (the
        # pipeline encodes combined/content/style through both towers),
        # 50-step denoise, fp32 decode of every image in the batch.
        text_once, text_flops = build_text_encode(args.tiny)

        def text3(s):
            # disjoint seed triples per invocation: timed() advances s
            # by 1 per trial, and s, s+1, s+2 would re-hit the tunnel's
            # (program, inputs) result cache from the warm-up call
            text_once(s * 3)
            text_once(s * 3 + 1)
            text_once(s * 3 + 2)
        text_s = timed(text3, seed + 101)
        text_fl = text_flops()
        text_fl = None if text_fl is None else text_fl * 3
        del execute, denoise_flops
        import gc
        gc.collect()
        dec_exec, dec_flops = build_decode(
            args.tiny, args.batch, args.res,
            dtype=jnp.dtype(args.decode_dtype))
        decode_s = timed(dec_exec, seed + 202)
        decode_fl = dec_flops()
        if decode_fl is not None and not args.tiny:
            decode_fl += vae_attn_flops(args.res, args.batch)
        e2e_s = text_s + denoise_s + decode_s
        per_image = e2e_s / args.batch
        # The image workload has no reference baseline: the reference
        # publishes no image-latency numbers (SURVEY.md §6) and the
        # driver's 20 s target is defined for the VIDEO workload only,
        # so vs_baseline is intentionally null here — the metric is
        # self-describing: sec/image at this serving batch plus the
        # throughput it implies.
        print(json.dumps({
            "metric": f"unziplora_sdxl_image_{args.res}px_{args.steps}step"
                      f"_latency" + (f"_batch{args.batch}"
                                     if args.batch > 1 else ""),
            "value": round(per_image, 4),
            "unit": "sec/image/chip",
            "vs_baseline": None,
            "images_per_min_per_chip": round(60.0 / max(per_image, 1e-9),
                                             2),
            "serving_batch": args.batch,
            "components_s": {"text_encode_3prompts": round(text_s, 3),
                             "denoise": round(denoise_s, 3),
                             "vae_decode": round(decode_s, 3)},
            **perf_fields(sum(f for f in (text_fl, denoise_fl, decode_fl)
                              if f), e2e_s),
            "flops_model": "xla_cost_analysis+analytic_pallas",
            "perf_components": {
                "denoise": perf_fields(denoise_fl, denoise_s),
                "vae_decode": perf_fields(decode_fl, decode_s)},
        }))
        return

    if args.denoise_only or args.scan:
        fps = args.frames / denoise_s
        projected_8chip_s = project_v5e8_denoise(denoise_s, args.steps,
                                                 args.frames)
        rec = {
            "metric": f"animatediffxl_denoise_{args.frames}f_{args.res}px_"
                      f"{args.steps}step_fps_per_chip",
            "value": round(fps, 4),
            "unit": "frames/sec/chip",
            "vs_baseline": round(20.0 / max(projected_8chip_s, 1e-9), 4),
            **perf_fields(denoise_fl, denoise_s),
        }
        print(json.dumps(rec))
        return

    # measured end-to-end: text-encode + denoise + fp32 VAE decode, each
    # timed on chip with the per-step fetch protocol. vs_baseline uses the
    # PROJECTED v5e-8 time (frame-parallel denoise+decode /8; text encode
    # unsharded — it is milliseconds); real multi-chip hardware is not
    # reachable from this session.
    text_exec, text_flops = build_text_encode(args.tiny)
    text_s = timed(text_exec, seed + 101)
    text_fl = text_flops()
    # release the denoise program + its params before the decode
    # measurement: all three WEIGHT sets coexist in serving (~7 GB), but
    # the bench's denoise closure additionally pins the LoRA state and
    # compiled-program buffers that, with chunked fp32 decoder
    # activations, overflow the 16 GB chip
    del execute, denoise_flops
    import gc
    gc.collect()
    dec_exec, dec_flops = build_decode(args.tiny, args.frames, args.res,
                                       dtype=jnp.dtype(args.decode_dtype))
    decode_s = timed(dec_exec, seed + 202)
    decode_fl = dec_flops()
    if decode_fl is not None and not args.tiny:
        decode_fl += vae_attn_flops(args.res, args.frames)
    e2e_s = text_s + denoise_s + decode_s
    # decode stays /8 exactly: per-frame chunk-1 decode is the SAME
    # program shape per device as the single-chip measurement
    projected_v5e8_s = (text_s + project_v5e8_denoise(
        denoise_s, args.steps, args.frames) + decode_s / 8)
    projected_naive_s = text_s + (denoise_s + decode_s) / 8
    dd = ("" if args.decode_dtype == "float32"
          else f"_decode_{args.decode_dtype}")
    rec = {
        "metric": f"animatediffxl_video_e2e_{args.frames}f_{args.res}px_"
                  f"{args.steps}step{dd}_fps_per_chip",
        "value": round(args.frames / e2e_s, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(20.0 / max(projected_v5e8_s, 1e-9), 4),
        "components_s": {"text_encode": round(text_s, 3),
                         "denoise": round(denoise_s, 3),
                         "vae_decode": round(decode_s, 3)},
        "projected_v5e8_s": round(projected_v5e8_s, 3),
        "projected_v5e8_naive_s": round(projected_naive_s, 3),
        "projection_model": {
            "shard_compute_slowdown": SHARD_COMPUTE_SLOWDOWN,
            "ici_s": round(args.steps * ICI_S_PER_UNET_CALL_16F
                           * args.frames / 16.0, 3)},
        **perf_fields(sum(f for f in (text_fl, denoise_fl, decode_fl)
                          if f), e2e_s),
        "flops_model": "xla_cost_analysis+analytic_pallas",
        "perf_components": {
            "denoise": perf_fields(denoise_fl, denoise_s),
            "vae_decode": perf_fields(decode_fl, decode_s)},
    }
    # the TPU-down fallback record must hold the HEADLINE protocol only
    # (a frame-sweep run like --frames 8 must not overwrite it)
    if (not args.tiny and args.decode_dtype == "float32"
            and (args.frames, args.res, args.steps) == (16, 1024, 30)):
        with open(LAST_RESULT, "w") as f:
            json.dump(rec, f)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
