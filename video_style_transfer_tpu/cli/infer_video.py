"""Video inference CLI — the reference's three-mode video generation
(inference_animatediff.py:154-249): motion UNet + stage-2 checkpoint +
stage-1 UnZipLoRA, generating both/content/style videos. Defaults mirror
inference_animatediff.sh:18-24 (16 frames, 1024^2, CFG 7.5) with 30 steps
as the benchmark workload default."""
from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", default=None)
    p.add_argument("--motion_checkpoint", "--motion_adapter_path",
                   dest="motion_checkpoint", default=None,
                   help="motion weights: a stage-2 motion_modules.pth / "
                        ".safetensors (or a directory containing one — "
                        "reference _find_pth semantics), or a diffusers "
                        "MotionAdapter safetensors file")
    p.add_argument("--unziplora_name_or_path", default=None)
    p.add_argument("--unziplora_name", default="unziplora")
    # explicit per-artifact paths, the reference's spelling
    # (inference_animatediff.py:266-281)
    p.add_argument("--unziplora_content_path", default=None)
    p.add_argument("--unziplora_style_path", default=None)
    p.add_argument("--unziplora_content_weight_path", default=None)
    p.add_argument("--unziplora_style_weight_path", default=None)
    p.add_argument("--prompt", default=None)
    p.add_argument("--instance_prompt", default=None,
                   help="reference spelling for --prompt ('both' mode)")
    p.add_argument("--content_prompt", default=None,
                   help="prompt for the content-only mode (defaults to "
                        "--prompt; reference inference_animatediff.py"
                        ":230-241)")
    p.add_argument("--style_prompt", default=None,
                   help="prompt for the style-only mode (defaults to "
                        "--prompt)")
    from video_style_transfer_tpu.cli.common import DEFAULT_NEGATIVE_PROMPT
    p.add_argument("--negative_prompt", default=DEFAULT_NEGATIVE_PROMPT)
    p.add_argument("--modes", nargs="+",
                   default=["both", "content", "style"],
                   choices=["both", "content", "style", "base"])
    p.add_argument("--compilation_cache_dir", default=None,
                   help="persistent XLA compile-cache dir (default "
                        "$JAX_COMPILATION_CACHE_DIR or ~/.cache/jax); "
                        "warm starts skip the multi-minute SDXL compile")
    p.add_argument("--output_dir", "--save_dir", dest="output_dir",
                   default="out/videos")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--height", type=int, default=None,
                   help="defaults to --resolution (reference "
                        "inference_animatediff.py:285-286 exposes "
                        "height/width separately)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--mixed_precision", default="bf16",
                   choices=["no", "bf16", "fp16"],
                   help="UNet compute dtype; fp16 maps to bf16 (the TPU "
                        "half type); the VAE decode dtype is --vae_dtype")
    p.add_argument("--vae_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="VAE decode dtype. float32 (default) is the "
                        "reference-parity path; bfloat16 is the "
                        "TPU-native fast decode — bf16 keeps fp32's "
                        "exponent range, so the fp16 overflow that "
                        "forced the reference to fp32 cannot occur "
                        "(pixel noise sub-1% of range; PERF.md)")
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--coordinator_address", default=None,
                   help="multi-process JAX coordinator (host:port) — "
                        "with --num_processes/--process_id (or the "
                        "JAX_COORDINATOR_ADDRESS/... env vars) "
                        "--frame_parallel spans a pod's devices; "
                        "process 0 writes the videos (the 2-process "
                        "serving leg of tests/test_distributed.py "
                        "exercises this path's collectives)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--frame_parallel", type=int, default=1,
                   help="shard the frame axis over N devices (an "
                        "all-'frame' mesh): spatial layers run "
                        "embarrassingly parallel, temporal attention "
                        "all-gathers F<=32 per pixel block on ICI, and "
                        "the fp32 VAE decode shards per frame — the "
                        "production v5e-8 serving layout (N must divide "
                        "--num_frames)")
    p.add_argument("--steps_per_call", type=int, default=None,
                   help="single-chip long-video fallback: run the "
                        "denoise as jitted N-step chunks chained from "
                        "the host instead of one scanned program. "
                        "Default: full scan, EXCEPT frames >= 32 at "
                        "res >= 1024 without --frame_parallel, where "
                        "the one-program form exceeds a 16 GB chip at "
                        "compile (PERF.md round 4) — there it "
                        "auto-selects 1 and says so. 0 forces the full "
                        "scan")
    p.add_argument("--smoke", action="store_true")
    return p


def resolve_steps_per_call(requested, *, frames: int, res: int,
                           steps: int, frame_parallel: bool,
                           smoke: bool = False):
    """Chunked-denoise decision (VERDICT r4 next-item 5): returns the
    steps-per-call (0 = one scanned program). A 32-frame 1024^2 request
    on ONE chip compiles >16 GB as a single scan (64 CFG rows + the
    frame-repeated KV cache), so it falls back to per-step chunks
    rather than dying in the compiler; frame-parallel meshes shard the
    memory away and keep the scan."""
    if requested is not None:
        return max(requested, 0)
    if smoke or frame_parallel:
        return 0
    if frames >= 32 and res >= 1024:
        print(f"note: {frames} frames at {res}^2 on one chip exceeds "
              f"HBM as a single scanned program; running the denoise "
              f"as per-step jitted calls (--steps_per_call 1; shard "
              f"with --frame_parallel N to keep the one-program scan)")
        return 1
    return 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    # multi-process init first (no-op single host)
    from video_style_transfer_tpu.parallel import distributed as dist
    dist.init_distributed(args.coordinator_address, args.num_processes,
                          args.process_id)
    is_main = dist.is_main_process()
    args.prompt = args.prompt or args.instance_prompt
    if not args.prompt:
        raise SystemExit("need --prompt (or --instance_prompt)")
    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.data.video_io import save_video
    common.enable_compile_cache(args.compilation_cache_dir)
    from video_style_transfer_tpu.lora import interop
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    from video_style_transfer_tpu.pipelines.video import generate_video
    from video_style_transfer_tpu.utils.motion_convert import (
        import_motion_state_dict, load_motion_checkpoint)

    os.makedirs(args.output_dir, exist_ok=True)
    bundle = common.load_models(
        args.pretrained_model_name_or_path, smoke=args.smoke, motion=True,
        dtype=jnp.float32 if args.mixed_precision == "no"
        else jnp.bfloat16)
    res = args.resolution if not args.smoke else 16
    height = args.height or res
    width = args.width or res
    if args.smoke:
        height = width = res
    steps = args.num_inference_steps if not args.smoke else 2
    frames = args.num_frames if not args.smoke else 4

    params = bundle.unet
    if args.motion_checkpoint:
        sd = load_motion_checkpoint(args.motion_checkpoint)
        params = import_motion_state_dict(params, sd)

    explicit = args.unziplora_content_path and args.unziplora_style_path
    if args.unziplora_name_or_path or explicit:
        base = args.unziplora_name_or_path or ""
        name = args.unziplora_name

        def _p(flag, default):
            return flag if flag else os.path.join(base, default)

        params, state = interop.import_state_dicts(
            params,
            interop.load_safetensors(os.path.join(
                _p(args.unziplora_content_path, f"{name}_content"),
                "pytorch_lora_weights.safetensors")),
            interop.load_safetensors(os.path.join(
                _p(args.unziplora_style_path, f"{name}_style"),
                "pytorch_lora_weights.safetensors")),
            interop.load_merger_pth(_p(
                args.unziplora_content_weight_path,
                f"{name}_merger_content.pth")),
            interop.load_merger_pth(_p(
                args.unziplora_style_weight_path,
                f"{name}_merger_style.pth")))
    elif args.smoke:
        params, state = insert_unziplora(params, jax.random.PRNGKey(0),
                                         rank=4)
    else:
        # init_unzip_lora_params is NOT zero-init (both factors random,
        # reference parity) — folding random LoRA into real weights
        # would corrupt every frame. Plain AnimateDiff = --modes base.
        if any(m != "base" for m in args.modes):
            raise SystemExit("--unziplora_name_or_path is required for "
                             "LoRA modes (use --modes base for plain "
                             "AnimateDiff generation)")
        state = None


    # per-mode prompts (reference inference_animatediff.py:224-247 runs
    # both/content/style with their own prompts)
    mode_prompts = {
        "both": args.prompt, "base": args.prompt,
        "content": args.content_prompt or args.prompt,
        "style": args.style_prompt or args.prompt,
    }
    uncond = common.negative_conditioning(bundle, args.negative_prompt,
                                          height=height, width=width)

    from video_style_transfer_tpu.lora.surgery import fold_unziplora

    mesh = None
    if args.frame_parallel > 1:
        from video_style_transfer_tpu.parallel.mesh import (
            create_mesh, replicate)
        n = args.frame_parallel
        if len(jax.devices()) < n:
            raise SystemExit(f"--frame_parallel {n} needs {n} devices; "
                             f"{len(jax.devices())} available")
        if frames % n != 0:
            # uneven F shards fine (GSPMD pads the denoise; the decode
            # helper pads+slices explicitly) at the cost of one padded
            # frame's work per short shard
            print(f"note: --num_frames {frames} not divisible by "
                  f"--frame_parallel {n}; last shard is padded")
        if jax.process_count() > 1 and n != len(jax.devices()):
            raise SystemExit(
                f"multi-process runs must use every device: "
                f"--frame_parallel {n} != {len(jax.devices())} global "
                f"devices")
        mesh = create_mesh(jax.devices()[:n])  # every device on 'frame'
        # first collective while processes are skew-free (Gloo/ICI
        # rendezvous deadline; see cli/train_unziplora.py)
        dist.barrier("serve_mesh_ready")
        bundle.vae = jax.device_put(bundle.vae, replicate(mesh))
        if is_main:
            print(f"frame-parallel serving: mesh {dict(mesh.shape)}")

    outs = []
    for mode in args.modes:
        cond = common.make_conditioning(bundle, mode_prompts[mode],
                                        height=height, width=width)
        # video inference feeds ONE shared prompt (the reference's
        # AnimateDiff processor collapses the streams too), so the LoRA
        # folds fully into the base kernels — rank-64 dual-branch matmuls
        # disappear from the serving path. mode 'base' (or no LoRA
        # loaded) skips folding entirely.
        if state is None or mode == "base":
            fparams = params
        else:
            fparams, _ = fold_unziplora(params, state, mode=mode,
                                        fold_cross_kv=True)
        dtype = (jnp.float32 if (args.smoke or args.mixed_precision
                                 == "no") else jnp.bfloat16)

        spc = resolve_steps_per_call(
            args.steps_per_call, frames=frames, res=max(height, width),
            steps=steps, frame_parallel=mesh is not None,
            smoke=args.smoke)
        if mesh is None and spc and spc < steps:
            # chunked single-chip protocol: host-chained jitted k-step
            # denoise + one jitted decode program (identical math to the
            # scan; tests/test_pipelines.py pins the equality)
            from video_style_transfer_tpu.pipelines.video import (
                decode_video, generate_video_latents_chunked)

            def run_fn(p, u, c, key, m=mode):
                lat = generate_video_latents_chunked(
                    p, bundle.unet_cfg, u, c, key, num_frames=frames,
                    height=height, width=width, num_steps=steps,
                    steps_per_call=spc, cfg_scale=args.guidance_scale,
                    mode=m, state=state, dtype=dtype,
                    vae_scale_factor=bundle.vae_scale_factor)
                dec = jax.jit(functools.partial(
                    decode_video, vae_cfg=bundle.vae_cfg,
                    chunk=1 if not args.smoke else frames,
                    dtype=jnp.dtype(args.vae_dtype)))
                return dec(bundle.vae, latents=lat)
        elif mesh is None:
            def run_fn(p, u, c, key, m=mode):
                return generate_video(
                    p, bundle.unet_cfg, bundle.vae, bundle.vae_cfg, u, c,
                    key, num_frames=frames, height=height, width=width,
                    num_steps=steps, cfg_scale=args.guidance_scale,
                    mode=m, state=state, dtype=dtype,
                    decode_chunk=1 if not args.smoke else frames,
                    vae_scale_factor=bundle.vae_scale_factor,
                    decode_dtype=jnp.dtype(args.vae_dtype))
        else:
            # the production multi-chip layout (__graft_entry__'s serving
            # dryrun): frame-sharded denoise + frame-sharded fp32 decode
            # in one jitted program; GSPMD inserts the temporal-attention
            # all-gather from the sharding constraint
            from jax.sharding import NamedSharding, PartitionSpec as P

            from video_style_transfer_tpu.pipelines.video import (
                decode_video_frame_sharded, generate_video_latents)

            def run_fn(p, u, c, key, m=mode):
                lat = generate_video_latents(
                    p, bundle.unet_cfg, u, c, key, num_frames=frames,
                    height=height, width=width, num_steps=steps,
                    cfg_scale=args.guidance_scale, mode=m, state=state,
                    dtype=dtype,
                    vae_scale_factor=bundle.vae_scale_factor)
                lat = jax.lax.with_sharding_constraint(
                    lat, NamedSharding(mesh, P("frame")))
                # decode per shard at chunk 1 (shard_map + local lax.map,
                # padding uneven F): see decode_video_frame_sharded
                return decode_video_frame_sharded(
                    bundle.vae, bundle.vae_cfg, lat, mesh,
                    dtype=jnp.dtype(args.vae_dtype))

            fparams = jax.device_put(
                fparams, NamedSharding(mesh, P()))
        # the chunked path drives its own jitted k-step programs from
        # the host — wrapping it in an outer jit would inline the whole
        # denoise back into one program, recreating the OOM it avoids
        chunked = mesh is None and spc and spc < steps
        if chunked:
            run = run_fn
        elif mesh is not None and jax.process_count() > 1:
            # replicate the frames so every process fetches locally (a
            # 'frame'-sharded output is not fully addressable)
            from jax.sharding import NamedSharding, PartitionSpec as P
            run = jax.jit(run_fn,
                          out_shardings=NamedSharding(mesh, P()))
        else:
            run = jax.jit(run_fn)
        if mesh is None:
            video = run(fparams, uncond, cond,
                        jax.random.PRNGKey(args.seed))
        else:
            # trace INSIDE the mesh context: the shard_map motion module,
            # the context_constraint reshard pins, and the rowsharded
            # Pallas wrappers all key off parallel.mesh.context_mesh().
            # Without it the trace falls back to plain GSPMD — audited at
            # a full-activation all-gather per motion module
            # (benchmarks/collective_volume.py), erasing the
            # frame-parallel speedup.
            with mesh:
                video = run(fparams, uncond, cond,
                            jax.random.PRNGKey(args.seed))
        if not is_main:
            continue  # process-0-gated writes, like the trainers
        path = save_video(list(jax.device_get(video)),
                          os.path.join(args.output_dir, f"{mode}.mp4"),
                          fps=args.fps)
        outs.append(path)
        print("wrote", path)
    return outs


if __name__ == "__main__":
    main()
