"""Image inference CLI — the reference's 4 generation modes
(infer.py:135-199): combined recontextualization (both LoRAs + mergers),
content-only, style-only, plus base SDXL. Seeds default to the
reference's fixed set {0, 1000, 111, 1234} (infer.py:14)."""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", default=None)
    p.add_argument("--pretrained_vae_model_name_or_path", default=None,
                   help="separate VAE checkpoint directory (the "
                        "reference swaps in e.g. sdxl-vae-fp16-fix, "
                        "train_unziplora.py:1252-1261); decode parity "
                        "requires generating with the same VAE the "
                        "reference used")
    p.add_argument("--unziplora_name_or_path", default=None)
    p.add_argument("--unziplora_name", default="unziplora")
    p.add_argument("--style_name_or_path", default=None,
                   help="cross-image generation: take the style branch "
                        "from a DIFFERENT trained artifact set "
                        "(playground.ipynb cells 12-21 capability)")
    p.add_argument("--style_name", default=None)
    p.add_argument("--single_lora", default=None,
                   help="load ONE per-branch LoRA safetensors file "
                        "(plain single-LoRA generation, infer_single.sh "
                        "path); forces mode=content")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--prompt", required=True)
    p.add_argument("--prompt_2", default=None,
                   help="separate text for the second (bigG) encoder")
    p.add_argument("--prompt_content", default=None)
    p.add_argument("--prompt_content_2", default=None)
    p.add_argument("--prompt_style", default=None)
    p.add_argument("--prompt_style_2", default=None)
    from video_style_transfer_tpu.cli.common import DEFAULT_NEGATIVE_PROMPT
    p.add_argument("--negative_prompt", default=DEFAULT_NEGATIVE_PROMPT)
    p.add_argument("--negative_prompt_2", default=None)
    p.add_argument("--negative_prompt_content", default=None)
    p.add_argument("--negative_prompt_style", default=None)
    p.add_argument("--mode", default="both",
                   choices=["both", "content", "style", "base"])
    p.add_argument("--compilation_cache_dir", default=None,
                   help="persistent XLA compile-cache dir (default "
                        "$JAX_COMPILATION_CACHE_DIR or ~/.cache/jax); "
                        "warm starts skip the multi-minute SDXL compile")
    p.add_argument("--output_dir", "--save_dir", dest="output_dir",
                   default="out/images")
    p.add_argument("--num", type=int, default=1,
                   help="images per (prompt, seed) (reference "
                        "infer.py:99 generates num per seed)")
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=5.0)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--height", type=int, default=None,
                   help="defaults to --resolution")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--sampler", default="euler", choices=["euler", "dpm"])
    p.add_argument("--vae_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="VAE decode dtype: float32 (default, reference "
                        "parity) or bfloat16 (TPU fast decode; bf16 has "
                        "fp32's exponent range so the fp16 overflow the "
                        "reference guards against cannot occur)")
    p.add_argument("--seeds", type=int, nargs="+",
                   default=[0, 1000, 111, 1234])
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel size: shard the spatial "
                        "transformer weights over a 'model' mesh axis "
                        "(parallel/tensor.py); must divide the device "
                        "count; the 'data' axis is sized by --dp and "
                        "devices beyond dp*tp are left unused")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-process JAX coordinator (host:port) — "
                        "with --num_processes/--process_id (or the "
                        "JAX_COORDINATOR_ADDRESS/... env vars) serving "
                        "spans a pod's devices; process 0 writes the "
                        "images")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--dp", type=int, default=1,
                   help="sample-parallel serving: generate dp images per "
                        "call (one (seed, draw) job per 'data'-axis "
                        "device, each with its own PRNG key — bitwise "
                        "the batch-1 noise). Composes with --tp; uses "
                        "dp*tp devices. This is the image-latency "
                        "scaling lever on a pod (PERF.md: one chip is "
                        "compute-saturated from batch 4 up)")
    p.add_argument("--watermark", action="store_true",
                   help="stamp the SDXL invisible watermark (native "
                        "implementation, utils/watermark.py; the "
                        "reference stamps it whenever the "
                        "invisible-watermark package is installed)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--config_preset", default="sdxl",
                   choices=["sdxl", "tiny"],
                   help="model topology for --pretrained_model... dirs: "
                        "sdxl (default) or tiny — the synthetic-"
                        "checkpoint smoke topology the parity-gate "
                        "runbook (cli/verify_parity.py) generates with")
    return p


def main(argv=None, bundle=None):
    """bundle: an optional prebuilt common.ModelBundle — callers that
    already ran common.load_models (the parity-gate runbook's load
    stage, cli/verify_parity.py) pass it through so the 10 GB checkpoint
    is read and converted once, not twice."""
    args = build_parser().parse_args(argv)
    # multi-process init first (no-op single host); lets --dp/--tp span
    # a pod's global devices like the trainer CLIs
    from video_style_transfer_tpu.parallel import distributed as dist
    dist.init_distributed(args.coordinator_address, args.num_processes,
                          args.process_id)
    is_main = dist.is_main_process()
    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.data.video_io import save_image
    common.enable_compile_cache(args.compilation_cache_dir)
    from video_style_transfer_tpu.lora import interop
    from video_style_transfer_tpu.lora.surgery import insert_unziplora

    os.makedirs(args.output_dir, exist_ok=True)
    if bundle is None:
        configs = (common.tiny_checkpoint_configs()
                   if args.config_preset == "tiny" else None)
        bundle = common.load_models(
            args.pretrained_model_name_or_path, smoke=args.smoke,
            motion=False, configs=configs,
            vae_path=args.pretrained_vae_model_name_or_path)
    res = args.resolution if not args.smoke else 16
    height = (args.height or res) if not args.smoke else res
    width = (args.width or res) if not args.smoke else res
    steps = args.num_inference_steps if not args.smoke else 2

    params, state = bundle.unet, None
    if args.single_lora:
        params, state = interop.import_single_lora(
            bundle.unet, interop.load_safetensors(args.single_lora),
            scale=args.lora_scale)
        args.mode = "content"
    elif args.mode != "base":
        if args.unziplora_name_or_path:
            base = args.unziplora_name_or_path
            name = args.unziplora_name
            style_base = args.style_name_or_path or base
            style_name = args.style_name or name
            params, state = interop.import_state_dicts(
                bundle.unet,
                interop.load_safetensors(os.path.join(
                    base, f"{name}_content",
                    "pytorch_lora_weights.safetensors")),
                interop.load_safetensors(os.path.join(
                    style_base, f"{style_name}_style",
                    "pytorch_lora_weights.safetensors")),
                interop.load_merger_pth(os.path.join(
                    base, f"{name}_merger_content.pth")),
                interop.load_merger_pth(os.path.join(
                    style_base, f"{style_name}_merger_style.pth")))
        elif args.smoke:
            params, state = insert_unziplora(bundle.unet,
                                             jax.random.PRNGKey(0), rank=4)
        else:
            raise SystemExit("--unziplora_name_or_path required for "
                             "LoRA modes")

    if state is not None:
        from video_style_transfer_tpu.lora.surgery import fold_unziplora
        # distinct content/style prompts keep cross-attn k/v dynamic;
        # the other 10/12 projections fold into the base kernels
        full = args.prompt_content is None and args.prompt_style is None
        params, _ = fold_unziplora(params, state, mode=args.mode,
                                   fold_cross_kv=full)

    cond = common.make_conditioning(
        bundle, args.prompt, args.prompt_content, args.prompt_style,
        height=height, width=width, prompt_2=args.prompt_2,
        prompt_content_2=args.prompt_content_2,
        prompt_style_2=args.prompt_style_2)
    uncond = common.negative_conditioning(
        bundle, args.negative_prompt, height=height, width=width,
        negative_prompt_2=args.negative_prompt_2,
        negative_prompt_content=args.negative_prompt_content,
        negative_prompt_style=args.negative_prompt_style)
    dp = max(args.dp, 1)
    mesh = None
    if args.tp > 1 or dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from video_style_transfer_tpu.parallel.mesh import (
            create_mesh, replicate)
        devs = jax.devices()
        need = dp * max(args.tp, 1)
        if len(devs) < need:
            raise SystemExit(f"--dp {dp} x --tp {args.tp} needs {need} "
                             f"devices; {len(devs)} available")
        if jax.process_count() > 1 and need != len(devs):
            raise SystemExit(
                f"multi-process runs must use every device: --dp {dp} x "
                f"--tp {max(args.tp, 1)} != {len(devs)} global devices")
        mesh = create_mesh(devs[:need], data=dp, frame=1,
                           model=args.tp if args.tp > 1 else 0)
        # first collective while processes are skew-free (Gloo/ICI
        # rendezvous deadline; see cli/train_unziplora.py)
        dist.barrier("serve_mesh_ready")
        if args.tp > 1:
            from video_style_transfer_tpu.parallel.tensor import \
                shard_params_tp
            params = shard_params_tp(params, mesh)
        else:
            params = jax.device_put(params, replicate(mesh))
        print(f"serving mesh {dict(mesh.shape)}")

    from video_style_transfer_tpu.pipelines.image import (
        decode_images, generate_latents)
    from video_style_transfer_tpu.pipelines.sampling import tile_conditioning

    if dp > 1:
        cond, uncond = tile_conditioning(cond, dp), tile_conditioning(
            uncond, dp)

    # conditioning passes as a jit ARGUMENT (not a baked constant) so new
    # prompts reuse the compiled program; with --dp the key argument is a
    # (dp, 2) STACK of per-row PRNG keys
    def _gen(p, u, c, key):
        lat = generate_latents(
            p, bundle.unet_cfg, u, c, key, height=height, width=width,
            batch=dp, num_steps=steps, cfg_scale=args.guidance_scale,
            sampler=args.sampler, mode=args.mode, state=state,
            dtype=jnp.float32 if args.smoke else jnp.bfloat16,
            vae_scale_factor=bundle.vae_scale_factor)
        if dp > 1:
            lat = jax.lax.with_sharding_constraint(
                lat, NamedSharding(mesh, P("data")))
        return decode_images(bundle.vae, bundle.vae_cfg, lat,
                             dtype=jnp.dtype(args.vae_dtype))

    if mesh is not None and jax.process_count() > 1:
        # replicate the output so every process can fetch its images
        # locally (a 'data'-sharded output is not fully addressable)
        from video_style_transfer_tpu.parallel.mesh import replicate
        run = jax.jit(_gen, out_shardings=replicate(mesh))
    else:
        run = jax.jit(_gen)
    # trace/execute inside the mesh context when one exists so
    # parallel.mesh.context_mesh() consumers (the rowsharded Pallas
    # wrappers, context_constraint pins) see it — without the context
    # GSPMD replicates every Pallas custom call's operands (audited in
    # benchmarks/collective_volume.py)
    import contextlib
    mesh_ctx = mesh if mesh is not None else contextlib.nullcontext()

    # one (seed, draw) job per output image (reference infer.py:99
    # generates --num per seed); --dp serves dp jobs per call, one per
    # 'data'-axis device — the final short chunk pads with repeats
    jobs = [(seed, i) for seed in args.seeds
            for i in range(max(args.num, 1))]
    outs = []
    for start in range(0, len(jobs), dp):
        chunk = jobs[start:start + dp]
        keys = [jax.random.fold_in(jax.random.PRNGKey(s), i)
                for s, i in chunk]
        keys += [keys[-1]] * (dp - len(chunk))
        karg = keys[0] if dp == 1 else jnp.stack(keys)
        with mesh_ctx:
            imgs = jax.device_get(run(params, uncond, cond, karg))
        if not is_main:
            continue  # process-0-gated writes, like the trainers
        if args.watermark:
            from video_style_transfer_tpu.utils.watermark import \
                apply_watermark
            imgs = apply_watermark(imgs)
        for (seed, i), img in zip(chunk, imgs):
            suffix = f"_{i}" if args.num > 1 else ""
            path = os.path.join(args.output_dir,
                                f"{args.mode}_seed{seed}{suffix}.png")
            save_image(img, path)
            outs.append(path)
            print("wrote", path)
    return outs


if __name__ == "__main__":
    main()
