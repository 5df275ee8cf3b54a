"""Video inference CLI — the reference's three-mode video generation
(inference_animatediff.py:154-249): motion UNet + stage-2 checkpoint +
stage-1 UnZipLoRA, generating both/content/style videos. Defaults mirror
inference_animatediff.sh:18-24 (16 frames, 1024^2, CFG 7.5) with 30 steps
as the benchmark workload default."""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", default=None)
    p.add_argument("--motion_checkpoint", default=None,
                   help="motion weights: a stage-2 motion_modules.pth / "
                        ".safetensors (or a directory containing one — "
                        "reference _find_pth semantics), or a diffusers "
                        "MotionAdapter safetensors file")
    p.add_argument("--unziplora_name_or_path", default=None)
    p.add_argument("--unziplora_name", default="unziplora")
    p.add_argument("--prompt", required=True)
    from video_style_transfer_tpu.cli.common import DEFAULT_NEGATIVE_PROMPT
    p.add_argument("--negative_prompt", default=DEFAULT_NEGATIVE_PROMPT)
    p.add_argument("--modes", nargs="+",
                   default=["both", "content", "style"],
                   choices=["both", "content", "style", "base"])
    p.add_argument("--output_dir", default="out/videos")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--fps", type=int, default=8)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--smoke", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.data.video_io import save_video
    from video_style_transfer_tpu.lora import interop
    from video_style_transfer_tpu.lora.surgery import insert_unziplora
    from video_style_transfer_tpu.pipelines.video import generate_video
    from video_style_transfer_tpu.utils.motion_convert import (
        import_motion_state_dict, load_motion_checkpoint)

    os.makedirs(args.output_dir, exist_ok=True)
    bundle = common.load_models(args.pretrained_model_name_or_path,
                                smoke=args.smoke, motion=True)
    res = args.resolution if not args.smoke else 16
    steps = args.num_inference_steps if not args.smoke else 2
    frames = args.num_frames if not args.smoke else 4

    params = bundle.unet
    if args.motion_checkpoint:
        sd = load_motion_checkpoint(args.motion_checkpoint)
        params = import_motion_state_dict(params, sd)

    if args.unziplora_name_or_path:
        base = args.unziplora_name_or_path
        name = args.unziplora_name
        params, state = interop.import_state_dicts(
            params,
            interop.load_safetensors(os.path.join(
                base, f"{name}_content",
                "pytorch_lora_weights.safetensors")),
            interop.load_safetensors(os.path.join(
                base, f"{name}_style",
                "pytorch_lora_weights.safetensors")),
            interop.load_merger_pth(os.path.join(
                base, f"{name}_merger_content.pth")),
            interop.load_merger_pth(os.path.join(
                base, f"{name}_merger_style.pth")))
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


    cond = common.make_conditioning(bundle, args.prompt, height=res,
                                    width=res)
    uncond = common.negative_conditioning(bundle, args.negative_prompt,
                                          height=res, width=res)

    from video_style_transfer_tpu.lora.surgery import fold_unziplora

    outs = []
    for mode in args.modes:
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
        run = jax.jit(lambda p, u, c, key, m=mode: generate_video(
            p, bundle.unet_cfg, bundle.vae, bundle.vae_cfg, u, c,
            key, num_frames=frames, height=res, width=res, num_steps=steps,
            cfg_scale=args.guidance_scale, mode=m, state=state,
            dtype=jnp.float32 if args.smoke else jnp.bfloat16,
            decode_chunk=1 if not args.smoke else frames,
            vae_scale_factor=bundle.vae_scale_factor))
        video = run(fparams, uncond, cond, jax.random.PRNGKey(args.seed))
        path = save_video(list(jax.device_get(video)),
                          os.path.join(args.output_dir, f"{mode}.mp4"),
                          fps=args.fps)
        outs.append(path)
        print("wrote", path)
    return outs


if __name__ == "__main__":
    main()
