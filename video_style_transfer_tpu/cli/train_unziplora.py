"""Stage-1 CLI: joint content/style UnZipLoRA training.

Flag surface mirrors the reference trainer's script interface
(train.sh:44-77 / train_unziplora.py:198-864 — the subset that is live in
the published recipe), driving the functional trainer in
training/stage1.py. Run with --smoke for a weights-free wiring test.

Example (reference recipe, original/README.md:43-60):
  python -m video_style_transfer_tpu.cli.train_unziplora \
    --pretrained_model_name_or_path /path/sdxl \
    --instance_video data/horse.mp4 --num_instance_frames 1 \
    --instance_prompt "a sbu horse in szn style" \
    --content_forward_prompt "a sbu horse" \
    --style_forward_prompt "an image in szn style" \
    --rank 64 --max_train_steps 600 \
    --content_learning_rate 5e-5 --style_learning_rate 5e-5 \
    --weight_learning_rate 5e-3 --similarity_lambda 0.5 \
    --with_period_column_separation --sample_times 3 --column_ratio 0.1
"""
from __future__ import annotations

import argparse
import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def _bool(s):
    return str(s).lower() in ("1", "true", "yes", "y")


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", default=None)
    p.add_argument("--instance_video", default=None)
    p.add_argument("--instance_data_dir", default=None,
                   help="image directory alternative to --instance_video")
    p.add_argument("--num_instance_frames", type=int, default=1)
    p.add_argument("--instance_video_mode", default="spaced",
                   choices=["spaced", "consecutive"],
                   help="'spaced': N evenly-spaced frames "
                        "(train_unziplora.py:902-941); 'consecutive': "
                        "first-N frames (video_train_unziplora.py "
                        "variant)")
    p.add_argument("--instance_prompt", required=True)
    p.add_argument("--content_forward_prompt", required=True)
    p.add_argument("--style_forward_prompt", required=True)
    p.add_argument("--compilation_cache_dir", default=None,
                   help="persistent XLA compile-cache dir (default "
                        "$JAX_COMPILATION_CACHE_DIR or ~/.cache/jax); "
                        "warm starts skip the multi-minute SDXL compile")
    p.add_argument("--output_dir", default="out/unziplora")
    p.add_argument("--name", default="unziplora")
    p.add_argument("--rank", type=int, default=64)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=600)
    p.add_argument("--content_learning_rate", type=float, default=5e-5)
    p.add_argument("--style_learning_rate", type=float, default=5e-5)
    p.add_argument("--weight_learning_rate", type=float, default=5e-3)
    p.add_argument("--similarity_lambda", type=float, default=0.5)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adamw8bit", "prodigy"],
                   help="reference train_unziplora.py:1602-1671; "
                        "'adamw8bit' is the TPU-native re-derivation of "
                        "bitsandbytes' blockwise 8-bit moments "
                        "(training/adam8bit.py)")
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="reference spelling for --optimizer adamw8bit "
                        "(train_unziplora.py:581-586)")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-4)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--prodigy_beta3", type=float, default=None,
                   help="None: use sqrt(beta2) (optax matches the "
                        "prodigy package here)")
    p.add_argument("--prodigy_decouple", type=_bool, default=True,
                   help="accepted for compatibility; optax prodigy is "
                        "decoupled by construction")
    p.add_argument("--prodigy_use_bias_correction", type=_bool,
                   default=True,
                   help="accepted for compatibility; optax prodigy is "
                        "bias-corrected by construction")
    p.add_argument("--prodigy_safeguard_warmup", type=_bool, default=True)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine", "cosine_with_restarts",
                            "polynomial"],
                   help="diffusers get_scheduler names "
                        "(training/schedules.py parity-tests the exact "
                        "formulas)")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--lr_num_cycles", type=int, default=1,
                   help="hard restarts (cosine_with_restarts only)")
    p.add_argument("--lr_power", type=float, default=1.0,
                   help="polynomial decay power")
    p.add_argument("--scale_lr", action="store_true",
                   help="multiply LRs by accum * batch * data_parallel "
                        "(reference train_unziplora.py:1525-1543 scales "
                        "by num_processes; the mesh 'data' size is the "
                        "TPU equivalent)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard the batch over N devices on the mesh "
                        "'data' axis (the reference's `accelerate launch "
                        "--num_processes N` DDP, train.sh:44). Each "
                        "device computes --train_batch_size rows, so the "
                        "global batch is batch*N — the DDP semantics. 0 "
                        "(default): single device, or ALL devices when "
                        "launched multi-process (jax.distributed "
                        "topology env vars / --coordinator_address)")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-process JAX coordinator (host:port); "
                        "with --num_processes/--process_id (or the "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID env vars) this is the "
                        "`accelerate launch` equivalent "
                        "(parallel/distributed.py)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", default=None,
                   help="'latest' or a checkpoint path (the reference "
                        "never implemented this; we do)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--with_period_column_separation", action="store_true")
    p.add_argument("--sample_times", type=int, default=3)
    p.add_argument("--column_ratio", type=float, default=0.1)
    p.add_argument("--with_no_overlap_first", action="store_true",
                   default=True)
    p.add_argument("--with_finetune_mask", action="store_true")
    p.add_argument("--with_freeze_unet", action="store_true",
                   help="enable the reference's hard-coded block-"
                        "separation mask dictionaries "
                        "(train_unziplora.py:1582-1599)")
    p.add_argument("--class_data_dir", default=None,
                   help="content prior-preservation image dir")
    p.add_argument("--class_prompt", default=None)
    p.add_argument("--prior_loss_weight", type=float, default=0.0)
    p.add_argument("--class_data_dir_2", default=None,
                   help="style prior-preservation image dir")
    p.add_argument("--class_prompt_2", default=None)
    p.add_argument("--prior_loss_weight_2", type=float, default=0.0)
    p.add_argument("--with_prior_preservation", action="store_true",
                   help="auto-generate missing class images with the base "
                        "SDXL pipeline before training (reference "
                        "train_unziplora.py:1166-1227)")
    p.add_argument("--num_class_images", type=int, default=100,
                   help="minimum class images per prior dir; the shortfall "
                        "is generated from --class_prompt[_2]")
    p.add_argument("--sample_batch_size", type=int, default=4,
                   help="batch size for class-image generation")
    p.add_argument("--prior_generation_steps", type=int, default=25,
                   help="denoise steps for generated class images (the "
                        "reference uses the pipeline default)")
    p.add_argument("--validation_prompt", default=None)
    p.add_argument("--validation_prompt_content", default=None)
    p.add_argument("--validation_prompt_style", default=None)
    p.add_argument("--validation_content", default=None,
                   help="reference gate: validation runs when both "
                        "--validation_content and --validation_style are "
                        "set (train_unziplora.py:2263-2265); when "
                        "--validation_prompt is unset it becomes "
                        "'{content} {style}' (:2518)")
    p.add_argument("--validation_style", default=None)
    p.add_argument("--validation_epochs", type=int, default=200,
                   help="generate both/content/style validation images "
                        "every N steps (reference "
                        "train_unziplora.py:2263-2340)")
    p.add_argument("--validation_steps", type=int, default=8,
                   help="denoise steps for validation images")
    p.add_argument("--mixed_precision", default="bf16",
                   choices=["no", "bf16", "fp16"],
                   help="'no' = fp32 base weights (the reference recipe, "
                        "train.sh:65); 'bf16' (default) = bf16 base + "
                        "fp32 LoRA branches — the TPU-native mix; fp16 "
                        "maps to bf16 (the TPU half type)")
    p.add_argument("--report_to", default="jsonl",
                   choices=["jsonl", "tensorboard", "wandb"])
    p.add_argument("--logging_dir", default=None,
                   help="tracker/metrics subdirectory under --output_dir "
                        "(reference train_unziplora.py:673,1127; default: "
                        "log straight into --output_dir)")
    # ---- reference flags accepted as DOCUMENTED NO-OPS so the
    # reference's launch scripts run byte-for-byte. Each is dead or
    # environment boilerplate in the reference itself:
    # --snr_gamma is declared (train_unziplora.py:548) but never used in
    # the loss; --text_encoder_lr/--adam_weight_decay_text_encoder only
    # feed the --train_text_encoder path whose injection raises
    # NotImplementedError (:1424); --gradient_checkpointing maps to
    # remat, which this trainer always enables (hierarchical remat,
    # training/stage1.py); hub/caching/tracker-identity flags have no
    # TPU-side equivalent (no hub, offline trackers).
    p.add_argument("--snr_gamma", type=float, default=None,
                   help="accepted for launch-script parity; the "
                        "reference declares but never applies it")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="accepted for parity; rematerialization is "
                        "always on in this trainer")
    p.add_argument("--text_encoder_lr", type=float, default=None,
                   help="accepted for parity; text-encoder training is "
                        "not part of the published method")
    p.add_argument("--adam_weight_decay_text_encoder", type=float,
                   default=None, help="accepted for parity (see "
                                      "--text_encoder_lr)")
    p.add_argument("--cache_dir", default=None,
                   help="accepted for parity; no hub downloads here")
    p.add_argument("--revision", default=None,
                   help="accepted for parity; no hub downloads here")
    p.add_argument("--push_to_hub", action="store_true",
                   help="accepted for parity; never pushes")
    p.add_argument("--hub_model_id", default=None,
                   help="accepted for parity; never pushes")
    p.add_argument("--hub_token", default=None,
                   help="accepted for parity; never pushes")
    p.add_argument("--dataset_name", default=None,
                   help="accepted for parity; raises like the reference "
                        "(train_unziplora.py:900) when set")
    p.add_argument("--dataset_config_name", default=None,
                   help="accepted for parity (see --dataset_name)")
    p.add_argument("--image_column", default="image",
                   help="accepted for parity (see --dataset_name)")
    p.add_argument("--caption_column", default=None,
                   help="accepted for parity (see --dataset_name)")
    p.add_argument("--feature_prompt", default=None,
                   help="accepted for parity; unused by the reference "
                        "train loop")
    p.add_argument("--entity", default=None,
                   help="accepted for parity; wandb entity (offline "
                        "trackers here)")
    p.add_argument("--tags", default=None,
                   help="accepted for parity; wandb tags")
    p.add_argument("--wandb_dir", default=None,
                   help="accepted for parity; wandb dir")
    p.add_argument("--smoke", action="store_true",
                   help="tiny random models, synthetic data")
    p.add_argument("--smoke_steps", type=int, default=None)
    p.add_argument("--final_inference_check", action="store_true",
                   help="after export, reload the artifacts into a fresh "
                        "UNet and generate once (the reference's final "
                        "integration smoke, train_unziplora.py:2428-2509)")
    # ---- dataset / conditioning parity --------------------------------
    p.add_argument("--pretrained_vae_model_name_or_path", default=None,
                   help="separate VAE checkpoint (the reference loads "
                        "madebyollin/sdxl-vae-fp16-fix here, "
                        "train_unziplora.py:1252-1261)")
    p.add_argument("--center_crop", action="store_true", default=False,
                   help="center-crop instead of random-crop when the "
                        "source aspect != 1 (reference DreamBoothDataset "
                        "transforms, train_unziplora.py:976-983)")
    p.add_argument("--crops_coords_top_left_h", type=int, default=0)
    p.add_argument("--crops_coords_top_left_w", type=int, default=0,
                   help="SDXL micro-conditioning crop coords fed into "
                        "time_ids (reference compute_time_ids, "
                        "train_unziplora.py:1703-1714)")
    p.add_argument("--num_train_epochs", type=int, default=None,
                   help="alternative to --max_train_steps: steps = "
                        "epochs * ceil(num_images / batch) (reference "
                        "train_unziplora.py:1875-1882)")
    p.add_argument("--repeats", type=int, default=1,
                   help="dataset repeat factor (affects steps/epoch "
                        "accounting only here — sampling is uniform)")
    # ---- validation behavior parity ------------------------------------
    p.add_argument("--num_validation_images", type=int, default=1,
                   help="images per mode at each validation "
                        "(reference :455-461)")
    p.add_argument("--with_image_per_validation", action="store_true",
                   default=True,
                   help="generate validation images when "
                        "--validation_prompt is set (reference gate, "
                        "train_unziplora.py:2267)")
    p.add_argument("--with_saved_per_validation", action="store_true",
                   help="also export the stage-1 artifacts at every "
                        "validation boundary (reference :2341-2345)")
    p.add_argument("--with_grad_record", action="store_true",
                   help="dump per-layer LoRA weight+cone records at "
                        "column-selection steps for the offline cone CLI "
                        "(reference :2245-2251, record_utils/cone.py)")
    # ---- accepted-for-compat flags (documented no-ops / dead paths) ----
    p.add_argument("--train_text_encoder", action="store_true",
                   help="DEAD in the reference too: its injection path "
                        "raises NotImplementedError "
                        "(train_unziplora.py:1424-1425); we mirror that")
    p.add_argument("--with_accumulate_cone", action="store_true",
                   help="accepted for compat; the reference's cone "
                        "accumulator is overwritten before use "
                        "(unziplora_linear_layer.py:144-146) — see "
                        "training/stage1.py ColumnSepConfig note")
    p.add_argument("--with_one_shot", action="store_true",
                   help="accepted for compat; unused in the reference "
                        "dataset (train_unziplora.py:886)")
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true",
                   help="no-op: Pallas flash attention is the default "
                        "here (ops/flash_attention.py)")
    p.add_argument("--allow_tf32", action="store_true",
                   help="no-op: TPU matmuls are bf16/f32 by dtype, not "
                        "a global toggle")
    p.add_argument("--dataloader_num_workers", type=int, default=0,
                   help="no-op: data is preprocessed once and stays "
                        "on-device")
    p.add_argument("--local_rank", type=int, default=-1,
                   help="no-op: process identity comes from "
                        "jax.distributed (parallel/distributed.py)")
    p.add_argument("--prior_generation_precision", default=None,
                   choices=[None, "no", "fp32", "fp16", "bf16"],
                   help="class-image generation dtype; fp16 maps to "
                        "bf16 on TPU")
    return p


# The reference's published block-separation recipe
# (train_unziplora.py:1582-1599)
FREEZE_UNET_CONTENT = {"mid_block": ["N_0_A_A"],
                       "up_blocks.": ["1_A_A_A", "0_1_A_A"],
                       "down_blocks.": ["A_A_A_A"]}
FREEZE_UNET_STYLE = {"mid_block": ["N_0_A_A"],
                     "up_blocks.": ["0_0,2_A_A"],
                     "down_blocks.": ["A_A_A_A"]}


def _run_validation(args, bundle, state, res, step, logger=None):
    """In-training validation images for both/content/style forward
    types, saved to disk AND logged to the active trackers (reference
    logs grids to wandb/tensorboard, train_unziplora.py:2263-2340)."""
    import jax as _jax
    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.data.video_io import save_image
    from video_style_transfer_tpu.pipelines.image import generate_images

    val_dir = os.path.join(args.output_dir, "validation")
    os.makedirs(val_dir, exist_ok=True)
    params, lora_state = state.params, state.lora_state
    if _jax.process_count() > 1:
        # called on process 0 only; its jit must not consume global
        # arrays spanning other processes' devices — fetch the
        # replicated state to host and generate locally
        params, lora_state = _jax.tree.map(np.asarray,
                                           (params, lora_state))
    uncond = common.negative_conditioning(bundle, "", height=res, width=res)
    prompts = {
        "both": args.validation_prompt,
        "content": args.validation_prompt_content or args.validation_prompt,
        "style": args.validation_prompt_style or args.validation_prompt,
    }
    for mode, prompt in prompts.items():
        cond = common.make_conditioning(bundle, prompt, prompt, prompt,
                                        height=res, width=res)
        # jit the whole generation: generate_images' contract (one scan
        # program); eager dispatch would pay per-op overhead x num_steps
        # the reference swaps in DPM-Solver++ for validation sampling
        # (train_unziplora.py:2303-2305)
        run = _jax.jit(functools.partial(
            generate_images, unet_cfg=bundle.unet_cfg,
            vae_params=bundle.vae, vae_cfg=bundle.vae_cfg,
            height=res, width=res, num_steps=args.validation_steps,
            mode=mode, sampler="dpm",
            dtype=jnp.float32 if args.smoke else jnp.bfloat16,
            vae_scale_factor=bundle.vae_scale_factor))
        for i in range(max(args.num_validation_images, 1)):
            imgs = run(params, uncond=uncond, cond=cond,
                       key=_jax.random.PRNGKey(i), state=lora_state)
            img = jax.device_get(imgs[0])
            suffix = f"_{i}" if args.num_validation_images > 1 else ""
            save_image(img, os.path.join(
                val_dir, f"step{step}_{mode}{suffix}.png"))
            if logger is not None:
                logger.log_images(step,
                                  {f"validation/{mode}{suffix}": img})


def _ensure_class_images(args, bundle, class_data_dir, class_prompt, res):
    """Top up a prior-preservation class dir to --num_class_images by
    sampling the *base* model (no LoRA), mirroring the reference's
    pre-training generation pass (train_unziplora.py:1166-1227): files are
    named `{index}-{sha1(image)}.jpg` and existing images count toward
    the quota."""
    import hashlib

    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.data.video_io import save_image
    from video_style_transfer_tpu.pipelines.image import generate_images

    os.makedirs(class_data_dir, exist_ok=True)
    cur = len(os.listdir(class_data_dir))
    num_new = args.num_class_images - cur
    if num_new <= 0:
        return 0

    bsz = max(args.sample_batch_size, 1)
    uncond = common.negative_conditioning(bundle, "", height=res, width=res)
    cond = common.make_conditioning(bundle, class_prompt or "",
                                    class_prompt or "", class_prompt or "",
                                    height=res, width=res)
    if bsz > 1:  # conditioning rows must match the sample batch
        from video_style_transfer_tpu.pipelines.sampling import Conditioning
        tile = lambda e: (None if e is None
                          else jnp.tile(e, (bsz,) + (1,) * (e.ndim - 1)))
        uncond, cond = (Conditioning(ctx=tuple(tile(e) for e in c.ctx),
                                     pooled=tile(c.pooled),
                                     time_ids=tile(c.time_ids))
                        for c in (uncond, cond))
    # --prior_generation_precision: fp16 maps to bf16 (the TPU half type)
    prec = args.prior_generation_precision
    pdtype = (jnp.float32 if (args.smoke or prec in ("no", "fp32"))
              else jnp.bfloat16)
    run = jax.jit(functools.partial(
        generate_images, unet_cfg=bundle.unet_cfg,
        vae_params=bundle.vae, vae_cfg=bundle.vae_cfg,
        height=res, width=res, batch=bsz,
        num_steps=args.prior_generation_steps, mode="base",
        dtype=pdtype,
        vae_scale_factor=bundle.vae_scale_factor))
    made = 0
    while made < num_new:
        imgs = jax.device_get(run(bundle.unet, uncond=uncond, cond=cond,
                                  key=jax.random.PRNGKey(cur + made)))
        for img in imgs[:num_new - made]:
            digest = hashlib.sha1(img.tobytes()).hexdigest()
            save_image(img, os.path.join(
                class_data_dir, f"{cur + made}-{digest}.jpg"))
            made += 1
    return made


def main(argv=None):
    args = build_parser().parse_args(argv)
    # multi-process init FIRST (before any backend query locks the
    # topology in) — the reference's Accelerator() process-group init
    # (train_unziplora.py:1129-1139); env-var/flag no-op on single host
    from video_style_transfer_tpu.parallel import distributed as dist
    dist.init_distributed(args.coordinator_address, args.num_processes,
                          args.process_id)
    is_main = dist.is_main_process()
    if args.train_text_encoder:
        # the reference's own injection path raises too
        # (train_unziplora.py:1424-1425) — text-encoder LoRA is not part
        # of the published method
        raise NotImplementedError(
            "--train_text_encoder is not implemented (the reference "
            "raises NotImplementedError here as well)")
    if args.dataset_name is not None:
        # the reference's dataset-hub path raises too
        # (train_unziplora.py:897-900)
        raise NotImplementedError(
            "--dataset_name is not implemented (the reference raises "
            "NotImplementedError here as well); use --instance_data_dir")
    if args.use_8bit_adam:
        args.optimizer = "adamw8bit"
    if not args.prodigy_decouple or not args.prodigy_use_bias_correction:
        print("warning: optax prodigy is always decoupled and "
              "bias-corrected; --prodigy_decouple/"
              "--prodigy_use_bias_correction False are ignored")
    if (args.validation_prompt is None and args.validation_content
            and args.validation_style):
        # reference composes the prompt from the two halves (:2518)
        args.validation_prompt = (f"{args.validation_content} "
                                  f"{args.validation_style}")
    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.data.video import (
        extract_frames, load_image_dir)
    common.enable_compile_cache(args.compilation_cache_dir)
    from video_style_transfer_tpu.lora.surgery import (
        insert_unziplora, layer_assignments)
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage1
    from video_style_transfer_tpu.utils import checkpoint as ckpt
    from video_style_transfer_tpu.utils.observability import (
        MetricsLogger, StepTimer)

    os.makedirs(args.output_dir, exist_ok=True)

    # ---- device mesh: batch rows sharded over 'data' -------------------
    # (the reference's ONLY parallelism is accelerate-launch DDP,
    # SURVEY.md §2.3; `--data_parallel N` is the one-command equivalent)
    dp = args.data_parallel
    if dp == 0:
        # launched multi-process without an explicit mesh size: use
        # every device, like accelerate launch uses every process
        dp = jax.device_count() if jax.process_count() > 1 else 1
    mesh = None
    if dp > 1:
        from video_style_transfer_tpu.parallel.mesh import create_mesh
        ndev = jax.device_count()
        if dp > ndev:
            raise SystemExit(f"--data_parallel {dp} needs {dp} devices; "
                             f"{ndev} available")
        if jax.process_count() > 1 and dp != ndev:
            raise SystemExit(
                f"multi-process runs must use every device: "
                f"--data_parallel {dp} != {ndev} global devices (a "
                f"device subset would leave some processes without "
                f"mesh membership)")
        mesh = create_mesh(jax.devices()[:dp], frame=1)
        # establish the cross-process collective context NOW, while the
        # processes are skew-free: the first collective performs the
        # Gloo/ICI rendezvous under a ~30 s deadline, and deferring it
        # to the first train step puts a multi-minute compile (whose
        # duration can differ per process) inside that window —
        # observed as "Gloo context initialization failed:
        # DEADLINE_EXCEEDED" on the 2-process CPU test
        dist.barrier("mesh_ready")
        if is_main:
            print(f"data-parallel training: mesh {dict(mesh.shape)}, "
                  f"{jax.process_count()} process(es)")

    bundle = common.load_models(
        args.pretrained_model_name_or_path, smoke=args.smoke, motion=False,
        dtype=jnp.float32 if args.mixed_precision == "no" else jnp.bfloat16,
        vae_path=args.pretrained_vae_model_name_or_path)
    res = args.resolution if not args.smoke else 16
    crop = "center" if args.center_crop else "random"
    time_ids_row = [res, res, args.crops_coords_top_left_h,
                    args.crops_coords_top_left_w, res, res]

    # ---- data: N frames from one video (or an image dir) --------------
    if args.smoke:
        images = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(1), (args.num_instance_frames, res, res, 3),
            minval=-1.0, maxval=1.0))
    elif args.instance_video:
        if args.instance_video_mode == "consecutive":
            from video_style_transfer_tpu.data.video import (
                extract_first_frames)
            images = extract_first_frames(args.instance_video,
                                          args.num_instance_frames, res)
        else:
            images = extract_frames(args.instance_video,
                                    args.num_instance_frames,
                                    resolution=res)
    elif args.instance_data_dir:
        images = load_image_dir(args.instance_data_dir, res, crop=crop,
                                seed=args.seed)
    else:
        raise SystemExit("need --instance_video or --instance_data_dir")

    # posterior moments once; a fresh sample is drawn per step (the
    # reference calls latent_dist.sample() every step,
    # train_unziplora.py:2023)
    moments = common.encode_latent_moments(bundle, images)

    # dual prior preservation (reference train_unziplora.py:2085-2132):
    # class images encoded once; the trainer adds mode-switched forwards
    if args.with_prior_preservation:
        # reference validation (train_unziplora.py:840-848) + pre-training
        # class-image generation with the base pipeline (:1166-1227)
        if not args.class_data_dir:
            raise SystemExit(
                "--with_prior_preservation needs --class_data_dir")
        if args.class_prompt is None:
            raise SystemExit(
                "--with_prior_preservation needs --class_prompt")
        # process 0 generates (local single-device compute); everyone
        # else waits at the barrier, then all processes load the same
        # files (reference generates under main_process_first,
        # train_unziplora.py:1166-1227)
        if is_main:
            for ddir, pprompt in ((args.class_data_dir, args.class_prompt),
                                  (args.class_data_dir_2,
                                   args.class_prompt_2)):
                if ddir:
                    n = _ensure_class_images(args, bundle, ddir, pprompt,
                                             res)
                    if n:
                        print(f"generated {n} class images under {ddir}")
        dist.barrier("class_images")
    priors = {}
    for branch, ddir, pprompt in (
            ("content", args.class_data_dir, args.class_prompt),
            ("style", args.class_data_dir_2, args.class_prompt_2)):
        if not ddir:
            continue
        cls_imgs = load_image_dir(ddir, res, crop=crop, seed=args.seed)
        if args.with_prior_preservation:
            # the dataset caps usage at --num_class_images
            # (train_unziplora.py:956-961)
            cls_imgs = cls_imgs[:args.num_class_images]
        cls_emb, cls_pooled = common.encode_prompt(bundle,
                                                   pprompt or "")
        priors[branch] = {
            "moments": common.encode_latent_moments(bundle, cls_imgs),
            "ctx": cls_emb, "pooled": cls_pooled,
            "time_ids": jnp.asarray([time_ids_row], jnp.float32),
        }

    emb, pooled = common.encode_prompt(bundle, args.instance_prompt)
    emb_c, _ = common.encode_prompt(bundle, args.content_forward_prompt)
    emb_s, _ = common.encode_prompt(bundle, args.style_forward_prompt)

    # ---- model surgery + trainer --------------------------------------
    params, lora_state = insert_unziplora(
        bundle.unet, jax.random.PRNGKey(args.seed), rank=args.rank)

    mask_c = FREEZE_UNET_CONTENT if args.with_freeze_unet else {}
    mask_s = FREEZE_UNET_STYLE if args.with_freeze_unet else {}
    assignments = layer_assignments(
        params, mask_c, mask_s,
        layers_per_block=bundle.unet_cfg.layers_per_block)

    accum = max(args.gradient_accumulation_steps, 1)
    # reference accounting (train_unziplora.py:1875-1882):
    # num_update_steps_per_epoch = ceil(len(dataloader) / accum), with
    # the dataset repeated --repeats times
    n_items = len(images) * max(args.repeats, 1)
    # global batch = per-device batch * data-parallel size (the
    # reference's DDP consumes train_batch_size rows PER PROCESS, so
    # its dataloader length divides by num_processes too)
    batches_per_epoch = max(-(-n_items // (args.train_batch_size * dp)), 1)
    updates_per_epoch = max(-(-batches_per_epoch // accum), 1)
    if args.num_train_epochs is not None:
        args.max_train_steps = args.num_train_epochs * updates_per_epoch
    max_steps = args.smoke_steps or args.max_train_steps

    if args.scale_lr:
        # reference train_unziplora.py:1525-1543 (num_processes -> the
        # mesh 'data' size: devices are the DDP workers here)
        scale = accum * args.train_batch_size * dp
        args.content_learning_rate *= scale
        args.style_learning_rate *= scale
        args.weight_learning_rate *= scale

    sep = stage1.ColumnSepConfig(
        enabled=args.with_period_column_separation,
        max_steps=max_steps, sample_times=args.sample_times,
        steps_per_epoch=updates_per_epoch,
        column_ratio=args.column_ratio, avoid=args.with_no_overlap_first,
        finetune_mask=args.with_finetune_mask)
    if sep.enabled and updates_per_epoch >= sep.sampled_steps:
        # exact reference arithmetic quirk (train_unziplora.py:
        # 2146-2171): with pos = step % sampled_steps always <
        # num_update_steps_per_epoch, the selection branch is
        # unreachable — masks/orth loss silently never engage. The
        # reference says nothing; warn so a large dataset (or high
        # --repeats) doesn't quietly disable the requested separation.
        print(f"WARNING: column separation will never select — "
              f"updates/epoch ({updates_per_epoch}) >= sampled_steps "
              f"({sep.sampled_steps} = ceil(max_steps/sample_times)). "
              f"Raise --max_train_steps or lower --sample_times/"
              f"--repeats/dataset size (same arithmetic as the "
              f"reference state machine).")

    opt = stage1.make_optimizer(
        params, lr_content=args.content_learning_rate,
        lr_style=args.style_learning_rate,
        lr_merger=args.weight_learning_rate,
        weight_decay=args.adam_weight_decay, b1=args.adam_beta1,
        b2=args.adam_beta2, eps=args.adam_epsilon,
        max_grad_norm=args.max_grad_norm, total_steps=max_steps,
        warmup=args.lr_warmup_steps, schedule=args.lr_scheduler,
        num_cycles=args.lr_num_cycles, power=args.lr_power,
        optimizer=args.optimizer, prodigy_beta3=args.prodigy_beta3,
        prodigy_safeguard_warmup=args.prodigy_safeguard_warmup)

    sched = make_schedule()
    step_fn = jax.jit(stage1.make_train_step(
        bundle.unet_cfg, sched, opt, sep_cfg=sep, assignments=assignments,
        mask=stage1.trainable_mask(params),
        similarity_lambda=args.similarity_lambda,
        prior_weight=args.prior_loss_weight,
        prior_weight_2=args.prior_loss_weight_2, remat=not args.smoke,
        grad_accum=accum))

    state = stage1.init_state(params, lora_state, opt)

    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    if args.resume_from_checkpoint:
        path = (ckpt.latest_checkpoint(ckpt_dir)
                if args.resume_from_checkpoint == "latest"
                else args.resume_from_checkpoint)
        if path:
            state = ckpt.restore_checkpoint(path, state)
            if is_main:
                print(f"resumed from {path} at step {int(state.step)}")

    if mesh is not None:
        from video_style_transfer_tpu.parallel.mesh import replicate
        if jax.process_count() > 1:
            # a restored checkpoint's leaves are COMMITTED to local
            # devices; device_put from there to a global sharding is a
            # cross-host transfer (unsupported on CPU, DCN-config on
            # TPU). Going through host numpy makes every process
            # contribute its full local value instead.
            state = jax.tree.map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array)
                else x, state)
        state = jax.device_put(state, replicate(mesh))

    log_dir = (os.path.join(args.output_dir, args.logging_dir)
               if args.logging_dir else args.output_dir)
    logger = MetricsLogger(log_dir,
                           use_tensorboard=args.report_to == "tensorboard",
                           use_wandb=args.report_to == "wandb",
                           project=args.name, enabled=is_main)
    timer = StepTimer()
    # with accumulation, one optimizer step consumes accum micro-batches
    # of --train_batch_size (x data_parallel) rows each; leaves are
    # built flat then reshaped to a leading (accum,) axis the scanned
    # step consumes
    b = args.train_batch_size * dp * accum

    n = moments[0].shape[0]
    start = int(state.step)
    # fold the resume step into the key stream: a fresh PRNGKey(seed)
    # split per iteration would replay the exact pre-checkpoint
    # noise/timestep/batch draws after a resume
    rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), start)
    last_log_step = start
    for step in range(start, max_steps):
        rng, key, bkey, pbkey, lkey = jax.random.split(rng, 5)
        idx = jax.random.randint(bkey, (b,), 0, n)
        batch = {
            "latents": common.sample_scaled_latents(bundle, moments,
                                                    idx, lkey),
            "ctx": jnp.repeat(emb, b, axis=0),
            "ctx_content": jnp.repeat(emb_c, b, axis=0),
            "ctx_style": jnp.repeat(emb_s, b, axis=0),
            "pooled": jnp.repeat(pooled, b, axis=0),
            "time_ids": jnp.tile(
                jnp.asarray([time_ids_row], jnp.float32), (b, 1)),
        }
        for bi, (branch, prior) in enumerate(priors.items()):
            pn = prior["moments"][0].shape[0]
            # independent draw per branch (reusing bkey would pick the
            # SAME indices as the instance batch whenever pn == n, and
            # identical class batches for both branches)
            pidx = jax.random.randint(jax.random.fold_in(pbkey, bi),
                                      (b,), 0, pn)
            batch[f"prior_{branch}"] = {
                "latents": common.sample_scaled_latents(
                    bundle, prior["moments"], pidx,
                    jax.random.fold_in(lkey, bi + 1)),
                "ctx": jnp.repeat(prior["ctx"], b, axis=0),
                "pooled": jnp.repeat(prior["pooled"], b, axis=0),
                "time_ids": jnp.tile(prior["time_ids"], (b, 1)),
            }
        if accum > 1:
            batch = jax.tree.map(
                lambda x: x.reshape((accum, args.train_batch_size * dp)
                                    + x.shape[1:]), batch)
        if mesh is None:
            state, metrics = step_fn(state, batch, key)
        else:
            # shard the (identically-built-everywhere) host batch over
            # 'data' and step inside the mesh context (trace-time mesh
            # dispatch for the rowsharded Pallas kernels)
            from jax.sharding import PartitionSpec as P

            from video_style_transfer_tpu.parallel.mesh import (
                shard_batch_tree)
            lead = (None,) if accum > 1 else ()
            batch = shard_batch_tree(mesh, batch,
                                     lambda k, nd: P(*lead, "data"))
            with mesh:
                state, metrics = step_fn(state, batch, key)
        if step % 10 == 0 or step == max_steps - 1:
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["sec_per_step"] = timer.lap() / max(
                step - last_log_step, 1)
            last_log_step = step
            # per-block LoRA norms + merger means, the reference's
            # per-step wandb scalars (train_unziplora.py:2224-2254)
            from video_style_transfer_tpu.utils.observability import (
                lora_merge_log, lora_norm_log)
            for branch in ("content", "style"):
                scalars.update(lora_norm_log(state.params, branch))
                scalars.update(lora_merge_log(state.params, branch))
            logger.log(step, scalars)
            if is_main:
                print(f"step {step}: loss={scalars['loss']:.4f}")
        if (step + 1) % args.checkpointing_steps == 0:
            ckpt.save_checkpoint_main_process(
                ckpt_dir, state, step + 1,
                total_limit=args.checkpoints_total_limit)
        if (args.validation_prompt and is_main
                and (step + 1) % args.validation_epochs == 0):
            if args.with_image_per_validation:
                _run_validation(args, bundle, state, res, step + 1,
                                logger=logger)
            if args.with_saved_per_validation:
                # export reference-format artifacts at the validation
                # boundary too (reference train_unziplora.py:2341-2345)
                vdir = os.path.join(args.output_dir,
                                    f"validation_save_step{step + 1}")
                os.makedirs(vdir, exist_ok=True)
                ckpt.export_stage1_artifacts(vdir, args.name,
                                             state.params,
                                             state.lora_state)
        if args.with_grad_record and sep.enabled and is_main:
            # at each column-selection step the schedule just refreshed
            # the cone scores in lora_state — dump them for the offline
            # cone CLI (reference grad records, train_unziplora.py:2245)
            sel = (step >= sep.steps_per_epoch
                   and (step - sep.steps_per_epoch) % sep.sampled_steps
                   == 0 and step < sep.sample_times * sep.sampled_steps)
            if sel:
                rec_dir = os.path.join(args.output_dir, "grad_records")
                os.makedirs(rec_dir, exist_ok=True)
                rec = {}
                from video_style_transfer_tpu.lora.surgery import tree_get
                for path in assignments:
                    st = tree_get(state.lora_state, path)
                    name = ".".join(str(x) for x in path)
                    rec[f"{name}.score_content"] = np.asarray(
                        st["score_content"])
                    rec[f"{name}.score_style"] = np.asarray(
                        st["score_style"])
                np.savez(os.path.join(rec_dir, f"step{step + 1}.npz"),
                         **rec)

    # ---- final artifacts (reference format; process 0 writes, like the
    # reference's is_main_process-gated final save,
    # train_unziplora.py:2385) ------------------------------------------
    if not is_main:
        logger.close()
        return state
    paths = ckpt.export_stage1_artifacts(args.output_dir, args.name,
                                         state.params, state.lora_state)
    print("saved artifacts:", paths)

    if args.final_inference_check:
        # reload the exported artifacts into a FRESH base UNet and
        # generate once — the reference's final save/load integration
        # smoke pass (train_unziplora.py:2428-2509)
        from video_style_transfer_tpu.lora import interop
        from video_style_transfer_tpu.pipelines.image import generate_images
        from video_style_transfer_tpu.data.video_io import save_image
        re_params, re_state = interop.import_state_dicts(
            bundle.unet,
            interop.load_safetensors(paths["content"]),
            interop.load_safetensors(paths["style"]),
            interop.load_merger_pth(paths["merger_content"]),
            interop.load_merger_pth(paths["merger_style"]))
        cond = common.make_conditioning(
            bundle, args.validation_prompt or args.instance_prompt,
            height=res, width=res)
        uncond = common.negative_conditioning(bundle, "", height=res,
                                              width=res)
        imgs = generate_images(
            re_params, bundle.unet_cfg, bundle.vae, bundle.vae_cfg, uncond,
            cond, jax.random.PRNGKey(0), height=res, width=res,
            num_steps=args.validation_steps, mode="both", state=re_state,
            dtype=jnp.float32 if args.smoke else jnp.bfloat16,
            vae_scale_factor=bundle.vae_scale_factor)
        out = os.path.join(args.output_dir, "final_check_both.png")
        save_image(jax.device_get(imgs[0]), out)
        print("final reload+inference check OK:", out)

    logger.close()
    return state


if __name__ == "__main__":
    main()
