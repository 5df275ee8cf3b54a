"""Stage-2 CLI: temporal-LoRA motion fine-tuning on a single video.

Flag surface mirrors the reference (train_animatediff.sh:14-88 /
train_animatediff.py:360-430): frozen SDXL + Stage-1 UnZipLoRA, trainable
temporal LoRA (rank 32) on motion-module projections + motion norms,
eps-MSE + orthogonality loss, AdamW cosine warmup. --smoke for a
weights-free wiring test.
"""
from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pretrained_model_name_or_path", default=None)
    p.add_argument("--unziplora_name_or_path", default=None,
                   help="stage-1 artifact dir (content/style/merger)")
    p.add_argument("--unziplora_name", default="unziplora")
    # explicit per-artifact paths, the reference's spelling
    # (train_animatediff.py:374-389); override the dir+name convention
    p.add_argument("--unziplora_content_path", default=None)
    p.add_argument("--unziplora_style_path", default=None)
    p.add_argument("--unziplora_content_weight_path", default=None)
    p.add_argument("--unziplora_style_weight_path", default=None)
    p.add_argument("--video_dir", default=None)
    p.add_argument("--instance_data_dir", default=None,
                   help="reference spelling for --video_dir")
    p.add_argument("--prompt", default=None)
    p.add_argument("--instance_prompt", default=None,
                   help="reference spelling for --prompt")
    p.add_argument("--compilation_cache_dir", default=None,
                   help="persistent XLA compile-cache dir (default "
                        "$JAX_COMPILATION_CACHE_DIR or ~/.cache/jax); "
                        "warm starts skip the multi-minute SDXL compile")
    p.add_argument("--output_dir", default="out/animatediff")
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=1000)
    p.add_argument("--num_train_epochs", type=int, default=None,
                   help="alternative to --max_train_steps (reference "
                        "train_animatediff.py:175-182)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--lr_scheduler", default="cosine",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine", "cosine_with_restarts",
                            "polynomial"])
    p.add_argument("--lr_warmup_steps", type=int, default=100)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adamw8bit"],
                   help="'adamw8bit' stores Adam moments as blockwise "
                        "int8 (training/adam8bit.py) — the TPU analog of "
                        "bitsandbytes, worthwhile with "
                        "--train_full_motion")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--weight_decay", "--adam_weight_decay",
                   dest="weight_decay", type=float, default=1e-2)
    p.add_argument("--max_grad_norm", type=float, default=0.5)
    p.add_argument("--enable_gradient_checkpointing", action="store_true",
                   help="accepted for compat: rematerialization is "
                        "always on for non-smoke runs (the 8f@1024 step "
                        "does not fit 16 GB HBM without it)")
    p.add_argument("--dataloader_num_workers", type=int, default=0,
                   help="no-op: clips decode via the native C++ "
                        "preprocessor and latents are moment-cached")
    p.add_argument("--temporal_lora_rank", type=int, default=32)
    p.add_argument("--temporal_lora_alpha", type=float, default=1.0)
    p.add_argument("--lambda_orth", type=float, default=1e-4)
    p.add_argument("--cfg_dropout", type=float, default=0.1)
    p.add_argument("--no_latent_cache", action="store_true",
                   help="re-encode every clip per step (reference "
                        "behavior) instead of caching per-frame VAE "
                        "posterior moments")
    p.add_argument("--prediction_type", default="epsilon",
                   choices=["epsilon", "v_prediction"])
    p.add_argument("--unfreeze_mergers", action="store_true")
    p.add_argument("--train_full_motion", action="store_true",
                   help="fine-tune every motion-module weight (the older "
                        "stage-2 variant, unziplora_unet/"
                        "train_animatediff.py) instead of LoRA-only")
    p.add_argument("--mixed_precision", default="bf16",
                   choices=["no", "bf16", "fp16"],
                   help="stage-2 reference default is bf16 "
                        "(train_animatediff.sh:76); fp16 maps to bf16 "
                        "(the TPU half type)")
    p.add_argument("--motion_adapter_path", default=None,
                   help="initial motion weights: diffusers MotionAdapter "
                        "safetensors, a trained motion_modules.pth, or a "
                        "directory containing either (reference "
                        "load_unet_with_motion, animatediff/utils.py:13-63)")
    p.add_argument("--checkpoint_format", default="safetensors",
                   choices=["safetensors", "pth"],
                   help="final motion checkpoint format; pth = the "
                        "reference's torch format (animatediff/utils.py"
                        ":102-145), loadable by its inference driver")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--data_parallel", type=int, default=0,
                   help="shard clips over N devices on the mesh 'data' "
                        "axis (each device computes --train_batch_size "
                        "clips — the reference's accelerate-launch DDP "
                        "semantics). 0 (default): single device, or ALL "
                        "devices when launched multi-process")
    p.add_argument("--frame_parallel", type=int, default=1,
                   help="shard each clip's frame axis over N devices "
                        "(mesh 'frame' axis): spatial layers run "
                        "embarrassingly parallel, the motion modules "
                        "exchange frames via per-batch all-to-alls "
                        "(models/motion.py; audited 2.3 GB/step at the "
                        "production shape, benchmarks/"
                        "collective_volume.py --train). N must divide "
                        "--num_frames. Composes with --data_parallel "
                        "(data*frame devices total)")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-process JAX coordinator (host:port); "
                        "with --num_processes/--process_id (or the "
                        "JAX_COORDINATOR_ADDRESS/... env vars) this is "
                        "the `accelerate launch` equivalent")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--name", default="animatediff-stage2",
                   help="tracker run/project name (reference "
                        "train_animatediff.py:203,388)")
    p.add_argument("--report_to", default="jsonl",
                   choices=["jsonl", "tensorboard", "wandb"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--smoke_steps", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # multi-process init FIRST (before any backend query) — the
    # reference's Accelerator() process-group init
    # (train_animatediff.py:53-56); env-var/flag no-op on single host
    from video_style_transfer_tpu.parallel import distributed as dist
    dist.init_distributed(args.coordinator_address, args.num_processes,
                          args.process_id)
    is_main = dist.is_main_process()
    args.prompt = args.prompt or args.instance_prompt
    if not args.prompt:
        raise SystemExit("need --prompt (or --instance_prompt)")
    args.video_dir = args.video_dir or args.instance_data_dir
    from video_style_transfer_tpu.cli import common
    from video_style_transfer_tpu.data.video import VideoClipDataset
    common.enable_compile_cache(args.compilation_cache_dir)
    from video_style_transfer_tpu.lora import interop
    from video_style_transfer_tpu.lora.surgery import (
        insert_temporal_lora, insert_unziplora, spatial_pairs)
    from video_style_transfer_tpu.schedulers.ddpm import make_schedule
    from video_style_transfer_tpu.training import stage2
    from video_style_transfer_tpu.utils import checkpoint as ckpt
    from video_style_transfer_tpu.utils.observability import (
        MetricsLogger, StepTimer)

    os.makedirs(args.output_dir, exist_ok=True)

    res = args.resolution if not args.smoke else 16
    f = args.num_frames if not args.smoke else 4

    # ---- device mesh: clips over 'data', frames over 'frame' -----------
    dp, fp = args.data_parallel, max(args.frame_parallel, 1)
    if dp == 0:
        dp = (jax.device_count() // fp
              if jax.process_count() > 1 else 1)
    mesh = None
    if dp * fp > 1:
        from video_style_transfer_tpu.parallel.mesh import create_mesh
        ndev = jax.device_count()
        if dp * fp > ndev:
            raise SystemExit(f"--data_parallel {dp} x --frame_parallel "
                             f"{fp} needs {dp * fp} devices; {ndev} "
                             f"available")
        if jax.process_count() > 1 and dp * fp != ndev:
            raise SystemExit(
                f"multi-process runs must use every device: "
                f"{dp}x{fp} != {ndev} global devices")
        if f % fp:
            raise SystemExit(f"--frame_parallel {fp} must divide the "
                             f"frame count {f}")
        mesh = create_mesh(jax.devices()[:dp * fp], data=dp, frame=fp)
        # first collective NOW, while processes are skew-free — the
        # Gloo/ICI rendezvous has a ~30 s deadline that a per-process
        # compile-time difference would blow (see train_unziplora.py)
        dist.barrier("mesh_ready")
        if is_main:
            print(f"mesh training: {dict(mesh.shape)}, "
                  f"{jax.process_count()} process(es)")

    bundle = common.load_models(
        args.pretrained_model_name_or_path, smoke=args.smoke, motion=True,
        dtype=jnp.float32 if args.mixed_precision == "no" else jnp.bfloat16)

    # ---- stage-1 LoRA: load trained artifacts or random (smoke) --------
    explicit = args.unziplora_content_path and args.unziplora_style_path
    if args.unziplora_name_or_path or explicit:
        base = args.unziplora_name_or_path or ""
        name = args.unziplora_name

        def _p(flag, default):
            return flag if flag else os.path.join(base, default)

        cdir = _p(args.unziplora_content_path, f"{name}_content")
        sdir = _p(args.unziplora_style_path, f"{name}_style")
        content_sd = interop.load_safetensors(os.path.join(
            cdir, "pytorch_lora_weights.safetensors"))
        style_sd = interop.load_safetensors(os.path.join(
            sdir, "pytorch_lora_weights.safetensors"))
        merger_c = interop.load_merger_pth(_p(
            args.unziplora_content_weight_path,
            f"{name}_merger_content.pth"))
        merger_s = interop.load_merger_pth(_p(
            args.unziplora_style_weight_path,
            f"{name}_merger_style.pth"))
        params, lora_state = interop.import_state_dicts(
            bundle.unet, content_sd, style_sd, merger_c, merger_s)
    else:
        params, lora_state = insert_unziplora(
            bundle.unet, jax.random.PRNGKey(args.seed), rank=4)

    if args.motion_adapter_path:
        from video_style_transfer_tpu.utils.motion_convert import (
            import_motion_state_dict, load_motion_checkpoint)
        params = import_motion_state_dict(
            params, load_motion_checkpoint(args.motion_adapter_path))

    params = insert_temporal_lora(params, jax.random.PRNGKey(args.seed + 1),
                                  rank=args.temporal_lora_rank,
                                  alpha=args.temporal_lora_alpha)
    pairs = spatial_pairs(params)

    # ---- data ----------------------------------------------------------
    ds = None
    if args.video_dir:
        try:
            ds = VideoClipDataset(args.video_dir, num_frames=f,
                                  resolution=res)
        except (FileNotFoundError, IOError):
            if not args.smoke:
                raise
            # smoke stays weights-and-data-free: fall back to synthetic
            print(f"smoke: no readable videos under {args.video_dir}; "
                  "using synthetic clips")
    # global batch = per-device batch * data-parallel size (every
    # process builds the identical global batch from the step seed and
    # contributes its local shards)
    b_global = args.train_batch_size * dp
    if ds is None:
        def sample_clip(seed):
            return np.asarray(jax.random.uniform(
                jax.random.PRNGKey(seed),
                (b_global, f, res, res, 3),
                minval=-1.0, maxval=1.0)), None
    else:
        def sample_clip(seed):
            return ds.sample_batch_meta(b_global, seed)

    # Per-frame posterior-moment cache: consecutive-start clips overlap
    # almost entirely, so after one pass over the video the per-step
    # encode cost (~0.82 s at 8f@1024^2 fp32) disappears; the latent
    # draw stays stochastic per step. --no_latent_cache restores the
    # reference's re-encode-every-step behavior.
    moment_cache = (None if (args.no_latent_cache or ds is None)
                    else common.LatentMomentCache(bundle))

    emb, pooled = common.encode_prompt(bundle, args.prompt)
    # empty-prompt encodings for the CFG-dropout swap (the reference
    # substitutes these, not zeros, train_animatediff.py:248-254)
    uemb, upooled = common.encode_prompt(bundle, "")

    # ---- trainer -------------------------------------------------------
    accum = max(args.gradient_accumulation_steps, 1)
    if args.num_train_epochs is not None:
        # reference accounting (train_animatediff.py:175-182): one epoch
        # = one pass over the clip-start index; the global batch is
        # per-device batch x data-parallel size
        n_items = len(ds) if ds is not None else 1
        batches = max(-(-n_items // (args.train_batch_size * dp)), 1)
        args.max_train_steps = args.num_train_epochs * max(
            -(-batches // accum), 1)
    max_steps = args.smoke_steps or args.max_train_steps
    mask = stage2.trainable_mask(params,
                                 train_mergers=args.unfreeze_mergers,
                                 train_full_motion=args.train_full_motion)
    opt = stage2.make_optimizer(mask, lr=args.learning_rate,
                                total_steps=max_steps,
                                warmup=args.lr_warmup_steps,
                                weight_decay=args.weight_decay,
                                max_grad_norm=args.max_grad_norm,
                                b1=args.adam_beta1, b2=args.adam_beta2,
                                eps=args.adam_epsilon,
                                schedule=args.lr_scheduler,
                                optimizer=args.optimizer)
    sched = make_schedule()
    step_fn = jax.jit(stage2.make_train_step(
        bundle.unet_cfg, sched, opt, pairs, mask=mask,
        lambda_orth=args.lambda_orth, cfg_dropout=args.cfg_dropout,
        prediction_type=args.prediction_type, lora_state=lora_state,
        remat=not args.smoke, grad_accum=accum))
    state = stage2.init_state(params, opt)

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
            # restored-checkpoint leaves are committed to local devices;
            # host numpy first (see train_unziplora.py)
            state = jax.tree.map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array)
                else x, state)
        state = jax.device_put(state, replicate(mesh))

    logger = MetricsLogger(args.output_dir,
                           use_tensorboard=args.report_to == "tensorboard",
                           use_wandb=args.report_to == "wandb",
                           project=args.name, enabled=is_main)
    timer = StepTimer()
    b = args.train_batch_size * dp

    start = int(state.step)
    # fold the resume step in so a resumed run doesn't replay the
    # pre-checkpoint noise/timestep draws
    rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), start)
    last_log_step = start
    for step in range(start, max_steps):
        rng, key = jax.random.split(rng)
        lat_micro = []
        for mi in range(accum):
            frames, frame_ids = sample_clip(
                args.seed * 1000 + step * accum + mi)
            rng, enc_key = jax.random.split(rng)
            if moment_cache is not None:
                latents = moment_cache.latents(frames, frame_ids, enc_key)
            else:
                # chunked: a single 8-frame fp32 encode at 1024^2 is
                # 18 GB of activations and OOMs the chip
                # (benchmarks/vae_encode.py)
                flat = frames.reshape(-1, res, res, 3)
                latents = jnp.concatenate([
                    common.encode_latents(
                        bundle, flat[k:k + 1],
                        key=jax.random.fold_in(enc_key, k))
                    for k in range(flat.shape[0])])
            lh = latents.shape[1]
            lat_micro.append(latents.reshape(b, f, lh, lh, 4))
        batch = {
            "latents": jnp.stack(lat_micro)
            if accum > 1 else lat_micro[0],
            "ctx": jnp.repeat(emb, b, axis=0),
            "pooled": jnp.repeat(pooled, b, axis=0),
            "uncond_ctx": jnp.repeat(uemb, b, axis=0),
            "uncond_pooled": jnp.repeat(upooled, b, axis=0),
            "time_ids": jnp.tile(
                jnp.asarray([[res, res, 0, 0, res, res]], jnp.float32),
                (b, 1)),
        }
        if accum > 1:
            tile = lambda x: jnp.broadcast_to(x, (accum,) + x.shape)
            for k in ("ctx", "pooled", "uncond_ctx", "uncond_pooled",
                      "time_ids"):
                batch[k] = tile(batch[k])
        if mesh is None:
            state, metrics = step_fn(state, batch, key)
        else:
            # latents (B, F, ...) shard over (data, frame); everything
            # else over data. Trace inside the mesh context so the
            # shard_map motion modules + rowsharded kernels dispatch.
            from jax.sharding import PartitionSpec as P

            from video_style_transfer_tpu.parallel.mesh import (
                shard_batch_tree)
            lead = (None,) if accum > 1 else ()

            def spec_of(k, nd):
                if k == "latents":
                    return P(*lead, "data", "frame")
                return P(*lead, "data")

            batch = shard_batch_tree(mesh, batch, spec_of)
            with mesh:
                state, metrics = step_fn(state, batch, key)
        if step % args.log_every == 0 or step == max_steps - 1:
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["sec_per_step"] = timer.lap() / max(
                step - last_log_step, 1)
            last_log_step = step
            logger.log(step, scalars)
            if is_main:
                print(f"step {step}: loss={scalars['loss']:.4f} "
                      f"mse={scalars['loss_mse']:.4f} "
                      f"orth={scalars['loss_orth']:.6f}")
        if (step + 1) % args.checkpointing_steps == 0:
            ckpt.save_checkpoint_main_process(ckpt_dir, state, step + 1)

    if is_main:
        # process-0-gated final save, like the reference's
        # save_checkpoint on the main process (train_animatediff.py:335)
        out = os.path.join(args.output_dir,
                           f"motion_modules.{args.checkpoint_format}")
        ckpt.export_motion_checkpoint(out, state.params)
        print("saved motion checkpoint:", out)
    logger.close()
    return state


if __name__ == "__main__":
    main()
