#!/usr/bin/env bash
# Multi-chip training launches — the reference's `accelerate launch
# --num_processes N` (train.sh:44) expressed as mesh flags. On a
# single-host v5e-8 ONE command data-parallels the reference recipe
# over all 8 chips (each chip computes --train_batch_size rows; grads
# psum over ICI; checkpoints/metrics/artifacts write once).
set -euo pipefail

export MODEL_NAME=${MODEL_NAME:-/path/to/stable-diffusion-xl-base-1.0}
export INSTANCE_VIDEO=${INSTANCE_VIDEO:-instance_videos/watercolor_horse.mp4}
export OUTPUT_DIR=${OUTPUT_DIR:-out/unziplora_horse}
export DP=${DP:-8}

# ---- stage 1, data-parallel over 8 chips ------------------------------
python -m video_style_transfer_tpu.cli.train_unziplora \
  --pretrained_model_name_or_path "$MODEL_NAME" \
  --instance_video "$INSTANCE_VIDEO" \
  --num_instance_frames 1 \
  --instance_prompt "a sbu horse in szn style" \
  --content_forward_prompt "a sbu horse" \
  --style_forward_prompt "an image in szn style" \
  --output_dir "$OUTPUT_DIR" \
  --rank 64 --resolution 1024 --train_batch_size 1 \
  --data_parallel "$DP" --scale_lr \
  --content_learning_rate 5e-5 --style_learning_rate 5e-5 \
  --weight_learning_rate 5e-3 --similarity_lambda 0.5 \
  --max_train_steps 600 --checkpointing_steps 500 --seed 0 \
  --with_period_column_separation --sample_times 3 --column_ratio 0.1

# ---- stage 2: 2 clips x 4-way frame sharding per step -----------------
python -m video_style_transfer_tpu.cli.train_animatediff \
  --pretrained_model_name_or_path "$MODEL_NAME" \
  --unziplora_name_or_path "$OUTPUT_DIR" \
  --video_dir clips/ --prompt "a sbu horse in szn style" \
  --num_frames 8 --resolution 1024 --train_batch_size 1 \
  --data_parallel 2 --frame_parallel 4 \
  --max_train_steps 1000 --output_dir out/animatediff_horse

# ---- multi-host pods: same commands + the process topology ------------
# (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID;
# the CLIs run jax.distributed.initialize themselves and process 0
# owns every file write)
#
#   python -m video_style_transfer_tpu.cli.train_unziplora ... \
#     --coordinator_address "$HOST0:8476" \
#     --num_processes "$NPROC" --process_id "$PID"
