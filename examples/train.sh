#!/usr/bin/env bash
# Stage-1 UnZipLoRA training — the reference recipe (train.sh) on TPU.
set -euo pipefail

export MODEL_NAME=${MODEL_NAME:-/path/to/stable-diffusion-xl-base-1.0}
export INSTANCE_VIDEO=${INSTANCE_VIDEO:-instance_videos/watercolor_horse.mp4}
export OUTPUT_DIR=${OUTPUT_DIR:-out/unziplora_horse}
export RANK=${RANK:-64}
export STEPS=${STEPS:-600}
export CONTENT_LR=${CONTENT_LR:-5e-5}
export STYLE_LR=${STYLE_LR:-5e-5}
export WEIGHT_LR=${WEIGHT_LR:-5e-3}
export SIMILARITY_LAMBDA=${SIMILARITY_LAMBDA:-0.5}
export SAMPLE_TIMES=${SAMPLE_TIMES:-3}
export COLUMN_RATIO=${COLUMN_RATIO:-0.1}

python -m video_style_transfer_tpu.cli.train_unziplora \
  --pretrained_model_name_or_path "$MODEL_NAME" \
  --instance_video "$INSTANCE_VIDEO" \
  --num_instance_frames 1 \
  --output_dir "$OUTPUT_DIR" \
  --name horse \
  --instance_prompt "a sbu horse in szn style" \
  --content_forward_prompt "a sbu horse" \
  --style_forward_prompt "an image in szn style" \
  --rank "$RANK" \
  --resolution 1024 \
  --train_batch_size 1 \
  --content_learning_rate "$CONTENT_LR" \
  --style_learning_rate "$STYLE_LR" \
  --weight_learning_rate "$WEIGHT_LR" \
  --similarity_lambda "$SIMILARITY_LAMBDA" \
  --lr_scheduler constant \
  --max_train_steps "$STEPS" \
  --checkpointing_steps 500 \
  --seed 0 \
  --with_period_column_separation \
  --sample_times "$SAMPLE_TIMES" \
  --column_ratio "$COLUMN_RATIO" \
  --validation_prompt "a sbu horse in szn style on a beach" \
  --validation_epochs 200
