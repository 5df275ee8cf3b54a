#!/usr/bin/env bash
# Stage-2 temporal-LoRA motion training — reference train_animatediff.sh
# recipe on TPU (runs stage 1 first unless SKIP_STAGE1=1).
set -euo pipefail

export MODEL_NAME=${MODEL_NAME:-/path/to/stable-diffusion-xl-base-1.0}
# diffusers MotionAdapter dir/safetensors or a trained motion_modules.pth
# (reference: guoyww/animatediff-motion-adapter-sdxl-beta)
export MOTION_ADAPTER=${MOTION_ADAPTER:-/path/to/animatediff-motion-adapter-sdxl-beta}
export VIDEO_DIR=${VIDEO_DIR:-instance_videos/male_biker}
export STAGE1_DIR=${STAGE1_DIR:-out/unziplora_biker}
export OUTPUT_DIR=${OUTPUT_DIR:-out/animatediff_biker}

if [[ "${SKIP_STAGE1:-0}" != "1" ]]; then
  OUTPUT_DIR="$STAGE1_DIR" bash "$(dirname "$0")/train.sh"
fi

python -m video_style_transfer_tpu.cli.train_animatediff \
  --pretrained_model_name_or_path "$MODEL_NAME" \
  --motion_adapter_path "$MOTION_ADAPTER" \
  --checkpoint_format pth \
  --unziplora_name_or_path "$STAGE1_DIR" \
  --unziplora_name horse \
  --video_dir "$VIDEO_DIR" \
  --prompt "a sbu biker in szn style riding in a park" \
  --output_dir "$OUTPUT_DIR" \
  --num_frames 8 \
  --resolution 1024 \
  --max_train_steps 1000 \
  --learning_rate 2e-5 \
  --lr_warmup_steps 100 \
  --temporal_lora_rank 32 \
  --temporal_lora_alpha 1.0 \
  --lambda_orth 1e-4 \
  --max_grad_norm 0.5
