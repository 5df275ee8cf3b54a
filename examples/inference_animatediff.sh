#!/usr/bin/env bash
# Three-mode video generation — reference inference_animatediff.sh on TPU.
set -euo pipefail

export MODEL_NAME=${MODEL_NAME:-/path/to/stable-diffusion-xl-base-1.0}
export STAGE1_DIR=${STAGE1_DIR:-out/unziplora_biker}
export STAGE2_DIR=${STAGE2_DIR:-out/animatediff_biker}

python -m video_style_transfer_tpu.cli.infer_video \
  --pretrained_model_name_or_path "$MODEL_NAME" \
  --motion_checkpoint "$STAGE2_DIR" \
  --unziplora_name_or_path "$STAGE1_DIR" \
  --unziplora_name horse \
  --prompt "a sbu biker in szn style riding in a park" \
  --modes both content style \
  --num_frames 16 \
  --num_inference_steps 30 \
  --guidance_scale 7.5 \
  --resolution 1024 \
  --seed 42
