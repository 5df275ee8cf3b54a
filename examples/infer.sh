#!/usr/bin/env bash
# Image generation (combined / content / style / cross-image) —
# reference infer.sh + infer_single.sh on TPU.
set -euo pipefail

export MODEL_NAME=${MODEL_NAME:-/path/to/stable-diffusion-xl-base-1.0}
export STAGE1_DIR=${STAGE1_DIR:-out/unziplora_horse}

for MODE in both content style; do
  python -m video_style_transfer_tpu.cli.infer \
    --pretrained_model_name_or_path "$MODEL_NAME" \
    --unziplora_name_or_path "$STAGE1_DIR" \
    --unziplora_name horse \
    --prompt "a sbu horse in szn style on a beach" \
    --prompt_content "a sbu horse on a beach" \
    --prompt_style "an image in szn style" \
    --mode "$MODE" \
    --num_inference_steps 50 \
    --seeds 0 1000 111 1234
done
