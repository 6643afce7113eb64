#!/bin/bash
# Interactive chat CLI. Reference equivalent: script/run_cli.sh.

MODEL_PATH=${MODEL_PATH:-"./checkpoints/vis-zephyr-7b-v1-pretrain"}
MODEL_BASE=${MODEL_BASE:-"HuggingFaceH4/zephyr-7b-beta"}
VISION_TOWER=${VISION_TOWER:-"openai/clip-vit-large-patch14-336"}
IMAGE_FILE=${IMAGE_FILE:-"./playground/demo.jpg"}

python -m vis_zephyr_tpu.serve.cli \
    --model-path "$MODEL_PATH" \
    --model-base "$MODEL_BASE" \
    --vision-tower "$VISION_TOWER" \
    --image-file "$IMAGE_FILE" \
    --conv-mode zephyr_v1 \
    --temperature 0.0 \
    --max-new-tokens 512 \
    "$@"
