#!/bin/bash
# Stage 2: LoRA finetuning on VCR-style visual-prompt data.
# Reference equivalent: script/finetune.sh (deepspeed zero3 + peft LoRA
# r=128 α=256 → here LoRA adapter leaves trained under fsdp sharding).

MODEL_BASE=${MODEL_BASE:-"HuggingFaceH4/zephyr-7b-beta"}
PRETRAIN_DIR=${PRETRAIN_DIR:-"./checkpoints/vis-zephyr-7b-v1-pretrain"}
DATA_PATH=${DATA_PATH:-"./playground/data/tuning/test.json"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"./playground/data/tuning/images"}
OUTPUT_DIR=${OUTPUT_DIR:-"./checkpoints/vis-zephyr-7b-v1-lora"}

python -m vis_zephyr_tpu.train.train \
    --stage 2 \
    --tokenizer-path "$MODEL_BASE" \
    --pretrain-mm-mlp-adapter "$(ls -d "$PRETRAIN_DIR"/checkpoint-* | sort -V | tail -1)" \
    --lora-r 128 \
    --lora-alpha 256 \
    --data-path "$DATA_PATH" \
    --image-folder "$IMAGE_FOLDER" \
    --output-dir "$OUTPUT_DIR" \
    --image-aspect-ratio anyres \
    --model-max-length 1024 \
    --per-device-batch-size 4 \
    --grad-accum-steps 4 \
    --lora-dropout 0.05 \
    --learning-rate 2e-4 \
    --warmup-ratio 0.03 \
    --num-epochs 1 \
    --save-steps 500 \
    --remat true \
    "$@"
