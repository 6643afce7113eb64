#!/bin/bash
# Stage 1: Q-Former projector pretraining (LAION-CC-SBU BLIP-caption style).
# Reference equivalent: script/pretrain.sh (deepspeed zero2 → here an
# fsdp-sharded pjit step over all local TPU devices).

MODEL_BASE=${MODEL_BASE:-"HuggingFaceH4/zephyr-7b-beta"}
DATA_PATH=${DATA_PATH:-"./playground/data/pretrain/test.json"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"./playground/data/pretrain/images"}
OUTPUT_DIR=${OUTPUT_DIR:-"./checkpoints/vis-zephyr-7b-v1-pretrain"}

python -m vis_zephyr_tpu.train.train \
    --stage 1 \
    --tokenizer-path "$MODEL_BASE" \
    --data-path "$DATA_PATH" \
    --image-folder "$IMAGE_FOLDER" \
    --output-dir "$OUTPUT_DIR" \
    --image-aspect-ratio anyres \
    --mm-grid-pinpoints "[[336, 672], [672, 336], [336, 1008], [1008, 336]]" \
    --model-max-length 2048 \
    --per-device-batch-size 16 \
    --learning-rate 2e-5 \
    --mm-projector-lr 2e-3 \
    --warmup-ratio 0.03 \
    --num-epochs 1 \
    --save-steps 500 \
    --logging-steps 1 \
    --group-by-modality-length true \
    --remat true \
    "$@"
