#!/bin/bash
# Stage 2 visual instruction tuning on VCR — PROJECTOR-ONLY (no LoRA).
# Reference equivalent: script/vit.vcr.sh — freezes the Zephyr backbone
# and CLIP tower, trains only the multimodal projector, warm-started from
# the Stage-1 mm_projector artifact (--pretrain_mm_mlp_adapter), on
# VCR+ViP data at bs 4 × accum 2, LR 2e-5 / projector 2e-3, the
# 672-class pinpoints only, max_len 2048.
#
# Our trainer's stage "1" IS the projector-only freeze recipe (stage "2"
# is the LoRA recipe), so this script is stage 1 + a projector warm start
# + the VCR tuning knobs.

MODEL_BASE=${MODEL_BASE:-"HuggingFaceH4/zephyr-7b-beta"}
DATA_PATH=${DATA_PATH:-"./playground/data/tuning/vcr.json"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"./playground/data/tuning/images"}
PRETRAIN_PROJECTOR=${PRETRAIN_PROJECTOR:-"./checkpoints/vis-zephyr-7b-v1-pretrain"}
OUTPUT_DIR=${OUTPUT_DIR:-"./checkpoints/vis-zephyr-7b-v1-tune-vcr"}

python -m vis_zephyr_tpu.train.train \
    --stage 1 \
    --tokenizer-path "$MODEL_BASE" \
    --pretrain-mm-mlp-adapter "$PRETRAIN_PROJECTOR" \
    --data-path "$DATA_PATH" \
    --image-folder "$IMAGE_FOLDER" \
    --output-dir "$OUTPUT_DIR" \
    --image-aspect-ratio anyres \
    --mm-grid-pinpoints "[[336, 672], [672, 336]]" \
    --model-max-length 2048 \
    --per-device-batch-size 4 \
    --grad-accum-steps 2 \
    --learning-rate 2e-5 \
    --mm-projector-lr 2e-3 \
    --weight-decay 0.0 \
    --warmup-ratio 0.03 \
    --num-epochs 1 \
    --save-steps 24000 \
    --logging-steps 1 \
    --group-by-modality-length false \
    --remat true \
    "$@"
