#!/bin/bash
# Stage 1 projector pretraining ON VCR data (ViP overlays auto-route by
# record id in data/dataset.py). Reference equivalent:
# script/pretrain.vcr.sh — deepspeed zero2, tune_mm_mlp_adapter,
# bs 16/GPU, accum 1, LR 2e-5 / projector 2e-3, cosine warmup 0.03,
# anyres pinpoints incl. 1008-class, max_len 2048, grad ckpt.

MODEL_BASE=${MODEL_BASE:-"HuggingFaceH4/zephyr-7b-beta"}
DATA_PATH=${DATA_PATH:-"./playground/data/pretrain/vcr.json"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"./playground/data/finetune/images"}
OUTPUT_DIR=${OUTPUT_DIR:-"./checkpoints/vis-zephyr-7b-v1-pretrain-vcr"}

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
    --grad-accum-steps 1 \
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
