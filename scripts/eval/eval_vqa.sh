#!/bin/bash
# VCR evaluation. Reference equivalent: script/eval/eval_qa.sh — but the
# 4-process shell fan-out is replaced by in-process batching on the TPU
# mesh; --num-chunks/--chunk-idx remain for multi-host fan-out.

MODEL_PATH=${MODEL_PATH:-"./checkpoints/vis-zephyr-7b-v1-pretrain"}
MODEL_BASE=${MODEL_BASE:-"HuggingFaceH4/zephyr-7b-beta"}
VISION_TOWER=${VISION_TOWER:-"openai/clip-vit-large-patch14-336"}
QUESTION_FILE=${QUESTION_FILE:-"./playground/data/tuning/test.json"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"./playground/data/tuning/images"}
ANSWERS=${ANSWERS:-"./eval_results/vcr_answers.jsonl"}

python -m vis_zephyr_tpu.eval.eval_vqa \
    --model-path "$MODEL_PATH" \
    --model-base "$MODEL_BASE" \
    --vision-tower "$VISION_TOWER" \
    --question-file "$QUESTION_FILE" \
    --image-folder "$IMAGE_FOLDER" \
    --answers-file "$ANSWERS" \
    --visual-prompt-style vcr_qa \
    --batch-size 8 \
    --temperature 0.0 \
    "$@"
