#!/bin/bash
# MMBench evaluation. Reference equivalent: script/eval/eval_mmbench.sh.

MODEL_PATH=${MODEL_PATH:-"./checkpoints/vis-zephyr-7b-v1-pretrain"}
MODEL_BASE=${MODEL_BASE:-"HuggingFaceH4/zephyr-7b-beta"}
VISION_TOWER=${VISION_TOWER:-"openai/clip-vit-large-patch14-336"}
QUESTION_FILE=${QUESTION_FILE:-"./playground/data/mmbench_dev.tsv"}
ANSWERS=${ANSWERS:-"./eval_results/mmbench_answers.jsonl"}

python -m vis_zephyr_tpu.eval.eval_mmbench \
    --model-path "$MODEL_PATH" \
    --model-base "$MODEL_BASE" \
    --vision-tower "$VISION_TOWER" \
    --question-file "$QUESTION_FILE" \
    --answers-file "$ANSWERS" \
    --batch-size 8 \
    "$@"
