#!/usr/bin/env bash
# Multi-host training launcher: run this script once per host (or use your
# cluster runner / GKE indexed job to do it). TPU-native replacement for the
# reference's `deepspeed --num_nodes` launch (reference script/pretrain.sh).
#
# Required env per process:
#   VZT_COORDINATOR    host:port of rank 0 (e.g. 10.0.0.2:8476)
#   VZT_NUM_PROCESSES  number of hosts
#   VZT_PROCESS_ID     this host's rank (0-based)
#
# On Cloud TPU pods, jax.distributed can also auto-detect — leave the VZT_*
# vars unset and initialize via `jax.distributed.initialize()` defaults.
set -euo pipefail

: "${VZT_COORDINATOR:?set VZT_COORDINATOR=host:port of rank 0}"
: "${VZT_NUM_PROCESSES:?set VZT_NUM_PROCESSES}"
: "${VZT_PROCESS_ID:?set VZT_PROCESS_ID}"

exec python -m vis_zephyr_tpu.train.train \
  --stage 1 \
  --data-path "${DATA_PATH:?set DATA_PATH}" \
  --image-folder "${IMAGE_FOLDER:?set IMAGE_FOLDER}" \
  --output-dir "${OUTPUT_DIR:-./checkpoints/multihost-run}" \
  --per-device-batch-size "${PER_DEVICE_BATCH:-16}" \
  --mesh-model "${MESH_MODEL:-1}" \
  "$@"
