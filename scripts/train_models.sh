#!/usr/bin/env bash
# Supervised training / fine-tuning on ScanNet200 (reference
# scripts/train_models.sh).
set -euo pipefail

export DATASET=${DATASET:-Scannet200Voxelization2cmDataset}
export MODEL=${MODEL:-Res16UNet34C}
export BATCH_SIZE=${BATCH_SIZE:-16}
export LOSS=${LOSS:-cross_entropy}   # cross_entropy | focal | weighted_ce
export WEIGHTS=${WEIGHTS:-None}
export LOG_DIR=${LOG_DIR:-outputs/train_$(date +%Y%m%d_%H%M%S)}
export SCANNET_PATH=${SCANNET_PATH:-data/scannet200}

python -m languagegroundedsemseg_tpu.cli.main \
    --model "$MODEL" \
    --dataset "$DATASET" \
    --scannet_path "$SCANNET_PATH" \
    --batch_size "$BATCH_SIZE" \
    --loss_type "$LOSS" \
    --weights "$WEIGHTS" \
    --balanced_category_sampling true \
    --log_dir "$LOG_DIR" \
    "$@"
