#!/usr/bin/env bash
# Language-grounded pretraining: pull voxel features to CLIP text anchors.
# (Reference workflow: scripts/text_representation_train.sh — Res16UNet34D +
# Scannet200Textual2cmDataset + contrastive embedding loss.)
set -euo pipefail

export DATASET=${DATASET:-Scannet200Textual2cmDataset}
export MODEL=${MODEL:-Res16UNet34D}
export BATCH_SIZE=${BATCH_SIZE:-16}
export LOG_DIR=${LOG_DIR:-outputs/pretrain_$(date +%Y%m%d_%H%M%S)}
export SCANNET_PATH=${SCANNET_PATH:-data/scannet200}

python -m languagegroundedsemseg_tpu.cli.main \
    --model "$MODEL" \
    --dataset "$DATASET" \
    --scannet_path "$SCANNET_PATH" \
    --batch_size "$BATCH_SIZE" \
    --train_limit_numpoints 1400000 \
    --use_embedding_loss contrastive \
    --embedding_loss_type contrast \
    --num_negative_samples 3 \
    --balanced_category_sampling true \
    --log_dir "$LOG_DIR" \
    "$@"
