#!/usr/bin/env bash
# Classifier fine-tuning over a frozen CLIP-pretrained backbone (reference
# scripts/fine_tune_classifier.sh: use_embedding_loss=both, classifier_only).
set -euo pipefail

export DATASET=${DATASET:-Scannet200Textual2cmDataset}
export MODEL=${MODEL:-Res16UNet34D}
export WEIGHTS=${WEIGHTS:?path to the pretrained checkpoint}
export LOG_DIR=${LOG_DIR:-outputs/classifier_$(date +%Y%m%d_%H%M%S)}
export SCANNET_PATH=${SCANNET_PATH:-data/scannet200}

python -m languagegroundedsemseg_tpu.cli.main \
    --model "$MODEL" \
    --dataset "$DATASET" \
    --scannet_path "$SCANNET_PATH" \
    --weights "$WEIGHTS" \
    --use_embedding_loss both \
    --classifier_only true \
    --balanced_category_sampling true \
    --log_dir "$LOG_DIR" \
    "$@"
