#!/usr/bin/env bash
# Downstream instance segmentation on a pretrained backbone (reference
# downstream/insseg/scripts/train_scannet_slurm.sh -> ddp_main.py).
# Instance datasets route the CLI into insseg mode.
set -euo pipefail

export LOG_DIR=${LOG_DIR:-outputs/insseg_$(date +%Y%m%d_%H%M%S)}
export SCANNET_PATH=${SCANNET_PATH:-data/scannet_insseg}

python -m languagegroundedsemseg_tpu.cli.main \
  --dataset "${DATASET:-Scannet200Instance2cmDataset}" \
  --model "${MODEL:-Res16UNet34C}" \
  --scannet_path "$SCANNET_PATH" \
  --log_dir "$LOG_DIR" \
  --lr "${LR:-0.02}" \
  --batch_size "${BATCH_SIZE:-4}" \
  --max_iter "${MAX_ITER:-600000}" \
  "$@"
