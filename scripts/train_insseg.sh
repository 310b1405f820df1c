#!/usr/bin/env bash
# Downstream instance segmentation on a pretrained backbone (reference
# downstream/insseg/scripts/train_scannet_slurm.sh).
set -euo pipefail

export LOG_DIR=${LOG_DIR:-outputs/insseg_$(date +%Y%m%d_%H%M%S)}
export SCANNET_PATH=${SCANNET_PATH:-data/scannet_insseg}

python - "$@" <<'PY'
import sys
from languagegroundedsemseg_tpu.config import get_config
from languagegroundedsemseg_tpu.insseg.dataset import ScannetInstance2cmDataset
from languagegroundedsemseg_tpu.insseg.trainer import InssegTrainer

config = get_config(sys.argv[1:])
trainer = InssegTrainer(config, dataset_cls=ScannetInstance2cmDataset)
trainer.fit(max_steps=int(config.max_iter))
print(trainer.validate())
PY
