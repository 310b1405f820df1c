#!/usr/bin/env bash
# Multi-host TPU-pod training (the SLURM/submitit analog of reference
# downstream/insseg/config/default.yaml:148-168).
#
# Run the same command on every host of the pod slice; jax.distributed picks
# up coordinator/topology from the TPU environment (or set
# JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID explicitly).
# Each host feeds its local devices; grads/BN-stats psum over the full mesh.
set -euo pipefail

export LOG_DIR=${LOG_DIR:-outputs/pod_$(date +%Y%m%d_%H%M%S)}

python - "$@" <<'PY'
import sys

import jax

# Initializes the multi-host runtime (no-op on a single host).
try:
    jax.distributed.initialize()
except Exception as e:  # single-host fallback
    print(f"jax.distributed.initialize skipped: {e}")

from languagegroundedsemseg_tpu.cli.main import main

main(sys.argv[1:])
PY
