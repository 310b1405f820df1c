#!/usr/bin/env bash
# Snapshot gate: run before every milestone commit. A commit must never
# capture a tree that fails any of these (round 3 shipped an ImportError
# to the official record — VERDICT.md "What's weak" #1).
#
#   bash scripts/green_gate.sh          # fast: import + entry + dryrun
#   bash scripts/green_gate.sh --full   # also the fast pytest tier
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[gate] import + entry()..."
# JAX_PLATFORMS env is pinned to axon by sitecustomize; only the config
# API switches platforms (entry()'s eager model.init pays an op-by-op
# remote-compile storm on the tunnel otherwise)
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__
fn, args = __graft_entry__.entry()
jax.block_until_ready(jax.jit(fn)(*args))
print("[gate] entry() OK")
EOF

echo "[gate] dryrun_multichip(8)..."
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8); print('[gate] dryrun OK')"

if [[ "${1:-}" == "--full" ]]; then
  echo "[gate] fast pytest tier..."
  python -m pytest tests/ -x -q -m "not slow"
fi
echo "[gate] GREEN"
