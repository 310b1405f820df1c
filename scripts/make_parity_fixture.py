"""Regenerate tests/fixtures/parity_scene_34c.npz.

The fixture pins the full Model-Zoo import path (reference-format
state_dict -> train/checkpoints.py converter -> flax Res16UNet34C forward)
against recorded activations of the float64 dense-torch oracle
(tests/test_parity_dense_torch.py) — an independent implementation of the
reference's MinkowskiEngine semantics (kernel_region.hpp slot order,
stride/transpose coordinate rules, eval BatchNorm). The real Model-Zoo
checkpoints (reference README.md:144-149) cannot ship here (zero egress);
this fixture is the committed stand-in that keeps tests/test_parity.py
running un-skipped, and the env-gated real-checkpoint tests remain for
environments that have the released weights.

Usage:  python scripts/make_parity_fixture.py
Writes: tests/fixtures/parity_scene_34c.npz  (~60 KB)

Deterministic: state_dict and scene derive from SEED below; the test
regenerates the state_dict from the same seed instead of committing 38M
parameters.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEED = 20260819
N_POINTS = 600

def main():
    import torch

    from tests.test_parity_dense_torch import (
        C_IN,
        G,
        Oracle,
        make_state_dict,
    )

    rng = np.random.default_rng(SEED)
    coords = np.unique(rng.integers(0, G, size=(N_POINTS, 3)).astype(np.int32), axis=0)
    feats = rng.normal(size=(len(coords), C_IN)).astype(np.float32)
    sd = make_state_dict(rng)

    grid = torch.zeros((1, C_IN, G, G, G), dtype=torch.float64)
    grid[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = torch.as_tensor(
        feats.T, dtype=torch.float64
    )
    out = Oracle(sd, coords).forward(grid)
    logits = out[0, :, coords[:, 0], coords[:, 1], coords[:, 2]].T.numpy()

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                        "parity_scene_34c.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path,
        coords=coords,
        feats=feats,
        logits=logits.astype(np.float32),
        seed=np.int64(SEED),
        n_points=np.int64(N_POINTS),
    )
    print(f"wrote {path}: {len(coords)} voxels, logits {logits.shape}")


if __name__ == "__main__":
    main()
