"""Slow-but-obviously-correct numpy oracles for kernel tests.

The analog of the reference's only kernel-correctness test
(lib/ext/pointnet2/pointnet2_test.py gradcheck), generalized: every sparse op
is validated against a python-dict brute-force implementation.
"""

import numpy as np


def make_cloud(rng, n=400, extent=12, batch=2):
    """Random unique voxel coords (N, 4) int32 + features."""
    pts = rng.integers(-extent, extent, size=(n * 2, 3))
    b = rng.integers(0, batch, size=(n * 2, 1))
    coords = np.concatenate([b, pts], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)[:n]
    rng.shuffle(coords, axis=0)
    return coords


def conv_oracle(in_coords, feats, offsets, w, out_coords):
    """out[i] = sum_k W[k] @ feats[at out_coords[i] + offsets[k]]"""
    table = {tuple(c): i for i, c in enumerate(np.asarray(in_coords))}
    out = np.zeros((len(out_coords), w.shape[2]), dtype=np.float64)
    for i, oc in enumerate(np.asarray(out_coords)):
        for k, off in enumerate(np.asarray(offsets)):
            tgt = (oc[0], oc[1] + off[0], oc[2] + off[1], oc[3] + off[2])
            j = table.get(tgt)
            if j is not None:
                out[i] += feats[j] @ w[k]
    return out


def transpose_conv_oracle(in_coords, feats, offsets, w, out_coords):
    """out[f] = sum_k W[k] @ feats[at f - offsets[k]] (transpose map)."""
    table = {tuple(c): i for i, c in enumerate(np.asarray(in_coords))}
    out = np.zeros((len(out_coords), w.shape[2]), dtype=np.float64)
    for i, oc in enumerate(np.asarray(out_coords)):
        for k, off in enumerate(np.asarray(offsets)):
            tgt = (oc[0], oc[1] - off[0], oc[2] - off[1], oc[3] - off[2])
            j = table.get(tgt)
            if j is not None:
                out[i] += feats[j] @ w[k]
    return out
