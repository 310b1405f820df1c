"""Offset regression losses for instance segmentation.

Mirror of reference downstream/insseg/lib/pl_Trainer.py:286-298:
- norm loss: mean L1 distance between predicted and GT offsets (voxel
  coords -> meters via voxel_size), over points with a valid instance id;
- direction loss: mean negative cosine between predicted and GT offset
  directions.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def offset_losses(
    pt_offsets: jnp.ndarray,
    coords_xyz: jnp.ndarray,
    centers: jnp.ndarray,
    instance_valid: jnp.ndarray,
    voxel_size: float,
    row_mask=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pt_offsets (N,3) in meters; coords_xyz (N,3) voxel coords; centers
    (N,3) voxel coords of each point's instance center; instance_valid (N,)
    bool-ish. Returns (norm_loss, dir_loss)."""
    gt = (centers - coords_xyz.astype(jnp.float32)) * voxel_size
    valid = instance_valid.astype(jnp.float32)
    if row_mask is not None:
        valid = valid * row_mask.astype(jnp.float32)
    denom = valid.sum() + 1e-6

    diff = pt_offsets.astype(jnp.float32) - gt
    norm_loss = (jnp.abs(diff).sum(-1) * valid).sum() / denom

    gt_dir = gt / (jnp.linalg.norm(gt, axis=-1, keepdims=True) + 1e-8)
    pt_dir = pt_offsets / (jnp.linalg.norm(pt_offsets, axis=-1, keepdims=True) + 1e-8)
    dir_loss = ((-(gt_dir * pt_dir).sum(-1)) * valid).sum() / denom
    return norm_loss, dir_loss
