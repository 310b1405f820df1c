"""PointNet++ set-abstraction / feature-propagation module layer.

TPU-native equivalent of the reference's pointnet2 module wrappers
(reference lib/ext/pointnet2/pointnet2_modules.py:1-518 around the CUDA
ops at _ext_src/src/bindings.cpp:1-24): SA = FPS centroids + ball-query
grouping + shared MLP + max pool; FP = 3-NN inverse-distance interpolation
+ unary MLP. Built on ops/points.py (furthest_point_sample, ball_query,
group_points, three_nn/three_interpolate) with static shapes and padding
masks — usable inside jit/shard_map like every other module here.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from languagegroundedsemseg_tpu.ops.points import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)


class _SharedMLP(nn.Module):
    """Per-point MLP (1x1 convs in the torch original)."""

    channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, dtype=self.dtype, name=f"mlp{i}")(x)
            x = nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """FPS -> ball query -> grouping -> shared MLP -> max pool.

    Input: xyz (N, 3), feats (N, C) or None, valid_mask (N,).
    Output: (new_xyz (npoint, 3), new_feats (npoint, mlp[-1]), new_mask).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        feats: Optional[jnp.ndarray],
        valid_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        idx = furthest_point_sample(xyz, self.npoint, valid_mask)
        new_xyz = gather_points(xyz, idx)
        new_mask = (
            jnp.ones(self.npoint, bool) if valid_mask is None
            else jnp.take(valid_mask, idx).astype(bool)
        )
        nbr = ball_query(new_xyz, xyz, self.radius, self.nsample,
                         ref_mask=valid_mask)  # (npoint, nsample), -1 pad
        has = nbr >= 0
        safe = jnp.maximum(nbr, 0)
        grouped_xyz = group_points(xyz, safe) - new_xyz[:, None, :]
        parts = [grouped_xyz]
        if feats is not None:
            parts.append(group_points(feats, safe))
        g = jnp.concatenate(parts, axis=-1) if self.use_xyz or feats is None \
            else group_points(feats, safe)
        g = _SharedMLP(self.mlp, dtype=self.dtype)(g.astype(self.dtype))
        g = jnp.where(has[..., None], g, -jnp.inf)
        pooled = jnp.max(g, axis=1)
        pooled = jnp.where(
            (has.any(axis=1) & new_mask)[:, None], pooled, 0.0
        )
        return new_xyz, pooled.astype(self.dtype), new_mask


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance interpolation back to the dense set + MLP.

    Input: dense xyz (N, 3) + its (optional) skip feats, sparse xyz
    (M, 3) + feats. Output: (N, mlp[-1]).
    """

    mlp: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz_dense: jnp.ndarray,
        feats_dense: Optional[jnp.ndarray],
        xyz_sparse: jnp.ndarray,
        feats_sparse: jnp.ndarray,
        sparse_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        dist, idx = three_nn(xyz_dense, xyz_sparse, ref_mask=sparse_mask)
        interp = three_interpolate(feats_sparse, idx, dist)
        if feats_dense is not None:
            interp = jnp.concatenate([interp, feats_dense], axis=-1)
        return _SharedMLP(self.mlp, dtype=self.dtype)(interp.astype(self.dtype))
