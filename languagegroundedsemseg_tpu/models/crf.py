"""Mean-field CRF post-filtering over joint spatial-chromatic space.

TPU-native redesign of reference models/conditional_random_fields.py:119-157
and models/wrapper.py:20-30: the reference hashes voxels into a 6D/7D
(xyz+rgb[+t]) sparse grid and runs learned ME convolutions as the
message-passing step. Here the pairwise term is a kNN graph in the scaled
6D feature space (the standard bilateral-filter approximation): messages are
gaussian-weighted neighbor sums of the current beliefs, mixed by a learned
class-compatibility matrix, iterated a fixed ``meanfield_iterations`` times
inside jit. Same capability (trainable bilateral/trilateral smoothing of the
unaries), hardware-friendly formulation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from languagegroundedsemseg_tpu.ops.points import knn


class MeanFieldCRF(nn.Module):
    num_classes: int
    spatial_sigma: float = 1.0
    chromatic_sigma: float = 12.0
    temporal_sigma: float = 1.0
    iterations: int = 10
    num_neighbors: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unaries, coords_xyz, colors, row_mask, time=None):
        """unaries (N, C) logits; coords_xyz (N, 3) voxel coords; colors
        (N, 3) in [0, 255]; optional time (N,) temporal coordinate (the
        trilateral 7D space, reference conditional_random_fields.py:157);
        -> refined logits (N, C)."""
        n, c = unaries.shape
        cols = [
            coords_xyz.astype(jnp.float32) / self.spatial_sigma,
            colors.astype(jnp.float32) / self.chromatic_sigma,
        ]
        if time is not None:
            cols.append(time.astype(jnp.float32)[:, None] / self.temporal_sigma)
        feat6 = jnp.concatenate(cols, axis=1)
        dist, idx = knn(feat6, feat6, self.num_neighbors + 1, row_mask)
        dist, idx = dist[:, 1:], idx[:, 1:]  # drop self
        w = jnp.exp(-0.5 * dist.astype(jnp.float32) ** 2)
        w = w * jnp.take(row_mask, idx) * row_mask[:, None]

        # learned class compatibility (Potts-initialized)
        compat = self.param(
            "compatibility",
            lambda _k, shape: -(jnp.eye(shape[0]) - 1.0 / shape[0]),
            (c, c),
        )
        unaries = unaries.astype(jnp.float32)

        def body(_i, q_logits):
            q = jax.nn.softmax(q_logits, axis=-1)
            msg = (jnp.take(q, idx, axis=0) * w[..., None]).sum(axis=1)
            pairwise = msg @ compat
            return unaries - pairwise

        out = jax.lax.fori_loop(0, self.iterations, body, unaries)
        return out.astype(self.dtype)


class Wrapper(nn.Module):
    """Stochastic CRF application during training (reference
    models/wrapper.py:20-30 applies the filter with p=0.5 in training)."""

    base: nn.Module
    num_classes: int
    spatial_sigma: float = 1.0
    chromatic_sigma: float = 12.0
    temporal_sigma: float = 1.0
    iterations: int = 10
    use_temporal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, graph, train=False, representation_only=False, apply_crf=True):
        logits, features = self.base(feats, graph, train, representation_only)
        lvl0 = graph.levels[0]
        # Stochastic application: the reference runs the filter always at
        # eval and with p=0.5 during training so the base net stays
        # filter-invariant (models/wrapper.py:24-28). The coin comes from
        # the 'crf' rng collection (the train step provides it).
        if train and apply_crf and self.has_rng("crf"):
            coin = jax.random.bernoulli(self.make_rng("crf"))
        else:
            coin = jnp.bool_(True)
        crf = MeanFieldCRF(
            num_classes=self.num_classes,
            spatial_sigma=self.spatial_sigma,
            chromatic_sigma=self.chromatic_sigma,
            temporal_sigma=self.temporal_sigma,
            iterations=self.iterations,
            dtype=self.dtype,
        )
        coords = lvl0.coords
        if coords is None:
            raise ValueError(
                "CRF wrappers need device-side coords: build batches with "
                "ship_coords=True (the trainer does this automatically when "
                "wrapper_type is set)"
            )
        # coords layout (batch, x, y, z[, t]): 4D spatio-temporal graphs
        # carry the temporal coordinate in the last column
        time = (
            coords[:, 4] if self.use_temporal and coords.shape[1] > 4 else None
        )
        refined = crf(
            logits,
            coords[:, 1:4],
            (feats[:, :3] + 0.5) * 255.0,
            lvl0.mask(),
            time=time,
        )
        if not apply_crf:
            return logits, features
        out = jnp.where(coin, refined.astype(logits.dtype), logits)
        return out, features


class BilateralCRF(Wrapper):
    """Spatial + chromatic (6D) filtering (reference
    models/conditional_random_fields.py:143)."""


class TrilateralCRF(Wrapper):
    """Spatial + chromatic + temporal (7D) filtering (reference :157): on 4D
    spatio-temporal graphs the time column joins the kNN feature space with
    its own sigma; on 3D graphs it degrades to bilateral (as the reference
    does when fed single-frame clouds)."""

    use_temporal: bool = True
