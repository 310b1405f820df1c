"""Res16UNet + per-voxel offset head for instance segmentation.

Mirror of reference downstream/insseg/insseg_models/insseg_res16unet.py:
197-263: the offset head is 1x1 conv -> norm -> relu -> 1x1 conv to 3 dims,
applied to the last decoder block's features; forward returns
(offsets, logits, features).
"""

from __future__ import annotations

from typing import Any, Tuple

from flax import linen as nn
import jax.numpy as jnp

from languagegroundedsemseg_tpu.models.layers import Norm, SparseConv
from languagegroundedsemseg_tpu.models.res16unet import Res16UNet34C
from languagegroundedsemseg_tpu.sparse.types import ConvGraph


class InstanceRes16UNet(Res16UNet34C):
    """Default insseg backbone (34C); swap PLANES/LAYERS via subclassing as
    with the semseg zoo."""

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        graph: ConvGraph,
        train: bool = False,
        representation_only: bool = False,
    ):
        logits, features = self._forward(feats, graph, train, False)
        lvl0 = graph.levels[0]
        h = SparseConv(features.shape[-1], None, use_bias=True, dtype=self.dtype, name="offsets_pre")(features, graph)
        h = Norm(
            norm_type=self.norm_type,
            momentum=self.bn_momentum,
            axis_name=self.axis_name,
            max_batch=self.max_batch,
            dtype=self.dtype,
            name="bntr_offset",
        )(h, lvl0.batch_idx, lvl0.mask(), train)
        h = nn.relu(h)
        offsets = SparseConv(3, None, use_bias=True, dtype=self.dtype, name="offsets")(h, graph)
        return offsets, logits, features


class InstanceRes16UNet14A(InstanceRes16UNet):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1, 1, 1, 1, 1)
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 96, 96)
