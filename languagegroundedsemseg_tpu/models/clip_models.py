"""CLIP-space model variants for language-grounded pretraining.

Mirror of reference models/clip_models.py:
- Res16UNet34CR (:95-188): 34C whose block8 last relu is stripped; under
  representation_only the classifier is skipped and raw features are the
  output (lives in the anchor embedding space).
- Res16UNet34CR_Proj (:192-200): additionally learns a 512 -> PLANES[7]
  projection applied to the *anchor* features.
- Res16UNet34D (:205-215): CLIP-dimensional variant, PLANES[-1]=512.
- Res16UNet34DPaired (:219-319): shared-backbone dual forward for SimSiam.
- Res16UNet34Dv2/Dv3 (:408-437): deeper classifier heads over frozen CLIP
  backbones.
- Res16UNet34GloVe (:10-91): GloVe-dimensional (100) variant of 34C100.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn
import jax.numpy as jnp

from languagegroundedsemseg_tpu.models.blocks import BasicBlock
from languagegroundedsemseg_tpu.models.layers import SparseConv, SparseInstanceNorm
from languagegroundedsemseg_tpu.models.res16unet import (
    Res16UNet34,
    Res16UNet34C,
    Res16UNet34C100,
)
from languagegroundedsemseg_tpu.sparse.types import ConvGraph


class Res16UNet34CR(Res16UNet34C):
    strip_final_relu: bool = True


class Res16UNet34C_P(Res16UNet34C):
    strip_final_relu: bool = True


class Res16UNet34D(Res16UNet34CR):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 256, 256, 512)


class Res16UNet34GloVe(Res16UNet34C100):
    pass


class Res16UNet34CR_Proj(Res16UNet34CR):
    """Projects 512-d anchors to the backbone feature width with a learned
    linear map; call with ``anchors=(C, 512)`` to receive
    ((logits_or_features, features), projected_anchors)."""

    anchor_dim: int = 512

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        graph: ConvGraph,
        train: bool = False,
        representation_only: bool = False,
        anchors: Optional[jnp.ndarray] = None,
    ):
        out = self._forward(feats, graph, train, representation_only)
        if anchors is None:
            return out
        proj = nn.Dense(self.PLANES[7], use_bias=True, dtype=self.dtype, name="projection_layer")(
            anchors.astype(self.dtype)
        )
        return out, proj


class Res16UNet34DPaired(Res16UNet34):
    """SimSiam dual forward with a shared backbone: two (feats, graph) views
    in, two feature fields out (reference :314-319). The backbone is a single
    child module called twice, so both views share parameters."""

    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 256, 256, 512)
    strip_final_relu: bool = True

    def _backbone(self):
        import dataclasses

        kw = {
            f.name: getattr(self, f.name)
            for f in dataclasses.fields(Res16UNet34D)
            if f.name not in ("parent", "name")
        }
        kw["PLANES"] = self.PLANES
        kw["LAYERS"] = self.LAYERS
        return Res16UNet34D(**kw, name="backbone")

    @nn.compact
    def __call__(self, feats, graph, train: bool = False, representation_only: bool = True,
                 feats2=None, graph2=None):
        backbone = self._backbone()
        z1 = backbone(feats, graph, train, representation_only=True)[0]
        if feats2 is None:
            return z1, z1
        z2 = backbone(feats2, graph2, train, representation_only=True)[0]
        return z1, z2


class Res16UNet34Dv2(Res16UNet34D):
    """Deeper frozen-backbone classifier head: 1x1 512 -> 1x1 512 -> IN ->
    relu -> 1x1 C (reference :408-418)."""

    def final_head(self, features, graph, bidx0, mask0, train):
        h = SparseConv(512, None, use_bias=True, dtype=self.dtype, name="final_conv1")(features, graph)
        h = SparseConv(512, None, use_bias=True, dtype=self.dtype, name="final_conv2")(h, graph)
        h = SparseInstanceNorm(max_batch=self.max_batch, dtype=self.dtype, name="final_in")(
            h, bidx0, mask0, train
        )
        h = nn.relu(h)
        return SparseConv(self.out_channels, None, use_bias=True, dtype=self.dtype, name="final_out")(h, graph)


class Res16UNet34Dv3(Res16UNet34D):
    """Even deeper head: residual block (instance norm) + IN + relu + the v2
    stack (reference :422-437)."""

    def final_head(self, features, graph, bidx0, mask0, train):
        h = BasicBlock(
            planes=self.PLANES[7],
            lvl=0,
            map_name="l0.k3",
            norm_type="instance",
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            max_batch=self.max_batch,
            dtype=self.dtype,
            name="final_block",
        )(features, graph, train)
        h = SparseInstanceNorm(max_batch=self.max_batch, dtype=self.dtype, name="final_in0")(
            h, bidx0, mask0, train
        )
        h = nn.relu(h)
        h = SparseConv(512, None, use_bias=True, dtype=self.dtype, name="final_conv1")(h, graph)
        h = SparseConv(512, None, use_bias=True, dtype=self.dtype, name="final_conv2")(h, graph)
        h = SparseInstanceNorm(max_batch=self.max_batch, dtype=self.dtype, name="final_in1")(
            h, bidx0, mask0, train
        )
        h = nn.relu(h)
        return SparseConv(self.out_channels, None, use_bias=True, dtype=self.dtype, name="final_out")(h, graph)
