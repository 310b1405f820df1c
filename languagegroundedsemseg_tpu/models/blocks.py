"""Residual blocks over sparse voxel grids.

Mirrors reference models/modules/resnet_block.py (BasicBlock :8-57,
Bottleneck :72-119, NoReluBlock :134-161) and senet_block.py, re-expressed as
flax modules whose convs are bound to named kernel maps in the ConvGraph.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn
import jax.numpy as jnp

from languagegroundedsemseg_tpu.models.layers import Norm, SELayer, SparseConv
from languagegroundedsemseg_tpu.sparse.types import ConvGraph


class BasicBlock(nn.Module):
    """conv3-norm-relu-conv3-norm + residual (+relu unless final_relu=False,
    the NoReluBlock variant used for representation output)."""

    expansion = 1

    planes: int
    lvl: int
    map_name: str
    norm_type: str = "batch"
    bn_momentum: float = 0.02
    axis_name: Optional[str] = None
    max_batch: int = 32
    dtype: Any = jnp.float32
    final_relu: bool = True

    def _norm(self, name):
        return Norm(
            norm_type=self.norm_type,
            momentum=self.bn_momentum,
            axis_name=self.axis_name,
            max_batch=self.max_batch,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: ConvGraph, train: bool) -> jnp.ndarray:
        lvl = graph.levels[self.lvl]
        mask, bidx = lvl.mask(), lvl.batch_idx
        residual = x

        out = SparseConv(self.planes, self.map_name, dtype=self.dtype, name="conv1")(x, graph)
        out = self._norm("norm1")(out, bidx, mask, train)
        out = nn.relu(out)
        out = SparseConv(self.planes, self.map_name, dtype=self.dtype, name="conv2")(out, graph)
        out = self._norm("norm2")(out, bidx, mask, train)

        if x.shape[-1] != self.planes * self.expansion:
            residual = SparseConv(self.planes * self.expansion, None, dtype=self.dtype, name="downsample_conv")(x, graph)
            residual = self._norm("downsample_norm")(residual, bidx, mask, train)

        out = out + residual
        if self.final_relu:
            out = nn.relu(out)
        return out


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 (x4) bottleneck residual block."""

    expansion = 4

    planes: int
    lvl: int
    map_name: str
    norm_type: str = "batch"
    bn_momentum: float = 0.02
    axis_name: Optional[str] = None
    max_batch: int = 32
    dtype: Any = jnp.float32
    final_relu: bool = True

    def _norm(self, name):
        return Norm(
            norm_type=self.norm_type,
            momentum=self.bn_momentum,
            axis_name=self.axis_name,
            max_batch=self.max_batch,
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: ConvGraph, train: bool) -> jnp.ndarray:
        lvl = graph.levels[self.lvl]
        mask, bidx = lvl.mask(), lvl.batch_idx
        residual = x

        out = SparseConv(self.planes, None, dtype=self.dtype, name="conv1")(x, graph)
        out = self._norm("norm1")(out, bidx, mask, train)
        out = nn.relu(out)
        out = SparseConv(self.planes, self.map_name, dtype=self.dtype, name="conv2")(out, graph)
        out = self._norm("norm2")(out, bidx, mask, train)
        out = nn.relu(out)
        out = SparseConv(self.planes * self.expansion, None, dtype=self.dtype, name="conv3")(out, graph)
        out = self._norm("norm3")(out, bidx, mask, train)

        if x.shape[-1] != self.planes * self.expansion:
            residual = SparseConv(self.planes * self.expansion, None, dtype=self.dtype, name="downsample_conv")(x, graph)
            residual = self._norm("downsample_norm")(residual, bidx, mask, train)

        out = out + residual
        if self.final_relu:
            out = nn.relu(out)
        return out


class SEBasicBlock(BasicBlock):
    """BasicBlock + squeeze-excitation gate before the residual add
    (reference models/modules/senet_block.py:26-76)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: ConvGraph, train: bool) -> jnp.ndarray:
        lvl = graph.levels[self.lvl]
        mask, bidx = lvl.mask(), lvl.batch_idx
        residual = x

        out = SparseConv(self.planes, self.map_name, dtype=self.dtype, name="conv1")(x, graph)
        out = self._norm("norm1")(out, bidx, mask, train)
        out = nn.relu(out)
        out = SparseConv(self.planes, self.map_name, dtype=self.dtype, name="conv2")(out, graph)
        out = self._norm("norm2")(out, bidx, mask, train)
        out = SELayer(self.planes, self.reduction, self.max_batch, dtype=self.dtype)(out, bidx, mask)

        if x.shape[-1] != self.planes * self.expansion:
            residual = SparseConv(self.planes * self.expansion, None, dtype=self.dtype, name="downsample_conv")(x, graph)
            residual = self._norm("downsample_norm")(residual, bidx, mask, train)

        out = out + residual
        if self.final_relu:
            out = nn.relu(out)
        return out


BLOCKS = {"basic": BasicBlock, "bottleneck": Bottleneck, "se_basic": SEBasicBlock}
