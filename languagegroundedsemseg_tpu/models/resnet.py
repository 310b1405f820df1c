"""Plain sparse ResNet classifier family.

Mirror of reference models/resnet.py:10-216: conv1 (conv1_kernel_size) ->
bn -> relu -> sum-pool(k2 s2) -> 4 stride-2 residual stages -> pointwise
classifier at stride 32 (OUT_PIXEL_DIST=32). Variants ResNet14/18/34/50/101.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn
import jax.numpy as jnp

from languagegroundedsemseg_tpu.models.blocks import BLOCKS
from languagegroundedsemseg_tpu.models.layers import Norm, SparseConv
from languagegroundedsemseg_tpu.ops.spconv import sparse_sum_pool
from languagegroundedsemseg_tpu.sparse.graph_host import GraphSpec, MapSpec
from languagegroundedsemseg_tpu.sparse.offsets import ConvKind
from languagegroundedsemseg_tpu.sparse.types import ConvGraph

NUM_LEVELS = 6  # strides 1, 2, 4, 8, 16, 32


def resnet_graph_spec(conv1_kernel_size: int = 3, d: int = 3) -> GraphSpec:
    maps = {}
    maps[f"l0.k{conv1_kernel_size}"] = MapSpec(0, 0, ConvKind(conv1_kernel_size))
    maps["down0"] = MapSpec(0, 1, ConvKind(2, stride=2))  # sum pool
    for e in range(4):
        lin, lout = e + 1, e + 2
        maps[f"down_k3_l{lin}"] = MapSpec(lin, lout, ConvKind(3, stride=2))
        maps[f"down_k1_l{lin}"] = MapSpec(lin, lout, ConvKind(1, stride=2))
        maps[f"l{lout}.k3"] = MapSpec(lout, lout, ConvKind(3))
    return GraphSpec(num_levels=NUM_LEVELS, maps=maps, d=d)


class StridedBlock(nn.Module):
    """First block of a ResNet stage: stride-2 conv1 + k1-s2 downsample."""

    planes: int
    lvl_in: int
    block: str = "basic"
    norm_type: str = "batch"
    bn_momentum: float = 0.02
    axis_name: Optional[str] = None
    max_batch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, graph: ConvGraph, train: bool):
        lvl_out = self.lvl_in + 1
        lvl = graph.levels[lvl_out]
        mask, bidx = lvl.mask(), lvl.batch_idx
        exp = BLOCKS[self.block].expansion

        def norm(name):
            return Norm(self.norm_type, self.bn_momentum, self.axis_name,
                        self.max_batch, self.dtype, name=name)

        if self.block == "basic":
            # conv k3 s2 -> conv k3 s1 (+ k1 s2 shortcut)
            out = SparseConv(self.planes, f"down_k3_l{self.lvl_in}", dtype=self.dtype, name="conv1")(x, graph)
            out = norm("norm1")(out, bidx, mask, train)
            out = nn.relu(out)
            out = SparseConv(self.planes, f"l{lvl_out}.k3", dtype=self.dtype, name="conv2")(out, graph)
            out = norm("norm2")(out, bidx, mask, train)
        else:
            # bottleneck: k1 -> k3 s2 -> k1 (x expansion)
            out = SparseConv(self.planes, None, dtype=self.dtype, name="conv1")(x, graph)
            in_lvl = graph.levels[self.lvl_in]
            out = norm("norm1")(out, in_lvl.batch_idx, in_lvl.mask(), train)
            out = nn.relu(out)
            out = SparseConv(self.planes, f"down_k3_l{self.lvl_in}", dtype=self.dtype, name="conv2")(out, graph)
            out = norm("norm2")(out, bidx, mask, train)
            out = nn.relu(out)
            out = SparseConv(self.planes * exp, None, dtype=self.dtype, name="conv3")(out, graph)
            out = norm("norm3")(out, bidx, mask, train)

        residual = SparseConv(self.planes * exp, f"down_k1_l{self.lvl_in}", dtype=self.dtype, name="downsample_conv")(x, graph)
        residual = norm("downsample_norm")(residual, bidx, mask, train)
        return nn.relu(out + residual)


class ResNetBase(nn.Module):
    BLOCK: str = "basic"
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1)
    PLANES: Tuple[int, ...] = (64, 128, 256, 512)
    INIT_DIM: int = 64

    out_channels: int = 20
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.02
    norm_type: str = "batch"
    axis_name: Optional[str] = None
    max_batch: int = 32
    dtype: Any = jnp.float32

    @classmethod
    def graph_spec(cls, conv1_kernel_size: int = 3, d: int = 3) -> GraphSpec:
        return resnet_graph_spec(conv1_kernel_size, d)

    @nn.compact
    def __call__(self, feats, graph: ConvGraph, train: bool = False,
                 representation_only: bool = False):
        block_cls = BLOCKS[self.BLOCK]
        exp = block_cls.expansion

        lvl0 = graph.levels[0]
        out = SparseConv(self.INIT_DIM, f"l0.k{self.conv1_kernel_size}", dtype=self.dtype, name="conv1")(feats, graph)
        out = Norm(self.norm_type, self.bn_momentum, self.axis_name, self.max_batch,
                   self.dtype, name="bn1")(out, lvl0.batch_idx, lvl0.mask(), train)
        out = nn.relu(out)
        out = sparse_sum_pool(out, graph.maps["down0"].idx)  # L0 -> L1

        for stage in range(4):
            lvl = stage + 2
            out = StridedBlock(
                planes=self.PLANES[stage], lvl_in=stage + 1, block=self.BLOCK,
                norm_type=self.norm_type, bn_momentum=self.bn_momentum,
                axis_name=self.axis_name, max_batch=self.max_batch,
                dtype=self.dtype, name=f"layer{stage + 1}_0",
            )(out, graph, train)
            for b in range(1, self.LAYERS[stage]):
                out = block_cls(
                    planes=self.PLANES[stage], lvl=lvl, map_name=f"l{lvl}.k3",
                    norm_type=self.norm_type, bn_momentum=self.bn_momentum,
                    axis_name=self.axis_name, max_batch=self.max_batch,
                    dtype=self.dtype, name=f"layer{stage + 1}_{b}",
                )(out, graph, train)

        logits = SparseConv(self.out_channels, None, use_bias=True, dtype=self.dtype, name="final")(out, graph)
        return logits, out


class ResNet14(ResNetBase):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1)


class ResNet18(ResNetBase):
    LAYERS: Tuple[int, ...] = (2, 2, 2, 2)


class ResNet34(ResNetBase):
    LAYERS: Tuple[int, ...] = (3, 4, 6, 3)


class ResNet50(ResNetBase):
    BLOCK: str = "bottleneck"
    LAYERS: Tuple[int, ...] = (3, 4, 6, 3)


class ResNet101(ResNetBase):
    BLOCK: str = "bottleneck"
    LAYERS: Tuple[int, ...] = (3, 4, 23, 3)
