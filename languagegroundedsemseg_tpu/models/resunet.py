"""ResUNet (MinkUNet) family — the alternate 3-level UNet.

Mirror of reference models/resunet.py:12-253: conv1(ks) @L0 -> block1 @L0 ->
[k2s2 down -> blocks] x3 (L1..L3) -> [k2s2 transpose up -> concat -> blocks]
x3 -> final head (1x1 -> 512 -> BN -> relu -> 1x1 classifier). Hyper variant
(:270) additionally upsamples every decoder stage to full resolution via
pooling-transpose (here: chained parent-map broadcasts) and concatenates for
the final head. Default config model 'ResUNet14' (config/config.py:53).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn
import jax.numpy as jnp

from languagegroundedsemseg_tpu.models.blocks import BLOCKS
from languagegroundedsemseg_tpu.models.layers import Norm, SparseConv
from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec
from languagegroundedsemseg_tpu.sparse.graph_host import GraphSpec
from languagegroundedsemseg_tpu.sparse.types import ConvGraph, ParentMap

NUM_LEVELS = 4  # strides 1, 2, 4, 8


def broadcast_from_level(x, graph: ConvGraph, level: int):
    """Upsample level-``level`` features to L0 by chaining the k2s2
    transpose parent maps (the equivalent of ME's MinkowskiPoolingTranspose
    used by the Hyper variant)."""
    from languagegroundedsemseg_tpu.ops.onehot_conv import _abs_parent
    from languagegroundedsemseg_tpu.sparse.types import ChildSumMap

    out = x
    for l in range(level, 0, -1):
        pm = graph.gmaps.get(f"up{l}")
        km = graph.maps.get(f"up{l}")
        cs = None
        if pm is None and km is not None and km.companion:
            # up maps served through the companion down map's ChildSumMap
            # carry no gmap entry of their own, and drop_redundant builds
            # dummy their flat table to 1 wide — the down partition's
            # (parent, kslot) is the broadcast map (fine row -> coarse
            # parent), guards masked out
            cand = graph.gmaps.get(km.companion)
            if isinstance(cand, ChildSumMap):
                cs = cand
        if isinstance(pm, ParentMap):
            parent = pm.parent
            valid = (pm.kslot < pm.num_slots)[:, None]
        elif cs is not None:
            parent = _abs_parent(cs)
            valid = (cs.kslot < cs.num_slots)[:, None]
            parent = jnp.minimum(parent, out.shape[0] - 1)
        else:
            idx = km.idx
            parent = jnp.max(idx, axis=0)
            valid = (parent >= 0)[:, None]
            parent = jnp.maximum(parent, 0)
        out = jnp.where(valid, jnp.take(out, parent, axis=0), 0.0)
    return out


class MinkUNetBase(nn.Module):
    BLOCK: str = "basic"
    PLANES: Tuple[int, ...] = (64, 128, 256, 512, 256, 128, 128)
    LAYERS: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)
    INIT_DIM: int = 64

    out_channels: int = 20
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.02
    norm_type: str = "batch"
    axis_name: Optional[str] = None
    max_batch: int = 32
    dtype: Any = jnp.float32
    hyper: bool = False

    @classmethod
    def graph_spec(cls, conv1_kernel_size: int = 3, d: int = 3) -> GraphSpec:
        # ResUNet uses the first 4 levels of the Res16UNet map set.
        return res16unet_graph_spec(conv1_kernel_size, d)

    def _norm(self, name):
        return Norm(self.norm_type, self.bn_momentum, self.axis_name,
                    self.max_batch, self.dtype, name=name)

    def _blocks(self, n, planes, lvl, name):
        cls = BLOCKS[self.BLOCK]
        return [
            cls(planes=planes, lvl=lvl, map_name=f"l{lvl}.k3",
                norm_type=self.norm_type, bn_momentum=self.bn_momentum,
                axis_name=self.axis_name, max_batch=self.max_batch,
                dtype=self.dtype, name=f"{name}_{i}")
            for i in range(n)
        ]

    @nn.compact
    def __call__(self, feats, graph: ConvGraph, train: bool = False,
                 representation_only: bool = False):
        P, L = self.PLANES, self.LAYERS
        masks = [graph.levels[l].mask() for l in range(NUM_LEVELS)]
        bidx = [graph.levels[l].batch_idx for l in range(NUM_LEVELS)]

        def norm_relu(x, lvl, name):
            return nn.relu(self._norm(name)(x, bidx[lvl], masks[lvl], train))

        out = SparseConv(self.INIT_DIM, f"l0.k{self.conv1_kernel_size}", dtype=self.dtype, name="conv1p1s1")(feats, graph)
        out = norm_relu(out, 0, "bn1")
        for blk in self._blocks(L[0], P[0], 0, "block1"):
            out = blk(out, graph, train)
        skips = [out]  # block1 @ L0

        for e in range(3):
            lvl = e + 1
            out = SparseConv(out.shape[-1], f"down{e}", dtype=self.dtype, name=f"conv{e + 2}p{1 << e}s2")(out, graph)
            out = norm_relu(out, lvl, f"bn{e + 2}")
            for blk in self._blocks(L[e + 1], P[e + 1], lvl, f"block{e + 2}"):
                out = blk(out, graph, train)
            skips.append(out)

        hyper_feats = []
        dec_skips = [skips[2], skips[1], skips[0]]
        for d in range(3):
            lvl = 3 - d
            out = SparseConv(P[4 + d], f"up{lvl}", dtype=self.dtype, name=f"convtr{4 + d}p{1 << lvl}s2")(out, graph)
            out = norm_relu(out, lvl - 1, f"bntr{4 + d}")
            out = jnp.concatenate([out, dec_skips[d]], axis=-1)
            for blk in self._blocks(L[4 + d] if 4 + d < len(L) else 1, P[4 + d] if 4 + d < len(P) else P[-1], lvl - 1, f"block{5 + d}"):
                out = blk(out, graph, train)
            if self.hyper and lvl - 1 > 0:
                hyper_feats.append(broadcast_from_level(out, graph, lvl - 1))

        if self.hyper:
            out = jnp.concatenate(hyper_feats + [out], axis=-1)

        h = SparseConv(512, None, dtype=self.dtype, name="final_conv")(out, graph)
        h = self._norm("final_bn")(h, bidx[0], masks[0], train)
        h = nn.relu(h)
        logits = SparseConv(self.out_channels, None, use_bias=True, dtype=self.dtype, name="final_out")(h, graph)
        return logits, out


class ResUNet14(MinkUNetBase):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)


class ResUNet18(MinkUNetBase):
    LAYERS: Tuple[int, ...] = (2, 2, 2, 2, 2, 2)


class ResUNet18INBN(ResUNet18):
    norm_type: str = "instance_batch"


class ResUNet34(MinkUNetBase):
    LAYERS: Tuple[int, ...] = (3, 4, 6, 3, 2, 2)


class ResUNet50(MinkUNetBase):
    BLOCK: str = "bottleneck"
    LAYERS: Tuple[int, ...] = (3, 4, 6, 3, 2, 2)


class ResUNet101(MinkUNetBase):
    BLOCK: str = "bottleneck"
    LAYERS: Tuple[int, ...] = (3, 4, 23, 3, 2, 2)


class ResUNet14D(ResUNet14):
    PLANES: Tuple[int, ...] = (64, 128, 256, 512, 512, 512, 512)


class ResUNet18D(ResUNet18):
    PLANES: Tuple[int, ...] = (64, 128, 256, 512, 512, 512, 512)


class MinkUNetHyper(MinkUNetBase):
    hyper: bool = True


class MinkUNetHyper14INBN(MinkUNetHyper):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    norm_type: str = "instance_batch"
