"""Res16UNet family — the workhorse backbone.

Re-designs reference models/res16unet.py:9-396 for TPU: a 4-level stride-2
sparse encoder + 4-level transpose-conv decoder with skip concatenations. All
convs are gather-GEMM ops bound to kernel maps in a ConvGraph built once per
batch; decoder output coordinate sets equal the encoder levels by
construction (the transpose maps are exact transposes of the down maps), so
skip concats align — the invariant ME maintains via its coordinate manager
(reference models/res16unet.py:237-267).

Architecture (reference forward :196-270):
  conv0(k=conv1_kernel_size) -> bn -> relu                        @ L0
  [conv k2 s2 -> bn -> relu -> blocks] x4                         @ L1..L4
  [convtr k2 s2 -> bn -> relu -> concat(skip) -> blocks] x4       @ L3..L0
  final: pointwise conv to out_channels (bias=True)
Returns (logits, last_block_features).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

from flax import linen as nn
import jax.numpy as jnp

from languagegroundedsemseg_tpu.models.blocks import BLOCKS
from languagegroundedsemseg_tpu.models.layers import Norm, SparseConv
from languagegroundedsemseg_tpu.sparse.graph_host import GraphSpec, MapSpec
from languagegroundedsemseg_tpu.sparse.offsets import ConvKind
from languagegroundedsemseg_tpu.sparse.types import ConvGraph

NUM_LEVELS = 5  # strides 1, 2, 4, 8, 16


def res16unet_graph_spec(conv1_kernel_size: int = 3, d: int = 3) -> GraphSpec:
    """All kernel maps any Res16UNet variant needs.

    Every stride-1 k3 map gets the masked-shift fusion (fuse_width=3,
    ops/msconv.py) plus, when the anchor spread admits a window annotation,
    the selector kernel (ops/onehot_conv.py) that serves any channel width.
    The flat table ships only when neither covers every consumer
    (graph_host._drop_redundant_flat_maps decides per batch).
    Down/up k2s2 maps stay flat + ParentMap (small row counts; the up
    conv's backward routes dX through the companion's flat table).
    """
    maps = {}
    for l in range(NUM_LEVELS):
        maps[f"l{l}.k3"] = MapSpec(l, l, ConvKind(kernel_size=3), fuse_width=3)
    if conv1_kernel_size != 3:
        maps[f"l0.k{conv1_kernel_size}"] = MapSpec(
            0, 0, ConvKind(kernel_size=conv1_kernel_size),
        )
    # keep_flat=False: the only consumers are the down/up convs, which the
    # down map's ChildSumMap partition serves completely (fwd + bwd, both
    # directions — ops/onehot_conv.py) — no pooling layer reads these.
    for l in range(NUM_LEVELS - 1):
        maps[f"down{l}"] = MapSpec(
            l, l + 1, ConvKind(kernel_size=2, stride=2), companion=f"up{l + 1}",
            keep_flat=False,
        )
    for l in range(1, NUM_LEVELS):
        maps[f"up{l}"] = MapSpec(
            l, l - 1, ConvKind(kernel_size=2, stride=2, transpose=True),
            companion=f"down{l - 1}", keep_flat=False,
        )
    return GraphSpec(num_levels=NUM_LEVELS, maps=maps, d=d)


class Res16UNetBase(nn.Module):
    """Configurable Res16UNet. Subclasses pin BLOCK/PLANES/LAYERS like the
    reference variant zoo (models/res16unet.py:273-355)."""

    BLOCK: str = "basic"
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 256, 256, 256)
    LAYERS: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    INIT_DIM: int = 32
    # Param-path prefixes that stay trainable under --classifier_only
    # (reference set_classifier_mode, pl_BaselineTrainer.py:411). Every
    # head module — including the deeper Dv2/Dv3 heads — is named final*.
    classifier_trainable_prefixes = ("final",)

    out_channels: int = 20
    conv1_kernel_size: int = 3
    bn_momentum: float = 0.02
    norm_type: str = "batch"
    axis_name: Optional[str] = None
    max_batch: int = 32
    dtype: Any = jnp.float32
    # CLIP-head behavior (reference models/clip_models.py:95-203): when
    # representation_only is True the final 1x1 classifier is skipped and
    # block8's last relu is stripped (NoReluBlock) so raw features live in
    # the CLIP embedding space.
    strip_final_relu: bool = False
    # jax.checkpoint each residual block: trades ~1 extra forward of FLOPs
    # for O(depth) -> O(1) activation memory per level (larger batches /
    # capacities in training).
    remat: bool = False

    @classmethod
    def graph_spec(cls, conv1_kernel_size: int = 3, d: int = 3) -> GraphSpec:
        return res16unet_graph_spec(conv1_kernel_size, d)

    def _norm(self, name):
        return Norm(
            norm_type=self.norm_type,
            momentum=self.bn_momentum,
            axis_name=self.axis_name,
            max_batch=self.max_batch,
            dtype=self.dtype,
            name=name,
        )

    def _blocks(self, n_blocks, planes, lvl, name, final_relu_last=True):
        block_cls = BLOCKS[self.BLOCK]
        if self.remat:
            block_cls = nn.remat(block_cls, static_argnums=(3,))
        return [
            block_cls(
                planes=planes,
                lvl=lvl,
                map_name=f"l{lvl}.k3",
                norm_type=self.norm_type,
                bn_momentum=self.bn_momentum,
                axis_name=self.axis_name,
                max_batch=self.max_batch,
                dtype=self.dtype,
                final_relu=final_relu_last or (i < n_blocks - 1),
                name=f"{name}_{i}",
            )
            for i in range(n_blocks)
        ]

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,
        graph: ConvGraph,
        train: bool = False,
        representation_only: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self._forward(feats, graph, train, representation_only)

    def _forward(
        self,
        feats: jnp.ndarray,
        graph: ConvGraph,
        train: bool = False,
        representation_only: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Body shared by variant __call__ overrides (must run inside the
        single active compact method)."""
        P, L = self.PLANES, self.LAYERS
        ks0 = self.conv1_kernel_size
        masks = [graph.levels[l].mask() for l in range(NUM_LEVELS)]
        bidx = [graph.levels[l].batch_idx for l in range(NUM_LEVELS)]

        def norm_relu(x, lvl, name):
            x = self._norm(name)(x, bidx[lvl], masks[lvl], train)
            return nn.relu(x)

        # Stem @ L0
        out = SparseConv(self.INIT_DIM, f"l0.k{ks0}", dtype=self.dtype, name="conv0p1s1")(feats, graph)
        out_p1 = norm_relu(out, 0, "bn0")

        # Encoder
        skips = []
        out = out_p1
        for e in range(4):
            lvl = e + 1
            out = SparseConv(out.shape[-1], f"down{e}", dtype=self.dtype, name=f"conv{lvl}p{1 << e}s2")(out, graph)
            out = norm_relu(out, lvl, f"bn{lvl}")
            for blk in self._blocks(L[e], P[e], lvl, f"block{lvl}"):
                out = blk(out, graph, train)
            skips.append(out)
        # skips: [block1@L1, block2@L2, block3@L3, block4@L4]; block4 output
        # is `out` itself.

        # Decoder: convtr up, concat skip, blocks.
        dec_skips = [skips[2], skips[1], skips[0], out_p1]
        for d in range(4):
            lvl = 4 - d  # input level of the transpose conv
            out = SparseConv(P[4 + d], f"up{lvl}", dtype=self.dtype, name=f"convtr{4 + d}p{1 << lvl}s2")(out, graph)
            out = norm_relu(out, lvl - 1, f"bntr{4 + d}")
            out = jnp.concatenate([out, dec_skips[d]], axis=-1)
            last_decoder_stage = d == 3
            strip = last_decoder_stage and (self.strip_final_relu or representation_only)
            for blk in self._blocks(L[4 + d], P[4 + d], lvl - 1, f"block{5 + d}", final_relu_last=not strip):
                out = blk(out, graph, train)

        features = out
        if representation_only:
            return features, features
        logits = self.final_head(features, graph, bidx[0], masks[0], train)
        return logits, features

    def final_head(self, features, graph, bidx0, mask0, train):
        """Default classifier: pointwise conv with bias (reference
        models/res16unet.py:193). CLIP variants override with deeper heads
        (models/clip_models.py:408-437)."""
        return SparseConv(self.out_channels, None, use_bias=True, dtype=self.dtype, name="final")(features, graph)


# ---- Variant zoo (reference models/res16unet.py:273-355) -------------------

def st_res16unet_graph_spec(conv1_kernel_size: int = 3) -> GraphSpec:
    """4D spatio-temporal variant: spatial-cube x temporal-cross block
    kernels, spatial-only striding (reference ConvType
    SPATIAL_HYPERCUBE_TEMPORAL_HYPERCROSS, models/modules/common.py:110-174,
    and STRes16UNet*, models/res16unet.py:356-396)."""
    from languagegroundedsemseg_tpu.sparse.offsets import KernelRegion

    st_block = ConvKind(kernel_size=3, region=KernelRegion.SPATIAL_CUBE_TEMPORAL_CROSS)
    maps = {}
    for l in range(NUM_LEVELS):
        maps[f"l{l}.k3"] = MapSpec(l, l, st_block)
    if conv1_kernel_size != 3:
        maps[f"l0.k{conv1_kernel_size}"] = MapSpec(
            0, 0, ConvKind(kernel_size=(conv1_kernel_size,) * 3 + (1,))
        )
    for l in range(NUM_LEVELS - 1):
        maps[f"down{l}"] = MapSpec(
            l, l + 1, ConvKind(kernel_size=(2, 2, 2, 1), stride=2), companion=f"up{l + 1}"
        )
    for l in range(1, NUM_LEVELS):
        maps[f"up{l}"] = MapSpec(
            l, l - 1, ConvKind(kernel_size=(2, 2, 2, 1), stride=2, transpose=True),
            companion=f"down{l - 1}",
        )
    return GraphSpec(num_levels=NUM_LEVELS, maps=maps, d=4)


class STRes16UNetBase(Res16UNetBase):
    """Spatio-temporal Res16UNet (D=4). The flax module body is identical —
    geometry lives entirely in the 4D ConvGraph."""

    @classmethod
    def graph_spec(cls, conv1_kernel_size: int = 3, d: int = 4) -> GraphSpec:
        return st_res16unet_graph_spec(conv1_kernel_size)


class Res16UNet14(Res16UNetBase):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1, 1, 1, 1, 1)


class Res16UNet18(Res16UNetBase):
    LAYERS: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)


class Res16UNet34(Res16UNetBase):
    LAYERS: Tuple[int, ...] = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet50(Res16UNetBase):
    BLOCK: str = "bottleneck"
    LAYERS: Tuple[int, ...] = (2, 3, 4, 6, 2, 2, 2, 2)


class Res16UNet101(Res16UNetBase):
    BLOCK: str = "bottleneck"
    LAYERS: Tuple[int, ...] = (2, 3, 4, 23, 2, 2, 2, 2)


class Res16UNet14A(Res16UNet14):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet14A2(Res16UNet14A):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B(Res16UNet14):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet14B2(Res16UNet14B):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1, 2, 2, 2, 2)


class Res16UNet14B3(Res16UNet14B):
    LAYERS: Tuple[int, ...] = (2, 2, 2, 2, 1, 1, 1, 1)


class Res16UNet14C(Res16UNet14):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 192, 192, 128, 128)


class Res16UNet14D(Res16UNet14):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 384, 384, 384, 384)


class Res16UNet18A(Res16UNet18):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 96, 96)


class Res16UNet18B(Res16UNet18):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 128, 128)


class Res16UNet18D(Res16UNet18):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 384, 384, 384, 384)


class Res16UNet34A(Res16UNet34):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 64, 64)


class Res16UNet34B(Res16UNet34):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 64, 32)


class Res16UNet34C(Res16UNet34):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 96)


class Res16UNet34C200(Res16UNet34):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 96, 200)


class Res16UNet34C100(Res16UNet34):
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 256, 128, 128, 100)


# ---- Spatio-temporal variants (reference models/res16unet.py:356-396) ------

class STRes16UNet14(STRes16UNetBase, Res16UNet14):
    pass


class STRes16UNet14A(STRes16UNetBase):
    LAYERS: Tuple[int, ...] = (1, 1, 1, 1, 1, 1, 1, 1)
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 96, 96)


class STRes16UNet18(STRes16UNetBase, Res16UNet18):
    pass


class STRes16UNet34(STRes16UNetBase, Res16UNet34):
    pass


class STRes16UNet50(STRes16UNetBase, Res16UNet50):
    pass


class STRes16UNet101(STRes16UNetBase, Res16UNet101):
    pass


class STRes16UNet18A(STRes16UNetBase):
    LAYERS: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2, 2)
    PLANES: Tuple[int, ...] = (32, 64, 128, 256, 128, 128, 96, 96)


class STResTesseract16UNetBase(STRes16UNetBase):
    """Full 4D hypercube kernels (ConvType.HYPERCUBE over D=4)."""

    @classmethod
    def graph_spec(cls, conv1_kernel_size: int = 3, d: int = 4) -> GraphSpec:
        maps = {}
        for l in range(NUM_LEVELS):
            maps[f"l{l}.k3"] = MapSpec(l, l, ConvKind(kernel_size=3))
        if conv1_kernel_size != 3:
            maps[f"l0.k{conv1_kernel_size}"] = MapSpec(0, 0, ConvKind(kernel_size=conv1_kernel_size))
        for l in range(NUM_LEVELS - 1):
            maps[f"down{l}"] = MapSpec(
                l, l + 1, ConvKind(kernel_size=(2, 2, 2, 1), stride=2), companion=f"up{l + 1}"
            )
        for l in range(1, NUM_LEVELS):
            maps[f"up{l}"] = MapSpec(
                l, l - 1, ConvKind(kernel_size=(2, 2, 2, 1), stride=2, transpose=True),
                companion=f"down{l - 1}",
            )
        return GraphSpec(num_levels=NUM_LEVELS, maps=maps, d=4)


class STResTesseract16UNet18A(STResTesseract16UNetBase, STRes16UNet18A):
    pass
