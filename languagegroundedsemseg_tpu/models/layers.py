"""Flax layers over sparse voxel grids: conv, norms, SE, pooling.

TPU-native equivalents of ME.MinkowskiConvolution / MinkowskiBatchNorm /
MinkowskiInstanceNorm / custom norm layers (reference
models/modules/common.py:17-236, models/layers.py:7-85). BatchNorm masks out
padding rows so statistics match ME's (which never sees padding), and
optionally reduces across the data-parallel mesh axis — the equivalent of
ME.MinkowskiSyncBatchNorm (reference main.py:122-123).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from languagegroundedsemseg_tpu.ops.msconv import masked_shift_conv
from languagegroundedsemseg_tpu.ops.onehot_conv import (
    onehot_window_conv,
    child_sum_conv,
    transpose_child_sum_conv,
)
from languagegroundedsemseg_tpu.ops.spconv import (
    pointwise_conv,
    sparse_conv,
    sparse_conv_parent,
)
from languagegroundedsemseg_tpu.sparse.types import (
    MaskedShiftMap,
    ParentMap,
    ChildSumMap,
)
from languagegroundedsemseg_tpu.ops.segment import batch_broadcast, batch_mean
from languagegroundedsemseg_tpu.sparse.types import ConvGraph


def _conv_kernel_init(key, shape, dtype=jnp.float32):
    """He-normal with fan_in = kernel_volume * in_channels."""
    if len(shape) == 3:
        fan_in = shape[0] * shape[1]
    else:
        fan_in = shape[0]
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class SparseConv(nn.Module):
    """Sparse convolution bound to a named kernel map in the ConvGraph.

    ``map_name=None`` means a kernel-size-1 (pointwise) conv, which needs no
    map. Weight layout: (K, Cin, Cout), slot order = kernel map offset order.
    """

    features: int
    map_name: Optional[str] = None
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, graph: ConvGraph) -> jnp.ndarray:
        c_in = x.shape[-1]
        if self.map_name is None:
            w = self.param("kernel", _conv_kernel_init, (c_in, self.features))
            b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
            return pointwise_conv(
                x.astype(self.dtype), w.astype(self.dtype),
                None if b is None else b.astype(self.dtype),
            )
        idx = graph.maps[self.map_name].idx
        k = idx.shape[0]
        w = self.param("kernel", _conv_kernel_init, (k, c_in, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        xd = x.astype(self.dtype)
        wd = w.astype(self.dtype)
        bd = None if b is None else b.astype(self.dtype)
        km = graph.maps[self.map_name]
        gm = graph.gmaps.get(self.map_name) if graph.gmaps else None
        companion_parent = None
        if km.companion:
            cpm = graph.gmaps.get(km.companion)
            if isinstance(cpm, ParentMap):
                companion_parent = (cpm.parent, cpm.kslot)
        if isinstance(gm, ChildSumMap):
            # strided (down) convs: selector kernel when window-annotated,
            # scatter fallback otherwise — never needs the flat table
            return child_sum_conv(xd, wd, gm, bd)
        if gm is None and km.companion:
            # transpose (up) convs ride the companion DOWN map's
            # ChildSumMap: same (parent, kslot) partition, offsets negate
            # elementwise so slot order matches (ops/onehot_conv.py)
            cgm = graph.gmaps.get(km.companion) if graph.gmaps else None
            if isinstance(cgm, ChildSumMap):
                return transpose_child_sum_conv(xd, wd, cgm, bd)
        if isinstance(gm, ParentMap):
            # gather-only backward via the companion down map's flat table
            comp = graph.maps.get(gm.companion) if gm.companion else None
            idx_down = comp.idx if comp is not None and comp.idx.shape[1] > 1 else None
            return sparse_conv_parent(xd, wd, gm, bd, idx_down=idx_down)
        if isinstance(gm, MaskedShiftMap):
            # Path choice by the measured cost model (PERF.md round 3): the
            # fused gather is ROW-count bound (~4.4 ns/row x 8 rows/voxel
            # = ~35 ns/voxel even at c_in=3, and ~2-3x that over the
            # fast-table cliff), while the selector kernel is width-bound
            # (~40 ns/voxel at c=96 and FALLS with narrower channels since
            # the projection GEMM shrinks). Measured per-conv on v5e, the
            # kernel wins or ties at every level/width of the zoo, so it
            # leads whenever the map carries a window annotation; the
            # gather paths remain for unannotated maps and off-TPU.
            paths = [onehot_window_conv, masked_shift_conv]
            for fn in paths:
                out = fn(xd, wd, gm, bd)
                if out is not None:
                    return out
        if idx.shape[1] == 1 and x.shape[0] > 1:
            raise RuntimeError(
                f"conv map '{self.map_name}': every fused path declined "
                f"(cap={x.shape[0]}, c_in={c_in}, c_out={self.features}) "
                "but the flat table was dropped as redundant at build time "
                "(graph_host._drop_redundant_flat_maps). Build the graph "
                "with drop_redundant=False or keep_flat=True for this map.")
        return sparse_conv(
            xd, wd, idx, bd,
            center_slot=km.center_slot,
            mirror_perm=km.mirror_perm,
            companion_parent=companion_parent,
        )


class SparseBatchNorm(nn.Module):
    """Batch norm over *valid* rows only, torch/ME-compatible semantics.

    - normalization uses biased batch variance; running stats use the
      unbiased variance (torch BatchNorm convention);
    - ``running = (1 - momentum) * running + momentum * batch`` with the
      reference's momentum 0.02 (config/config.py:89);
    - if ``axis_name`` is set, (sum, sumsq, count) are psum'd across that
      mesh axis => SyncBatchNorm.
    """

    momentum: float = 0.02
    eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            m = mask.astype(jnp.float32)
            xf = x.astype(jnp.float32)
            cnt = m.sum()
            sx = (xf * m[:, None]).sum(axis=0)
            sxx = (xf * xf * m[:, None]).sum(axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                sx = jax.lax.psum(sx, self.axis_name)
                sxx = jax.lax.psum(sxx, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = sx / cnt
            var = jnp.maximum(sxx / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


class SparseInstanceNorm(nn.Module):
    """Per-batch-item normalization over each sample's valid voxels
    (ME.MinkowskiInstanceNorm, reference models/modules/common.py:21)."""

    eps: float = 1e-5
    max_batch: int = 32
    affine: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, batch_idx, mask, train: bool = True):
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean_b = batch_mean(xf, batch_idx, mask, self.max_batch)
        mean = batch_broadcast(mean_b, batch_idx)
        d = (xf - mean) * mask[:, None].astype(jnp.float32)
        var_b = batch_mean(d * d, batch_idx, mask, self.max_batch)
        var = batch_broadcast(var_b, batch_idx)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            y = y * scale + bias
        return y.astype(self.dtype)


class SparseLayerNorm(nn.Module):
    """Per-batch-item mean-shift + per-row scale norm, the equivalent of the
    reference's custom MinkowskiLayerNorm (models/layers.py:7-46)."""

    eps: float = 1e-5
    max_batch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, batch_idx, mask, train: bool = True):
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean_b = batch_mean(xf, batch_idx, mask, self.max_batch)
        mean = batch_broadcast(mean_b, batch_idx)
        d = xf - mean
        var = (d * d).mean(axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (y * scale + bias).astype(self.dtype)


class SELayer(nn.Module):
    """Squeeze-excitation over sparse rows: global per-sample pooling ->
    bottleneck MLP -> sigmoid gate broadcast back to rows (reference
    models/modules/senet_block.py:9-24)."""

    channels: int
    reduction: int = 16
    max_batch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, batch_idx, mask):
        pooled = batch_mean(x.astype(jnp.float32), batch_idx, mask, self.max_batch)
        h = nn.Dense(self.channels // self.reduction, dtype=self.dtype)(pooled)
        h = nn.relu(h)
        h = nn.Dense(self.channels, dtype=self.dtype)(h)
        gate = nn.sigmoid(h)
        return (x * batch_broadcast(gate, batch_idx)).astype(self.dtype)


class Norm(nn.Module):
    """Norm dispatcher mirroring reference get_norm
    (models/modules/common.py:17-27): 'batch', 'instance', or
    'instance_batch' (instance then batch, common.py:23-25)."""

    norm_type: str = "batch"
    momentum: float = 0.02
    axis_name: Optional[str] = None
    max_batch: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, batch_idx, mask, train: bool):
        if self.norm_type == "batch":
            return SparseBatchNorm(
                momentum=self.momentum, axis_name=self.axis_name, dtype=self.dtype
            )(x, mask, train)
        if self.norm_type == "instance":
            return SparseInstanceNorm(max_batch=self.max_batch, dtype=self.dtype)(
                x, batch_idx, mask, train
            )
        if self.norm_type == "instance_batch":
            y = SparseInstanceNorm(max_batch=self.max_batch, dtype=self.dtype)(
                x, batch_idx, mask, train
            )
            return SparseBatchNorm(
                momentum=self.momentum, axis_name=self.axis_name, dtype=self.dtype
            )(y, mask, train)
        raise ValueError(f"unknown norm type {self.norm_type!r}")


__all__ = [
    "Norm",
    "SparseConv",
    "SparseBatchNorm",
    "SparseInstanceNorm",
    "SparseLayerNorm",
    "SELayer",
]
