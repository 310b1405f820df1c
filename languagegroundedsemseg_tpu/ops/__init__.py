"""TPU compute ops for sparse voxel networks."""

from languagegroundedsemseg_tpu.ops.spconv import sparse_conv, pointwise_conv
from languagegroundedsemseg_tpu.ops.segment import (
    batch_mean,
    batch_max,
    batch_broadcast,
    masked_mean_var,
)

__all__ = [
    "sparse_conv",
    "pointwise_conv",
    "batch_mean",
    "batch_max",
    "batch_broadcast",
    "masked_mean_var",
]
