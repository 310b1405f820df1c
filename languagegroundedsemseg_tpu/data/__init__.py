"""Data layer: voxelization, augmentation, datasets, batching."""

from languagegroundedsemseg_tpu.data.batching import (
    BatchBuilder,
    bucket_capacity,
)
from languagegroundedsemseg_tpu.data.synthetic import synthetic_scene

__all__ = ["BatchBuilder", "bucket_capacity", "synthetic_scene"]
