"""Evaluation: mIoU/confusion metrics, full-cloud eval, instance AP."""

from languagegroundedsemseg_tpu.eval.miou import (
    fast_hist,
    per_class_iou,
    IoUEvaluator,
)

__all__ = ["fast_hist", "per_class_iou", "IoUEvaluator"]
