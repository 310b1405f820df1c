"""Downstream instance segmentation (PointGroup-style) subsystem.

TPU-native re-design of reference downstream/insseg/: Res16UNet + offset
head, semantic + offset losses, vote-shift clustering via radius graph +
label-propagation connected components, and the ScanNet instance-AP
evaluator. Unlike the reference (which duplicates the semseg data/trainer
stack, SURVEY.md §1 L8), this package reuses the core framework.
"""

from languagegroundedsemseg_tpu.insseg.model import InstanceRes16UNet
from languagegroundedsemseg_tpu.insseg.clustering import Clustering
from languagegroundedsemseg_tpu.insseg.evaluation import InstanceEvaluator

__all__ = ["InstanceRes16UNet", "Clustering", "InstanceEvaluator"]
