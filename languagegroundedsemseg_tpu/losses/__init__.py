"""Loss zoo: CE / weighted CE / focal, contrastive-language, SupCon, SimSiam,
head-common-tail balancing. All losses operate on padded (capacity, ...)
arrays with an explicit row validity mask and vectorize the reference's
per-category python loops into single XLA computations.
"""

from languagegroundedsemseg_tpu.losses.classification import (
    cross_entropy_loss,
    focal_loss,
    loss_by_name,
)
from languagegroundedsemseg_tpu.losses.contrastive import (
    contrastive_language_loss,
    contrastive_language_ce_loss,
    l2_anchor_loss,
    feature_sim,
)
from languagegroundedsemseg_tpu.losses.balancing import (
    balanced_loss_masking,
    split_masks_from_sets,
)

__all__ = [
    "cross_entropy_loss",
    "focal_loss",
    "loss_by_name",
    "contrastive_language_loss",
    "contrastive_language_ce_loss",
    "l2_anchor_loss",
    "feature_sim",
    "balanced_loss_masking",
    "split_masks_from_sets",
]
