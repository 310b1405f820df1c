"""SimSiam-style paired-view losses with voxel correspondences.

Mirror of reference lib/losses/SupervisedSimiam.py:
- PointSimSiamLoss (:67-88): mean (1 - cos) between view-1 features and the
  corresponding view-2 features.
- SupervisedSimSiam (:14-64): per-view anchor cosine losses (to CLIP
  features of the label), /4, each balanced-masked; the paired cosine terms
  are computed for logging.
Correspondence arrays may contain -1 (dropped partner rows) — masked out.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from languagegroundedsemseg_tpu.losses.balancing import balanced_loss_masking
from languagegroundedsemseg_tpu.losses.contrastive import _normalize


def cosine_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - (_normalize(a) * _normalize(b)).sum(-1)


def point_simsiam_loss(z1, z2, corrs1, row_mask1=None):
    """Mean 1-cos(z1[i], z2[corrs1[i]]) over valid correspondences."""
    ok = corrs1 >= 0
    if row_mask1 is not None:
        ok = ok & (row_mask1 > 0)
    partner = jnp.take(z2, jnp.maximum(corrs1, 0), axis=0)
    per = jnp.where(ok, cosine_loss(z1, partner), 0.0)
    return per.sum() / jnp.maximum(ok.sum(), 1)


def supervised_simsiam_loss(
    key: jax.Array,
    config,
    p1, p2, z1, z2,
    corrs1, corrs2,
    labels1, labels2,
    anchors: jnp.ndarray,
    split_matrix=None,
    row_mask1=None, row_mask2=None,
):
    """Returns (total_loss, metrics)."""
    c = anchors.shape[0]
    k1, k2 = jax.random.split(key)

    def view_loss(k, p, labels, row_mask):
        valid = labels != config.ignore_label
        if row_mask is not None:
            valid = valid & (row_mask > 0)
        target = jnp.take(anchors, jnp.clip(labels, 0, c - 1), axis=0)
        per = jnp.where(valid, cosine_loss(p, target), 0.0) / 4.0
        if config.balanced_category_sampling and split_matrix is not None:
            bl = balanced_loss_masking(
                k, per, labels, jnp.asarray(split_matrix),
                head_ratio=config.balanced_sample_head_ratio,
                common_ratio=config.balanced_sample_common_ratio,
                ignore_index=config.ignore_label, row_mask=row_mask,
            )
            return bl.loss, bl.split_loss
        return per.sum() / jnp.maximum(valid.sum(), 1), jnp.zeros(3)

    loss1, split1 = view_loss(k1, p1, labels1, row_mask1)
    loss2, split2 = view_loss(k2, p2, labels2, row_mask2)
    sim1 = point_simsiam_loss(p1, z2, corrs1, row_mask1)
    sim2 = point_simsiam_loss(p2, z1, corrs2, row_mask2)
    metrics = {
        "simsiam_loss1": sim1,
        "simsiam_loss2": sim2,
        "anchor_loss1": loss1,
        "anchor_loss2": loss2,
    }
    return loss1 + loss2, metrics


def soft_iou_loss(logits, labels, num_classes: int, ignore_index: int = 255, row_mask=None):
    """Soft-IoU over valid points (reference lib/losses/SoftIoULoss.py:6-41)."""
    valid = labels != ignore_index
    if row_mask is not None:
        valid = valid & (row_mask > 0)
    pred = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1), num_classes)
    m = valid[:, None].astype(jnp.float32)
    inter = (pred * onehot * m).sum(0)
    union = ((pred + onehot - pred * onehot) * m).sum(0)
    return 1.0 - (inter / (union + 1e-16)).mean()


def recall_cross_entropy(logits, labels, num_classes: int, ignore_index: int = 255, row_mask=None):
    """CE reweighted by per-class false-negative rate (reference
    lib/losses/RecallCrossEntropy.py:4-46)."""
    valid = labels != ignore_index
    if row_mask is not None:
        valid = valid & (row_mask > 0)
    safe = jnp.clip(labels, 0, num_classes - 1)
    pred = jnp.argmax(logits, axis=-1)
    wrong = valid & (pred != labels)
    gt_count = jnp.maximum(
        jnp.bincount(jnp.where(valid, safe, num_classes), length=num_classes + 1)[:num_classes], 1
    )
    fn_count = jnp.maximum(
        jnp.bincount(jnp.where(wrong, safe, num_classes), length=num_classes + 1)[:num_classes], 1
    )
    weight = fn_count.astype(jnp.float32) / gt_count.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    per = jnp.where(valid, jnp.take(weight, safe) * ce, 0.0)
    return per.sum() / jnp.maximum(valid.sum(), 1)
