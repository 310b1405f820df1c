"""Objective functions for the three training modes.

Re-expresses the loss assembly of the reference trainers as pure functions
usable inside the jitted train step:
- baseline (pl_BaselineTrainer.py:311-358): CE/weighted-CE/focal, optional
  added embedding loss ('both'), head/common/tail balanced masking;
- representation (pl_RepresentationTrainer.py:200-256): contrastive or l2
  loss against CLIP text anchors + optional feature-norm penalty, with
  nearest-anchor predictions for metrics;
- classifier: plain CE on a linear head over frozen features.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from languagegroundedsemseg_tpu.losses.balancing import balanced_loss_masking
from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss, focal_loss
from languagegroundedsemseg_tpu.losses.contrastive import (
    contrastive_language_loss,
    feature_norm_penalty,
    feature_sim,
    l2_anchor_loss,
    latent_attribute_augmentation,
)


def _per_point_criterion(config, logits, labels, weights, row_mask):
    if config.loss_type == "focal":
        alpha = None if weights is None else weights * config.focal_alpha
        return focal_loss(
            logits, labels, gamma=config.focal_gamma, alpha=alpha,
            ignore_index=config.ignore_label, row_mask=row_mask, reduction="none",
        )
    w = weights if (config.loss_type == "weighted_ce" or config.weighted_cross_entropy) else None
    return cross_entropy_loss(
        logits, labels, ignore_index=config.ignore_label, weight=w,
        row_mask=row_mask, reduction="none",
    )


def _finalize(config, key, per_point, labels, split_matrix, row_mask):
    """Balanced masking + split logging, or a plain valid mean."""
    metrics: Dict[str, jnp.ndarray] = {}
    if config.balanced_category_sampling and split_matrix is not None:
        bl = balanced_loss_masking(
            key,
            per_point,
            labels,
            jnp.asarray(split_matrix),
            head_ratio=config.balanced_sample_head_ratio,
            common_ratio=config.balanced_sample_common_ratio,
            ignore_index=config.ignore_label,
            row_mask=row_mask,
        )
        metrics["head_loss"] = bl.split_loss[0]
        metrics["common_loss"] = bl.split_loss[1]
        metrics["tail_loss"] = bl.split_loss[2]
        return bl.loss, metrics
    valid = (labels != config.ignore_label) & (row_mask > 0)
    loss = per_point.sum() / jnp.maximum(valid.sum(), 1)
    return loss, metrics


def make_baseline_objective(
    config,
    category_weights: Optional[np.ndarray] = None,
    split_matrix: Optional[np.ndarray] = None,
    anchors: Optional[np.ndarray] = None,
):
    """objective(logits, features, batch, key, row_mask) -> (loss, metrics).

    When config.use_embedding_loss == 'both', the contrastive language loss
    on backbone features is added to the classification loss
    (pl_BaselineTrainer.py:325-347, scripts/fine_tune_classifier.sh).
    """
    weights = None if category_weights is None else jnp.asarray(category_weights)
    anchors_j = None if anchors is None else jnp.asarray(anchors)

    def objective(logits, features, batch, key, row_mask):
        labels = batch.labels
        per_point = _per_point_criterion(config, logits, labels, weights, row_mask)
        metrics: Dict[str, jnp.ndarray] = {}

        if config.use_embedding_loss and anchors_j is not None:
            k_emb, key = jax.random.split(key)
            if config.embedding_loss_type == "l2":
                emb = l2_anchor_loss(
                    features, labels, anchors_j, config.ignore_label, row_mask
                )
            else:
                _, pos_l, neg_l = contrastive_language_loss(
                    k_emb, features, labels, anchors_j,
                    num_negatives=config.num_negative_samples,
                    pos_thresh=config.contrast_pos_thresh,
                    neg_thresh=config.contrast_neg_thresh,
                    neg_weight=config.contrast_neg_weight,
                    distance=config.representation_distance_type,
                    ignore_index=config.ignore_label,
                    row_mask=row_mask, reduction="none",
                )
                emb = pos_l + config.contrast_neg_weight * neg_l
            emb = emb * config.embedding_loss_lambda
            metrics["embedding_loss"] = emb.sum() / jnp.maximum((row_mask > 0).sum(), 1)
            per_point = per_point + emb

        loss, m2 = _finalize(config, key, per_point, labels, split_matrix, row_mask)
        metrics.update(m2)
        return loss, metrics

    return objective


def make_representation_objective(
    config,
    anchors: np.ndarray,
    split_matrix: Optional[np.ndarray] = None,
    projection_w: Optional[np.ndarray] = None,
):
    """Language-grounded pretraining loss (RepresentationTrainer).

    When config.instance_augmentation == 'latent' and attributed anchors
    (C, A>1, D) plus projection weights are available, tail-category features
    are rotated into a random attribute's latent space and pulled toward the
    attributed prompt anchor (reference pl_RepresentationTrainer.py:46 +
    ContrastiveLanguageLoss.py:161-166).
    """
    anchors_j = jnp.asarray(anchors)
    latent = (
        config.instance_augmentation == "latent"
        and projection_w is not None
        and anchors_j.ndim == 3
        and anchors_j.shape[1] > 1
        and split_matrix is not None
    )
    proj_j = None if projection_w is None else jnp.asarray(projection_w)
    tail_mask = (
        jnp.asarray(np.asarray(split_matrix)[:, 2], bool) if latent else None
    )

    def objective(features, _features_again, batch, key, row_mask):
        labels = batch.labels
        k_emb, key = jax.random.split(key)
        pos_slot = None
        if latent:
            k_aug, k_emb = jax.random.split(k_emb)
            features, pos_slot = latent_attribute_augmentation(
                k_aug, features, labels, proj_j, tail_mask,
                config.instance_augmentation_color_aug_prob,
                ignore_index=config.ignore_label,
            )
        if config.use_embedding_loss == "l2" or config.embedding_loss_type == "l2":
            per_point = l2_anchor_loss(features, labels, anchors_j, config.ignore_label, row_mask)
            pos_mean = per_point.sum() / jnp.maximum((row_mask > 0).sum(), 1)
            neg_mean = jnp.zeros(())
        else:
            _, pos_l, neg_l = contrastive_language_loss(
                k_emb, features, labels, anchors_j, pos_slot=pos_slot,
                num_negatives=config.num_negative_samples,
                pos_thresh=config.contrast_pos_thresh,
                neg_thresh=config.contrast_neg_thresh,
                neg_weight=config.contrast_neg_weight,
                distance=config.representation_distance_type,
                ignore_index=config.ignore_label,
                row_mask=row_mask, reduction="none",
            )
            per_point = pos_l + config.contrast_neg_weight * neg_l
            denom = jnp.maximum((row_mask > 0).sum(), 1)
            pos_mean, neg_mean = pos_l.sum() / denom, neg_l.sum() / denom

        loss, metrics = _finalize(config, key, per_point, labels, split_matrix, row_mask)
        metrics["pos_loss"] = pos_mean
        metrics["neg_loss"] = neg_mean

        if config.normalize_features:
            pen = feature_norm_penalty(features, row_mask, config.feat_norm_loss_max)
            metrics["feat_norm_penalty"] = pen
            loss = loss + pen
        return loss, metrics

    return objective


def representation_predictions(features, anchors, distance: str = "cos"):
    """Nearest-anchor classification for pretraining metrics
    (pl_RepresentationTrainer.py:238-239 feature_sim argmax)."""
    sims = feature_sim(features, jnp.asarray(anchors), distance)
    return jnp.argmax(sims, axis=-1)
