"""Language-grounded contrastive losses against CLIP text anchors.

Vectorized redesign of reference lib/losses/ContrastiveLanguageLoss.py:20-237:
the reference fans out a python thread per unique category (joblib, :146) to
fill positive/negative sample tensors; here positives are one gather
(``anchors[labels]``) and negatives one uniform draw with self-exclusion —
the whole loss fuses into a single XLA kernel.

Distance conventions mirror feat_dist (:73-95): per-point distance is the
mean over the sampled anchors of
  cos: 1 - cos_sim        l2: sqrt(||a-b||^2 + 1e-7)     l1: signed sum diff
Hinges: relu(d_pos - pos_thresh) + neg_weight * relu(neg_thresh - d_neg),
ignored rows contribute 0 but still count in the mean denominator (the
reference means over the full point tensor).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _pair_dist(feats, samples, kind: str):
    """feats (N, D), samples (N, S, D) -> (N,) mean distance over S."""
    if kind == "cos":
        fn = _normalize(feats)[:, None, :]  # (N, 1, D)
        sn = _normalize(samples, axis=-1)
        return 1.0 - jnp.einsum("nkd,nsd->ns", fn, sn)[:, :].mean(axis=-1)
    if kind == "l2":
        d2 = ((feats[:, None, :] - samples) ** 2).sum(axis=-1)
        return jnp.sqrt(d2 + 1e-7).mean(axis=-1)
    if kind == "l1":
        # Signed sum — intentional parity with the reference's l1 branch.
        return (feats[:, None, :] - samples).sum(axis=-1).mean(axis=-1)
    raise ValueError(f"unknown distance {kind!r}")


def sample_negatives(
    key: jax.Array,
    labels: jnp.ndarray,
    num_classes: int,
    num_samples: int,
) -> jnp.ndarray:
    """(N, S) class ids drawn uniformly from {0..C-1} \\ {label}."""
    n = labels.shape[0]
    r = jax.random.randint(key, (n, num_samples), 0, num_classes - 1)
    lab = jnp.clip(labels, 0, num_classes - 1)[:, None]
    return r + (r >= lab).astype(r.dtype)


def latent_attribute_augmentation(
    key: jax.Array,
    features: jnp.ndarray,
    labels: jnp.ndarray,
    projection_w: jnp.ndarray,
    augment_mask: jnp.ndarray,
    aug_prob: float,
    ignore_index: int = 255,
):
    """Latent attribute augmentation (reference
    ContrastiveLanguageLoss.py:61-69,161-166, vectorized).

    The reference walks unique categories in Python and, for each eligible
    (tail) category, with probability ``aug_prob`` rotates that category's
    features through one randomly-chosen attribute head of the pretrained
    AttributeFittingModel and retargets the positive anchor to the attributed
    prompt. Here the per-category Bernoulli draw and attribute choice are
    (C,) vectors and the projection is applied as A masked matmuls — exact
    distributional parity, one fused XLA computation.

    projection_w: (A, D, D) attribute rotations (models/classifier.py).
    augment_mask: (C,) bool — categories eligible (the tail split).
    Returns (features', pos_slot (N,) int32): slot 0 = raw category prompt,
    slot a+1 = attributed prompt a, matching the anchor layout
    anchors[:, 0] = raw / anchors[:, 1:] = attributed.
    """
    num_attributes = projection_w.shape[0]
    num_cats = augment_mask.shape[0]
    k1, k2 = jax.random.split(key)
    do_cat = (jax.random.uniform(k1, (num_cats,)) < aug_prob) & augment_mask
    attr_cat = jax.random.randint(k2, (num_cats,), 0, num_attributes)

    safe = jnp.clip(labels, 0, num_cats - 1)
    valid = labels != ignore_index
    do_pt = do_cat[safe] & valid
    attr_pt = attr_cat[safe]

    f32 = features.astype(jnp.float32)
    out = f32
    for a in range(num_attributes):  # static: A masked matmuls, (N, D) memory
        sel = (do_pt & (attr_pt == a))[:, None]
        out = jnp.where(sel, f32 @ projection_w[a].astype(jnp.float32), out)
    pos_slot = jnp.where(do_pt, attr_pt + 1, 0).astype(jnp.int32)
    return out.astype(features.dtype), pos_slot


def contrastive_language_loss(
    key: jax.Array,
    features: jnp.ndarray,
    labels: jnp.ndarray,
    anchors: jnp.ndarray,
    *,
    num_negatives: int = 3,
    pos_thresh: float = 0.0,
    neg_thresh: float = 0.6,
    neg_weight: float = 1.0,
    distance: str = "cos",
    ignore_index: int = 255,
    row_mask: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    pos_slot: Optional[jnp.ndarray] = None,
):
    """Returns (loss, pos_loss_per_point, neg_loss_per_point).

    ``pos_slot`` (from latent_attribute_augmentation) selects the attributed
    anchor slot per point when ``anchors`` is (C, A, D); negatives always
    come from the raw slot 0 (reference ContrastiveLanguageLoss.py:176).
    """
    attributed = None
    if anchors.ndim == 3:  # (C, A, D) attributed anchors
        if pos_slot is not None and anchors.shape[1] > 1:
            attributed = anchors.astype(jnp.float32)
        anchors = anchors[:, 0, :]
    c = anchors.shape[0]
    feats = features.astype(jnp.float32)
    anchors = anchors.astype(jnp.float32)

    valid = labels != ignore_index
    if row_mask is not None:
        valid = valid & (row_mask > 0)
    safe = jnp.clip(labels, 0, c - 1)

    if attributed is not None:
        slot = jnp.clip(pos_slot, 0, attributed.shape[1] - 1)
        pos = attributed[safe, slot][:, None, :]  # (N, 1, D)
    else:
        pos = jnp.take(anchors, safe, axis=0)[:, None, :]  # (N, 1, D)
    neg_ids = sample_negatives(key, safe, c, num_negatives)
    neg = jnp.take(anchors, neg_ids, axis=0)  # (N, S, D)

    d_pos = jnp.where(valid, _pair_dist(feats, pos, distance), 0.0)
    d_neg = jnp.where(valid, _pair_dist(feats, neg, distance), 0.0)

    pos_loss = jax.nn.relu(d_pos - pos_thresh)
    neg_loss = jax.nn.relu(neg_thresh - d_neg)
    pos_loss = jnp.where(valid, pos_loss, 0.0)
    neg_loss = jnp.where(valid, neg_loss, 0.0)

    if reduction == "mean":
        denom = (
            jnp.maximum((row_mask > 0).sum(), 1)
            if row_mask is not None
            else pos_loss.shape[0]
        )
        loss = pos_loss.sum() / denom + neg_weight * neg_loss.sum() / denom
        return loss, pos_loss, neg_loss
    return pos_loss + neg_weight * neg_loss, pos_loss, neg_loss


def contrastive_language_ce_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    anchors: jnp.ndarray,
    *,
    distance: str = "cos",
    ignore_index: int = 255,
    row_mask: Optional[jnp.ndarray] = None,
):
    """CE over anchor-similarity logits (reference
    ContrastiveLanguageCELoss:197-237)."""
    from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss

    if anchors.ndim == 3:
        anchors = anchors[:, 0, :]
    sims = feature_sim(features, anchors, distance)
    return cross_entropy_loss(sims, labels, ignore_index, row_mask=row_mask)


def l2_anchor_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    anchors: jnp.ndarray,
    ignore_index: int = 255,
    row_mask: Optional[jnp.ndarray] = None,
):
    """Per-point mean-squared distance to the own-category anchor — the 'l2'
    embedding loss path (reference lib/losses/utils.py:6-10). Returns the
    per-point loss vector (0 at ignored/padding rows)."""
    if anchors.ndim == 3:
        anchors = anchors[:, 0, :]
    c = anchors.shape[0]
    valid = labels != ignore_index
    if row_mask is not None:
        valid = valid & (row_mask > 0)
    safe = jnp.clip(labels, 0, c - 1)
    target = jnp.take(anchors.astype(jnp.float32), safe, axis=0)
    per_point = ((features.astype(jnp.float32) - target) ** 2).mean(axis=-1)
    return jnp.where(valid, per_point, 0.0)


def feature_sim(features: jnp.ndarray, anchors: jnp.ndarray, distance: str = "cos"):
    """(N, C) similarity scores; argmax = nearest-anchor classification
    (reference lib/losses/utils.py:80-103)."""
    if anchors.ndim == 3:
        anchors = anchors[:, 0, :]
    f = features.astype(jnp.float32)
    a = anchors.astype(jnp.float32)
    if distance == "cos":
        return _normalize(f) @ _normalize(a).T
    if distance == "l2":
        d2 = (f * f).sum(-1, keepdims=True) - 2.0 * (f @ a.T) + (a * a).sum(-1)[None, :]
        return -d2
    if distance == "l1":
        # Signed-sum parity with the reference.
        return -(f.sum(-1, keepdims=True) - a.sum(-1)[None, :])
    raise ValueError(f"unknown distance {distance!r}")


def feature_norm_penalty(features, row_mask=None, max_penalty: float = 0.2):
    """Unit-sphere projection penalty (reference
    pl_RepresentationTrainer.py:233-235, config normalize_features)."""
    norms = jnp.linalg.norm(features.astype(jnp.float32), axis=-1)
    pen = jnp.minimum((norms - 1.0) ** 2, max_penalty)
    if row_mask is not None:
        pen = jnp.where(row_mask > 0, pen, 0.0)
        return pen.sum() / jnp.maximum((row_mask > 0).sum(), 1)
    return pen.mean()
