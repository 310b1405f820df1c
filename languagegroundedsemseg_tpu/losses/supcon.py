"""Supervised point-contrastive loss with confusion-driven hard negatives.

Vectorized redesign of reference lib/losses/PointSupConLoss.py:15-154: the
reference fans a python thread per class to fill positive/negative sample
tensors; here positives are exact-uniform same-label draws via a
sorted-by-label prefix table, and negatives are Gumbel-categorical draws over
classes weighted by the confusion histogram row (times in-batch class
counts — matching the reference's point-level normalization) followed by a
uniform point draw inside the chosen class. Hinge losses as in the
contrastive language loss.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from languagegroundedsemseg_tpu.losses.contrastive import _normalize, _pair_dist


def _class_tables(labels: jnp.ndarray, valid: jnp.ndarray, num_classes: int):
    """Sorted-by-class order + per-class (start, count) for uniform draws."""
    n = labels.shape[0]
    safe = jnp.where(valid, labels, num_classes)
    order = jnp.argsort(safe)  # invalid at the end
    counts = jnp.bincount(safe, length=num_classes + 1)[:num_classes]
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype), jnp.cumsum(counts)[:-1]])
    return order, starts, counts


def _uniform_draw_in_class(key, cls, order, starts, counts, fallback):
    """For each row: uniformly pick a point of class cls[i] (fallback when
    the class has no points)."""
    u = jax.random.uniform(key, cls.shape)
    c = jnp.take(counts, cls)
    r = jnp.floor(u * jnp.maximum(c, 1)).astype(jnp.int32)
    pos = jnp.take(starts, cls) + jnp.minimum(r, jnp.maximum(c - 1, 0))
    idx = jnp.take(order, pos)
    return jnp.where(c > 0, idx, fallback)


def point_supcon_loss(
    key: jax.Array,
    features: jnp.ndarray,
    labels: jnp.ndarray,
    confusion_hist: jnp.ndarray,
    *,
    num_pos: int = 1,
    num_neg: int = 3,
    pos_thresh: float = 0.0,
    neg_thresh: float = 0.6,
    neg_weight: float = 1.0,
    distance: str = "cos",
    ignore_index: int = 255,
    row_mask: Optional[jnp.ndarray] = None,
    preds: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (loss, pos_loss_per_point, neg_loss_per_point)."""
    c = confusion_hist.shape[0]
    n = features.shape[0]
    feats = features.astype(jnp.float32)
    comp = jax.lax.stop_gradient(feats)  # reference contrasts against detached feats

    valid = labels != ignore_index
    if row_mask is not None:
        valid = valid & (row_mask > 0)
    safe = jnp.clip(labels, 0, c - 1)
    self_idx = jnp.arange(n, dtype=jnp.int32)

    # positives: uniform same-label points (self allowed, as in the reference)
    order, starts, counts = _class_tables(safe, valid, c)
    keys = jax.random.split(key, num_pos + num_neg + 1)
    pos_idx = jnp.stack(
        [
            _uniform_draw_in_class(keys[s], safe, order, starts, counts, self_idx)
            for s in range(num_pos)
        ],
        axis=1,
    )
    pos = jnp.take(comp, pos_idx, axis=0)

    # negatives: class ~ confusion[l] * counts * present * (c' != l), then a
    # uniform point of that class (restricted to correct preds if given)
    present = (counts > 0).astype(jnp.float32)
    conf = (confusion_hist.astype(jnp.float32) + 1.0)  # reference +1 smoothing
    w = jnp.take(conf, safe, axis=0) * counts.astype(jnp.float32)[None, :] * present[None, :]
    w = w * (1.0 - jax.nn.one_hot(safe, c))
    logw = jnp.log(jnp.maximum(w, 1e-20))

    if preds is not None:
        correct = valid & (preds == labels)
        order_c, starts_c, counts_c = _class_tables(safe, correct, c)
    else:
        order_c, starts_c, counts_c = order, starts, counts

    neg_list = []
    for s in range(num_neg):
        g = jax.random.gumbel(keys[num_pos + s], (n, c))
        neg_cls = jnp.argmax(logw + g, axis=-1)
        idx = _uniform_draw_in_class(
            keys[num_pos + s], neg_cls, order_c, starts_c, counts_c, self_idx
        )
        has_any = w.sum(-1) > 0
        neg_list.append(jnp.where(has_any, idx, self_idx))
    neg_idx = jnp.stack(neg_list, axis=1)
    neg = jnp.take(comp, neg_idx, axis=0)

    d_pos = jnp.where(valid, _pair_dist(feats, pos, distance), 0.0)
    d_neg = jnp.where(valid, _pair_dist(feats, neg, distance), 0.0)
    pos_loss = jnp.where(valid, jax.nn.relu(d_pos - pos_thresh), 0.0)
    neg_loss = jnp.where(valid, jax.nn.relu(neg_thresh - d_neg), 0.0)
    denom = jnp.maximum((row_mask > 0).sum() if row_mask is not None else n, 1)
    loss = pos_loss.sum() / denom + neg_weight * neg_loss.sum() / denom
    return loss, pos_loss, neg_loss
