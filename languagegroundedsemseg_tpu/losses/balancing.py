"""Head/common/tail balanced loss masking.

Vectorized equivalent of reference lib/losses/utils.py:13-77
(sample_categories_for_balancing): per-point Bernoulli keep masks replace the
per-category numpy choice-without-replacement loop (same expectation, fully
on-device). Tail categories are always kept; head/common are subsampled by
the configured ratios (<= 0 means keep all). Also returns per-split mean
losses for the head/common/tail logging the reference does.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class BalancedLoss(NamedTuple):
    loss: jnp.ndarray          # scalar: masked loss mean
    split_loss: jnp.ndarray    # (3,) head/common/tail mean losses (detached use)
    split_count: jnp.ndarray   # (3,) number of points per split


def split_masks_from_sets(num_classes: int, head_ids, common_ids, tail_ids) -> np.ndarray:
    """(C, 3) bool matrix — the dataset's frequency_organized_cats
    (reference lib/datasets/scannet.py:127-141)."""
    m = np.zeros((num_classes, 3), dtype=bool)
    m[np.asarray(list(head_ids), dtype=int), 0] = True
    m[np.asarray(list(common_ids), dtype=int), 1] = True
    m[np.asarray(list(tail_ids), dtype=int), 2] = True
    return m


def balanced_loss_masking(
    key: jax.Array,
    loss: jnp.ndarray,
    labels: jnp.ndarray,
    split_matrix: jnp.ndarray,
    *,
    head_ratio: float = -1.0,
    common_ratio: float = -1.0,
    ignore_index: int = 255,
    row_mask: Optional[jnp.ndarray] = None,
) -> BalancedLoss:
    """loss: per-point loss (N,); labels: (N,); split_matrix: (C, 3) bool.

    Mean semantics follow the reference: the masked loss is averaged over all
    (non-padding) rows — not just the sampled ones (lib/losses/utils.py:75-77).
    """
    c = split_matrix.shape[0]
    valid = labels != ignore_index
    if row_mask is not None:
        valid = valid & (row_mask > 0)
    safe = jnp.clip(labels, 0, c - 1)
    split = jnp.take(split_matrix.astype(jnp.int32), safe, axis=0)  # (N, 3)
    split = split * valid[:, None].astype(jnp.int32)
    is_head, is_common, is_tail = split[:, 0], split[:, 1], split[:, 2]

    keep = valid
    if head_ratio > 0.0 or common_ratio > 0.0:
        u = jax.random.uniform(key, loss.shape)
        keep_head = jnp.where(is_head > 0, u < head_ratio, True) if head_ratio > 0.0 else True
        keep_common = (
            jnp.where(is_common > 0, u < common_ratio, True) if common_ratio > 0.0 else True
        )
        keep = valid & keep_head & keep_common

    masked = jnp.where(keep, loss, 0.0)
    denom = (
        jnp.maximum((row_mask > 0).sum(), 1) if row_mask is not None else loss.shape[0]
    )
    mean_loss = masked.sum() / denom

    counts = jnp.stack([is_head.sum(), is_common.sum(), is_tail.sum()]).astype(jnp.float32)
    sums = jnp.stack(
        [
            (loss * is_head).sum(),
            (loss * is_common).sum(),
            (loss * is_tail).sum(),
        ]
    )
    split_loss = sums / jnp.maximum(counts, 1.0)
    return BalancedLoss(mean_loss, jax.lax.stop_gradient(split_loss), counts)
