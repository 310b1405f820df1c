"""Per-voxel classification losses (CE / weighted CE / focal).

Semantics match the reference exactly:
- CE: torch.nn.CrossEntropyLoss(ignore_index) — ignored rows produce 0 loss;
  'mean' divides by the number of *non-ignored* rows (torch semantics).
- Focal (reference lib/losses/FocalLoss.py:9-93): (1-pt)^gamma * alpha[y] *
  (-log pt); 'mean' divides by the number of non-ignored rows (the reference
  filters ignored rows first, then takes a plain mean).
All functions additionally take ``row_mask`` to exclude padding rows.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _valid(labels, ignore_index, row_mask):
    v = labels != ignore_index
    if row_mask is not None:
        v = v & (row_mask > 0)
    return v


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    weight: Optional[jnp.ndarray] = None,
    row_mask: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
):
    """Softmax CE. weight: optional (C,) per-class weights (weighted_ce)."""
    c = logits.shape[-1]
    valid = _valid(labels, ignore_index, row_mask)
    safe = jnp.clip(labels, 0, c - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    if weight is not None:
        w = jnp.take(weight.astype(jnp.float32), safe)
        nll = nll * w
    else:
        w = jnp.ones_like(nll)
    nll = jnp.where(valid, nll, 0.0)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return nll.sum()
    if weight is not None:
        # torch weighted-CE 'mean' divides by the sum of selected weights
        denom = jnp.where(valid, w, 0.0).sum()
    else:
        denom = valid.sum()
    return nll.sum() / jnp.maximum(denom, 1.0)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: Optional[jnp.ndarray] = None,
    ignore_index: int = 255,
    row_mask: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
):
    c = logits.shape[-1]
    valid = _valid(labels, ignore_index, row_mask)
    safe = jnp.clip(labels, 0, c - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    log_pt = jnp.take_along_axis(logp, safe[:, None], axis=-1)[:, 0]
    ce = -log_pt
    if alpha is not None:
        ce = ce * jnp.take(alpha.astype(jnp.float32), safe)
    pt = jnp.exp(log_pt)
    loss = ((1.0 - pt) ** gamma) * ce
    loss = jnp.where(valid, loss, 0.0)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    return loss.sum() / jnp.maximum(valid.sum(), 1.0)


def loss_by_name(
    name: str,
    ignore_index: int = 255,
    weight: Optional[jnp.ndarray] = None,
    focal_gamma: float = 2.0,
    focal_alpha_scale: float = 1.0,
    reduction: str = "mean",
):
    """Criterion factory, the analog of lib/utils.py:112 loss_by_name.

    Returns ``fn(logits, labels, row_mask=None) -> loss``.
    name: 'cross_entropy' | 'weighted_ce' | 'focal'.
    For 'focal', ``weight`` (category weights) scaled by focal_alpha_scale is
    the alpha vector — mirroring the reference trainer's init_criterions
    (lib/train_test/pl_BaselineTrainer.py:92-111).
    """
    if name == "cross_entropy":
        return lambda lg, lb, row_mask=None: cross_entropy_loss(
            lg, lb, ignore_index, None, row_mask, reduction
        )
    if name == "weighted_ce":
        assert weight is not None, "weighted_ce requires category weights"
        return lambda lg, lb, row_mask=None: cross_entropy_loss(
            lg, lb, ignore_index, weight, row_mask, reduction
        )
    if name == "focal":
        alpha = None if weight is None else weight * focal_alpha_scale
        return lambda lg, lb, row_mask=None: focal_loss(
            lg, lb, focal_gamma, alpha, ignore_index, row_mask, reduction
        )
    raise ValueError(f"unknown loss type {name!r}")
