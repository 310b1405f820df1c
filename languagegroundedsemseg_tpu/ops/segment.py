"""Per-batch-item (segment) reductions over sparse rows.

Replaces ME's global pooling / broadcast ops (reference models/layers.py:4-85,
models/modules/senet_block.py:9-24) with jax segment ops keyed by the batch
index column. All shapes static: ``num_segments`` is the max batch size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return x * mask[:, None].astype(x.dtype)


def batch_sum(x, batch_idx, mask, num_segments: int):
    """(cap, C) -> (B, C) per-batch-item sum over valid rows."""
    seg = jnp.where(mask > 0, batch_idx, num_segments)  # invalid -> dropped
    return jax.ops.segment_sum(
        x.astype(jnp.float32), seg, num_segments=num_segments + 1
    )[:num_segments]


def batch_count(batch_idx, mask, num_segments: int):
    seg = jnp.where(mask > 0, batch_idx, num_segments)
    ones = mask.astype(jnp.float32)
    return jax.ops.segment_sum(ones, seg, num_segments=num_segments + 1)[:num_segments]


def batch_mean(x, batch_idx, mask, num_segments: int):
    """(cap, C) -> (B, C) per-batch-item mean (ME global avg pooling)."""
    s = batch_sum(x, batch_idx, mask, num_segments)
    c = batch_count(batch_idx, mask, num_segments)
    return s / jnp.maximum(c, 1.0)[:, None]


def batch_max(x, batch_idx, mask, num_segments: int):
    seg = jnp.where(mask > 0, batch_idx, num_segments)
    neg = jnp.finfo(jnp.float32).min
    xm = jnp.where(mask[:, None] > 0, x.astype(jnp.float32), neg)
    m = jax.ops.segment_max(xm, seg, num_segments=num_segments + 1)[:num_segments]
    return jnp.where(m == neg, 0.0, m)


def batch_broadcast(values, batch_idx):
    """(B, C) per-item values -> (cap, C) rows (ME broadcast op)."""
    return jnp.take(values, batch_idx, axis=0)


def masked_mean_var(x, mask):
    """Mean/variance over valid rows of the whole batch (for BatchNorm).

    Returns (mean (C,), var_biased (C,), count ()). Padding rows excluded —
    this is what keeps BN statistics parity with ME (which has no padding).
    """
    m = mask.astype(jnp.float32)
    cnt = jnp.maximum(m.sum(), 1.0)
    xf = x.astype(jnp.float32)
    mean = (xf * m[:, None]).sum(axis=0) / cnt
    d = (xf - mean) * m[:, None]
    var = (d * d).sum(axis=0) / cnt
    return mean, var, cnt
