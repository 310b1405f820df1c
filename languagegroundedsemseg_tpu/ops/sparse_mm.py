"""Sparse x dense matmul with gradients.

Functional replacement for the reference's SparseMM autograd wrapper
(lib/math_functions.py:5-27), which backs the CRF coordinate mappings. Two
forms are provided:
- BCOO (jax.experimental.sparse) for genuinely sparse matrices;
- a padded gather/segment formulation matching this framework's
  fixed-capacity index tables (rows/cols/vals padded with -1 rows dropped),
  which is what the kNN CRF uses internally.
Both are differentiable through jax autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sparse_mm_bcoo(data, indices, shape, dense):
    """(values (nnz,), indices (nnz, 2), shape (2,)) @ dense (K, F)."""
    from jax.experimental import sparse as jsparse

    m = jsparse.BCOO((data, indices), shape=tuple(shape))
    return m @ dense


def sparse_mm_padded(rows, cols, vals, num_rows: int, dense):
    """out[r] += vals[i] * dense[cols[i]] for each padded triplet; entries
    with rows < 0 are dropped. Differentiable wrt vals and dense."""
    safe_cols = jnp.maximum(cols, 0)
    contrib = vals[:, None] * jnp.take(dense, safe_cols, axis=0)
    contrib = jnp.where((rows >= 0)[:, None], contrib, 0.0)
    seg = jnp.where(rows >= 0, rows, num_rows)
    return jax.ops.segment_sum(contrib, seg, num_segments=num_rows + 1)[:num_rows]
