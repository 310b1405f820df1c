"""Radius-graph construction + connected components for instance clustering.

TPU-native replacement for the PointGroup CUDA/C++ ops (reference
downstream/insseg/lib/bfs/ops: ballquery_batch_p kernel + sequential CPU BFS,
SURVEY.md §2.2 N7). The sequential BFS becomes iterative min-label
propagation with path halving — a fixed-shape lax.while_loop that converges
in O(log diameter) sweeps — and the radius graph comes from either a host
KDTree (scipy, C speed) or the on-device brute-force ball query.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def radius_edges_host(
    points: np.ndarray,
    radius: float,
    labels: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Exact radius graph as an (E, 2) undirected edge array (each pair
    once, u < v), optionally restricted to same-``labels`` pairs (the BFS
    expands only through equal semantic labels, reference
    bfs_cluster.cpp:54-101).

    Vectorized cKDTree pair query — the host analog of the reference's
    ballquery_batch_p CUDA kernel with its adaptive meanActive retry
    (bfs.py:32-39), which keeps growing the per-point budget until the
    whole within-radius neighborhood fits; the exact pair set is that
    loop's fixed point, with no truncation at any density."""
    from scipy.spatial import cKDTree

    if len(points) == 0:
        return np.zeros((0, 2), dtype=np.int64)
    tree = cKDTree(points)
    pairs = tree.query_pairs(r=radius, output_type="ndarray")
    if labels is not None and len(pairs):
        lab = np.asarray(labels)
        pairs = pairs[lab[pairs[:, 0]] == lab[pairs[:, 1]]]
    return pairs


def radius_graph_host(
    points: np.ndarray,
    radius: float,
    max_neighbors: int,
    labels: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(N, 3) -> (N, max_neighbors) neighbor indices (-1 padded) — the
    fixed-shape table the *device* label-propagation path consumes.
    Built from the exact pair set (radius_edges_host); per-point lists
    beyond ``max_neighbors`` are truncated, so callers that need exact
    reference connectivity should cluster via the edge list instead
    (cluster_points does)."""
    n = len(points)
    out = np.full((n, max_neighbors), -1, dtype=np.int32)
    if n == 0:
        return out
    pairs = radius_edges_host(points, radius, labels)
    if not len(pairs):
        return out
    src = np.concatenate([pairs[:, 0], pairs[:, 1]])
    dst = np.concatenate([pairs[:, 1], pairs[:, 0]])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(len(src)) - starts[src]
    keep = slot < max_neighbors
    out[src[keep], slot[keep]] = dst[keep]
    return out


@partial(jax.jit, static_argnums=(3,))
def radius_graph_device(points, labels, mask, max_neighbors: int, radius: float = 0.03):
    """Brute-force on-device radius graph (quadratic; for modest N)."""
    d2 = (
        (points ** 2).sum(-1, keepdims=True)
        - 2.0 * points @ points.T
        + (points ** 2).sum(-1)[None, :]
    )
    n = points.shape[0]
    eye = jnp.eye(n, dtype=bool)
    ok = (d2 <= radius * radius) & ~eye
    if labels is not None:
        ok = ok & (labels[:, None] == labels[None, :])
    if mask is not None:
        ok = ok & (mask[None, :] > 0) & (mask[:, None] > 0)
    order_key = jnp.where(ok, jnp.arange(n)[None, :], n + jnp.arange(n)[None, :])
    _, idx = jax.lax.top_k(-order_key, max_neighbors)
    got = jnp.take_along_axis(ok, idx, axis=1)
    return jnp.where(got, idx, -1).astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,))
def connected_components(
    neighbors: jnp.ndarray, valid: jnp.ndarray, max_iters: int = 64
) -> jnp.ndarray:
    """(N, K) padded neighbor lists -> (N,) component root ids.

    Min-label propagation with path halving; invalid rows (valid == 0) get
    component id N (a sentinel none of the valid rows can take).
    """
    n = neighbors.shape[0]
    comp0 = jnp.where(valid > 0, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))

    def body(state):
        comp, _changed, it = state
        safe = jnp.maximum(neighbors, 0)
        ncomp = jnp.where(neighbors >= 0, comp[safe], jnp.int32(n))
        best = jnp.minimum(comp, ncomp.min(axis=1))
        # path halving: follow the parent pointer twice
        bs = jnp.minimum(best, n - 1)
        best2 = jnp.where(best < n, jnp.minimum(best, comp[bs]), best)
        bs2 = jnp.minimum(best2, n - 1)
        best3 = jnp.where(best2 < n, jnp.minimum(best2, comp[bs2]), best2)
        new = jnp.where(valid > 0, best3, jnp.int32(n))
        return new, jnp.any(new != comp), it + 1

    def cond(state):
        _comp, changed, it = state
        return changed & (it < max_iters)

    comp, _, _ = jax.lax.while_loop(cond, body, (comp0, jnp.bool_(True), jnp.int32(0)))
    return comp


@partial(jax.jit, static_argnums=(2,))
def component_sizes(comp: jnp.ndarray, valid: jnp.ndarray, n: int) -> jnp.ndarray:
    """(N,) size of each point's component (0 for invalid rows)."""
    seg = jnp.where(valid > 0, comp, n)
    counts = jax.ops.segment_sum(
        (valid > 0).astype(jnp.int32), seg, num_segments=n + 1
    )
    return jnp.where(valid > 0, counts[jnp.minimum(comp, n)], 0)


def cluster_points(
    points: np.ndarray,
    semantic_labels: np.ndarray,
    radius: float = 0.03,
    max_neighbors: int = 48,  # kept for API compat; exact path ignores it
    min_points: int = 50,
    ignored_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full pipeline -> (component_id per point (-1 = none), num_components).

    Exact host radius graph (every within-radius same-label pair; the
    converged state of the reference's adaptive-meanActive ball query) +
    C-speed union-find components — the reference's bfs_cluster also runs
    on CPU (lib/bfs/bfs.py:141: tensors moved to .cpu() before the BFS),
    so this is the same division of labor with no per-point neighbor cap
    that could split dense components.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components as _cc

    n = len(points)
    keep = np.ones(n, dtype=bool) if ignored_mask is None else ~ignored_mask
    kept_idx = np.flatnonzero(keep)
    if len(kept_idx) == 0:
        return np.full(n, -1, np.int32), 0
    pts = points[kept_idx]
    lab = np.asarray(semantic_labels)[kept_idx]
    pairs = radius_edges_host(pts, radius, lab)
    m = len(kept_idx)
    adj = coo_matrix(
        (np.ones(len(pairs), np.int8), (pairs[:, 0], pairs[:, 1])),
        shape=(m, m),
    )
    _, comp_k = _cc(adj, directed=False)
    sizes = np.bincount(comp_k)
    ok = sizes[comp_k] >= min_points
    # densify surviving component ids in first-occurrence order
    uniq, inv = np.unique(comp_k[ok], return_inverse=True)
    out = np.full(n, -1, np.int32)
    out[kept_idx[ok]] = inv
    return out, len(uniq)
