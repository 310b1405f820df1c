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


def radius_graph_host(
    points: np.ndarray,
    radius: float,
    max_neighbors: int,
    labels: Optional[np.ndarray] = None,
) -> np.ndarray:
    """(N, 3) -> (N, max_neighbors) neighbor indices (-1 padded), optionally
    restricted to same-``labels`` pairs (the BFS expands only through equal
    semantic labels, reference bfs_cluster.cpp:54-101)."""
    from scipy.spatial import cKDTree

    n = len(points)
    out = np.full((n, max_neighbors), -1, dtype=np.int32)
    if n == 0:
        return out
    tree = cKDTree(points)
    pairs = tree.query_ball_point(points, r=radius, workers=-1)
    for i, nbrs in enumerate(pairs):
        if labels is not None:
            nbrs = [j for j in nbrs if j != i and labels[j] == labels[i]]
        else:
            nbrs = [j for j in nbrs if j != i]
        k = min(len(nbrs), max_neighbors)
        out[i, :k] = nbrs[:k]
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
    max_neighbors: int = 48,
    min_points: int = 50,
    ignored_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full pipeline -> (component_id per point (-1 = none), num_components).

    Host radius graph + device label propagation; the functional equivalent
    of ballquery_batch_p + bfs_cluster + min-size filter
    (reference lib/bfs/bfs.py:107-141).
    """
    n = len(points)
    keep = np.ones(n, dtype=bool) if ignored_mask is None else ~ignored_mask
    nbr = radius_graph_host(points, radius, max_neighbors, semantic_labels)
    nbr[~keep] = -1
    valid = keep.astype(np.int32)
    comp = np.asarray(connected_components(jnp.asarray(nbr), jnp.asarray(valid)))
    sizes = np.asarray(component_sizes(jnp.asarray(comp), jnp.asarray(valid), n))
    comp = np.where((sizes >= min_points) & keep, comp, -1)
    roots = np.unique(comp[comp >= 0])
    remap = {r: i for i, r in enumerate(roots)}
    out = np.array([remap.get(c, -1) for c in comp], dtype=np.int32)
    return out, len(roots)
