"""Point-cloud ops: FPS, ball query, kNN interpolation, grouping.

TPU-native replacements for the pointnet2 CUDA extension (reference
lib/ext/pointnet2/_ext_src: sampling_gpu.cu, ball_query_gpu.cu,
interpolate_gpu.cu, group_points_gpu.cu — SURVEY.md §2.2 N2-N6). All are
static-shaped jit-able jax: FPS is a fori_loop over a running min-distance
field; neighbor searches are (tiled) brute force — gradients flow through
the feature paths exactly like the CUDA backward kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1,))
def furthest_point_sample(xyz: jnp.ndarray, npoint: int, valid_mask=None) -> jnp.ndarray:
    """(N, 3) -> (npoint,) indices. Greedy max-min sampling (reference
    sampling_gpu.cu furthest_point_sampling_kernel; consumed by the
    limited-annotation preprocessing, lib/datasets/preprocessing/
    scannet_long.py:99-104)."""
    n = xyz.shape[0]
    big = jnp.asarray(1e10, xyz.dtype)
    mindist = jnp.full((n,), big, xyz.dtype)
    if valid_mask is not None:
        mindist = jnp.where(valid_mask > 0, mindist, -1.0)

    def body(i, carry):
        mindist, idxs, last = carry
        d = ((xyz - xyz[last]) ** 2).sum(-1)
        mindist = jnp.minimum(mindist, d)
        nxt = jnp.argmax(mindist)
        idxs = idxs.at[i].set(nxt)
        return mindist, idxs, nxt

    idxs = jnp.zeros((npoint,), jnp.int32)
    first = jnp.int32(0) if valid_mask is None else jnp.argmax(valid_mask).astype(jnp.int32)
    idxs = idxs.at[0].set(first)
    mindist, idxs, _ = jax.lax.fori_loop(1, npoint, body, (mindist, idxs, first))
    return idxs


def gather_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, C), (M,) -> (M, C) (sampling.cpp gather_points, grad = scatter)."""
    return jnp.take(feats, idx, axis=0)


@partial(jax.jit, static_argnums=(2,))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int, ref_mask=None):
    """Brute-force kNN: (M, 3) x (N, 3) -> (dists (M, k), idx (M, k))."""
    d2 = (
        (query ** 2).sum(-1, keepdims=True)
        - 2.0 * query @ ref.T
        + (ref ** 2).sum(-1)[None, :]
    )
    if ref_mask is not None:
        d2 = jnp.where(ref_mask[None, :] > 0, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx


def three_nn(query: jnp.ndarray, ref: jnp.ndarray, ref_mask=None):
    """3 nearest neighbors (interpolate_gpu.cu three_nn_kernel)."""
    return knn(query, ref, 3, ref_mask)


def three_interpolate(feats: jnp.ndarray, idx: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance weighted interpolation of ref feats onto queries
    (interpolate_gpu.cu three_interpolate_kernel; autodiff provides the
    scatter backward the CUDA grad kernel implements)."""
    w = 1.0 / jnp.maximum(dist, 1e-8) ** 2
    w = w / w.sum(-1, keepdims=True)
    gathered = jnp.take(feats, idx, axis=0)  # (M, 3, C)
    return (gathered * w[..., None]).sum(axis=1)


@partial(jax.jit, static_argnums=(3,))
def ball_query(
    query: jnp.ndarray, ref: jnp.ndarray, radius: float, nsample: int, ref_mask=None
):
    """(M, 3) x (N, 3) -> (M, nsample) indices of ref points within radius
    (ball_query_gpu.cu semantics: first nsample in-radius points, remaining
    slots fill with the first found; -1 rows when none found)."""
    d2 = (
        (query ** 2).sum(-1, keepdims=True)
        - 2.0 * query @ ref.T
        + (ref ** 2).sum(-1)[None, :]
    )
    inside = d2 <= radius * radius
    if ref_mask is not None:
        inside = inside & (ref_mask[None, :] > 0)
    # rank in-radius points first (stable by index), take nsample
    n = ref.shape[0]
    order_key = jnp.where(inside, jnp.arange(n)[None, :], n + jnp.arange(n)[None, :])
    _, idx = jax.lax.top_k(-order_key, nsample)
    got = jnp.take_along_axis(inside, idx, axis=1)
    any_found = got[:, :1]
    first = idx[:, :1]
    idx = jnp.where(got, idx, first)  # pad with first in-radius point
    idx = jnp.where(any_found, idx, -1)
    return idx.astype(jnp.int32)


def group_points(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(N, C), (M, S) -> (M, S, C) (group_points_gpu.cu; grad = scatter-add
    via autodiff)."""
    safe = jnp.maximum(idx, 0)
    g = jnp.take(feats, safe, axis=0)
    return jnp.where((idx >= 0)[..., None], g, 0.0)
