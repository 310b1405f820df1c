"""Sparse convolution as gather-GEMM-accumulate over kernel offsets.

The TPU-native replacement for MinkowskiConvolution(Transpose) fwd/bwd
(reference models/modules/common.py:195-236). For each kernel slot k the op
gathers the neighbor features selected by the kernel map and feeds one large
(N, Cin) x (Cin, Cout) matmul to the MXU, accumulating in fp32. Invalid
neighbors (idx == -1) contribute zero.

Backward is a custom VJP that *recomputes* the gathers instead of storing the
K x N x Cin gathered activations (which would dominate HBM at level 0):
  dX    = sum_k scatter_add(dOut @ W[k]^T  ->  idx_k)
  dW[k] = gather(x, idx_k)^T @ dOut
Out-of-range scatter indices are dropped by XLA's FILL_OR_DROP mode, which we
use to discard invalid-slot contributions for free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of x at idx, substituting zeros where idx < 0."""
    safe = jnp.maximum(idx, 0)
    g = jnp.take(x, safe, axis=0)
    return jnp.where((idx >= 0)[:, None], g, jnp.zeros((), dtype=x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_core(x: jnp.ndarray, w: jnp.ndarray, idx: jnp.ndarray, center: int) -> jnp.ndarray:
    return _conv_fwd_impl(x, w, idx, center)


def _split_center(w, idx, center):
    """Static split: (center weight or None, rest weights, rest idx)."""
    if center < 0:
        return None, w, idx
    wc = w[center]
    w_rest = jnp.concatenate([w[:center], w[center + 1 :]], axis=0)
    idx_rest = jnp.concatenate([idx[:center], idx[center + 1 :]], axis=0)
    return wc, w_rest, idx_rest


def _center_masked(x, idx, center):
    """x with rows whose center-slot entry is missing zeroed — padding AND
    sentinel rows (sparse/graph_host.py:expand_sentinels) may carry nonzero
    features, and the center fast path must not leak them."""
    return jnp.where((idx[center] >= 0)[:, None], x, jnp.zeros((), x.dtype))


def _conv_fwd_impl(x, w, idx, center):
    n_out = idx.shape[1]
    c_out = w.shape[2]
    wc, w_rest, idx_rest = _split_center(w, idx, center)

    if wc is not None:
        # Center slot of a stride-1 kernel maps each valid row to itself: a
        # plain masked matmul, no gather (XLA fuses the select).
        acc0 = jnp.dot(_center_masked(x, idx, center), wc,
                       preferred_element_type=jnp.float32)
    else:
        acc0 = jnp.zeros((n_out, c_out), dtype=jnp.float32)

    def step(acc, kw):
        wk, ik = kw
        g = _gather_rows(x, ik)
        acc = acc + jnp.dot(g, wk, preferred_element_type=jnp.float32)
        return acc, None

    acc, _ = lax.scan(step, acc0, (w_rest, idx_rest))
    return acc.astype(x.dtype)


def _conv_fwd(x, w, idx, center):
    return _conv_fwd_impl(x, w, idx, center), (x, w, idx)


def _conv_bwd(center, res, g_out):
    x, w, idx = res
    n_in = x.shape[0]
    g32 = g_out.astype(jnp.float32)
    wc, w_rest, idx_rest = _split_center(w, idx, center)

    if wc is not None:
        gc = _center_masked(g32, idx, center)
        dx0 = jnp.dot(gc, wc.astype(jnp.float32).T, preferred_element_type=jnp.float32)
        dwc = jnp.dot(
            _center_masked(x, idx, center).astype(jnp.float32).T, g32,
            preferred_element_type=jnp.float32,
        )
    else:
        dx0 = jnp.zeros((n_in, x.shape[1]), dtype=jnp.float32)
        dwc = None

    def step(dx, kw):
        wk, ik = kw
        # dX contribution: scatter rows of dOut @ wk^T to input positions.
        contrib = jnp.dot(g32, wk.astype(jnp.float32).T, preferred_element_type=jnp.float32)
        scatter_to = jnp.where(ik >= 0, ik, n_in)  # out-of-range -> dropped
        dx = dx.at[scatter_to].add(contrib, mode="drop")
        # dW for this slot: regathered activations^T @ dOut.
        gx = _gather_rows(x, ik).astype(jnp.float32)
        dwk = jnp.dot(gx.T, g32, preferred_element_type=jnp.float32)
        return dx, dwk

    dx, dw_rest = lax.scan(step, dx0, (w_rest, idx_rest))
    if wc is not None:
        dw = jnp.concatenate(
            [dw_rest[:center], dwc[None], dw_rest[center:]], axis=0
        )
    else:
        dw = dw_rest
    return dx.astype(x.dtype), dw.astype(w.dtype), None


_conv_core.defvjp(_conv_fwd, _conv_bwd)


def sparse_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    idx: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    center_slot: int = -1,
    mirror_perm=None,
    companion_parent=None,
) -> jnp.ndarray:
    """Apply a sparse convolution.

    x: (cap_in, Cin) features (rows past the valid count may be garbage —
       they are never referenced because kernel maps only index valid rows).
    w: (K, Cin, Cout) kernel weights, slot order = the kernel map's offset
       order.
    idx: (K, cap_out) int32 kernel map (-1 = missing neighbor).
    center_slot: static slot index whose map is the identity (skips that
       gather); -1 if none.
    Returns (cap_out, Cout).
    """
    assert w.ndim == 3 and idx.ndim == 2 and w.shape[0] == idx.shape[0], (
        f"w {w.shape} vs idx {idx.shape}"
    )
    if mirror_perm is not None:
        out = _conv_core_mirror(x, w, idx, center_slot, tuple(mirror_perm))
    elif companion_parent is not None:
        parent, kslot = companion_parent
        out = _conv_core_cparent(x, w, idx, parent, kslot)
    else:
        out = _conv_core(x, w, idx, center_slot)
    if bias is not None:
        out = out + bias
    return out


# ---- Gather-only backward variants -----------------------------------------
#
# TPU scatter-add measures ~4x slower per row than gather, so the scatter-
# based dX above is the training bottleneck. When the kernel geometry admits
# a transpose map, dX is exactly the *forward* op with transposed weights:
#   stride-1 symmetric region: dX = conv(dOut, W[mirror].T, same idx)
#   down conv (k2s2):          dX = parent_conv(dOut, W.T, up-map)
#   up conv (parent map):      dX = conv(dOut, W.T, down-map)
# The graph builder provides the mirror permutation / companion maps.


def _wt(w, perm=None):
    wt = jnp.swapaxes(w, 1, 2)
    if perm is not None:
        wt = wt[jnp.asarray(perm)]
    return wt


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv_core_mirror(x, w, idx, center, mirror_perm):
    return _conv_fwd_impl(x, w, idx, center)


def _conv_mirror_fwd(x, w, idx, center, mirror_perm):
    return _conv_fwd_impl(x, w, idx, center), (x, w, idx)


def _conv_mirror_bwd(center, mirror_perm, res, g_out):
    x, w, idx = res
    g32 = g_out.astype(jnp.float32)
    # dX: forward pass over the same map with mirrored-transposed weights.
    dx = _conv_fwd_impl(g32, _wt(w.astype(jnp.float32), mirror_perm), idx, center)
    # dW: regather activations (identical to the scatter-variant backward).
    wc_dummy, w_rest, idx_rest = _split_center(w, idx, center)

    def step(_, kw):
        _wk, ik = kw
        gx = _gather_rows(x, ik).astype(jnp.float32)
        return None, jnp.dot(gx.T, g32, preferred_element_type=jnp.float32)

    _, dw_rest = lax.scan(step, None, (w_rest, idx_rest))
    if wc_dummy is not None:
        dwc = jnp.dot(
            _center_masked(x, idx, center).astype(jnp.float32).T, g32,
            preferred_element_type=jnp.float32,
        )
        dw = jnp.concatenate([dw_rest[:center], dwc[None], dw_rest[center:]], axis=0)
    else:
        dw = dw_rest
    return dx.astype(x.dtype), dw.astype(w.dtype), None


_conv_core_mirror.defvjp(_conv_mirror_fwd, _conv_mirror_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def _conv_core_cparent(x, w, idx, parent, kslot):
    """Down conv whose backward runs through the companion ParentMap."""
    return _conv_fwd_impl(x, w, idx, -1)


def _conv_cparent_fwd(x, w, idx, parent, kslot):
    return _conv_fwd_impl(x, w, idx, -1), (x, w, idx, parent, kslot)


def _conv_cparent_bwd(res, g_out):
    x, w, idx, parent, kslot = res
    g32 = g_out.astype(jnp.float32)
    dx = _parent_fwd_impl(g32, _wt(w.astype(jnp.float32)), parent, kslot)

    def step(_, kw):
        _wk, ik = kw
        gx = _gather_rows(x, ik).astype(jnp.float32)
        return None, jnp.dot(gx.T, g32, preferred_element_type=jnp.float32)

    _, dw = lax.scan(step, None, (w, idx))
    return dx.astype(x.dtype), dw.astype(w.dtype), None, None, None


_conv_core_cparent.defvjp(_conv_cparent_fwd, _conv_cparent_bwd)


@partial(jax.custom_vjp, nondiff_argnums=())
def _parent_core_cidx(x, w, parent, kslot, idx_down):
    """Up (parent-map) conv whose backward runs through the down map."""
    return _parent_fwd_impl(x, w, parent, kslot)


def _parent_cidx_fwd(x, w, parent, kslot, idx_down):
    return _parent_fwd_impl(x, w, parent, kslot), (x, w, parent, kslot, idx_down)


def _parent_cidx_bwd(res, g_out):
    x, w, parent, kslot, idx_down = res
    k_num = w.shape[0]
    g32 = g_out.astype(jnp.float32)
    dx = _conv_fwd_impl(g32, _wt(w.astype(jnp.float32)), idx_down, -1)
    g = jnp.take(x, parent, axis=0).astype(jnp.float32)
    dws = []
    for k in range(k_num):
        mask = (kslot == k)[:, None]
        dws.append(jnp.dot(jnp.where(mask, g, 0.0).T, g32, preferred_element_type=jnp.float32))
    return dx.astype(x.dtype), jnp.stack(dws).astype(w.dtype), None, None, None


_parent_core_cidx.defvjp(_parent_cidx_fwd, _parent_cidx_bwd)


# ---- Masked-shift fused sparse conv lives in ops/msconv.py -----------------


# ---- Parent-map conv (k2s2 transpose: one contributor per output row) ------


@partial(jax.custom_vjp, nondiff_argnums=())
def _parent_core(x, w, parent, kslot):
    return _parent_fwd_impl(x, w, parent, kslot)


def _parent_fwd_impl(x, w, parent, kslot):
    g = jnp.take(x, parent, axis=0)  # (n_out, cin)
    acc = jnp.zeros((parent.shape[0], w.shape[2]), jnp.float32)
    for k in range(w.shape[0]):
        gk = jnp.where((kslot == k)[:, None], g, jnp.zeros((), g.dtype))
        acc = acc + jnp.dot(gk, w[k], preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def _parent_fwd(x, w, parent, kslot):
    return _parent_fwd_impl(x, w, parent, kslot), (x, w, parent, kslot)


def _parent_bwd(res, g_out):
    x, w, parent, kslot = res
    n_in = x.shape[0]
    k_num = w.shape[0]
    g32 = g_out.astype(jnp.float32)
    g = jnp.take(x, parent, axis=0).astype(jnp.float32)
    dg = jnp.zeros((parent.shape[0], x.shape[1]), jnp.float32)
    dws = []
    for k in range(k_num):
        mask = (kslot == k)[:, None]
        dg = dg + jnp.where(mask, jnp.dot(g32, w[k].astype(jnp.float32).T, preferred_element_type=jnp.float32), 0.0)
        dws.append(jnp.dot(jnp.where(mask, g, 0.0).T, g32, preferred_element_type=jnp.float32))
    scatter_to = jnp.where(kslot < k_num, parent, n_in)
    dx = jnp.zeros((n_in, x.shape[1]), jnp.float32).at[scatter_to].add(dg, mode="drop")
    return dx.astype(x.dtype), jnp.stack(dws).astype(w.dtype), None, None


_parent_core.defvjp(_parent_fwd, _parent_bwd)


def sparse_conv_parent(x, w, pmap, bias=None, idx_down=None):
    """Apply a transpose conv through a ParentMap (one parent per out row).

    idx_down: optional companion down map for a gather-only backward.
    """
    assert pmap.num_slots == w.shape[0]
    if idx_down is not None:
        out = _parent_core_cidx(x, w, pmap.parent, pmap.kslot, idx_down)
    else:
        out = _parent_core(x, w, pmap.parent, pmap.kslot)
    if bias is not None:
        out = out + bias
    return out


def pointwise_conv(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Kernel-size-1 conv == dense matmul over the feature dim."""
    if w.ndim == 3:
        assert w.shape[0] == 1
        w = w[0]
    out = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def sparse_avg_pool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Average pooling over a kernel map: mean of existing neighbors.

    Equivalent of ME.MinkowskiAvgPooling (reference models/modules/common.py:239).
    """

    def step(acc, ik):
        s, c = acc
        g = _gather_rows(x, ik).astype(jnp.float32)
        return (s + g, c + (ik >= 0).astype(jnp.float32)[:, None]), None

    s0 = jnp.zeros((idx.shape[1], x.shape[1]), dtype=jnp.float32)
    c0 = jnp.zeros((idx.shape[1], 1), dtype=jnp.float32)
    (s, c), _ = lax.scan(step, (s0, c0), idx)
    return (s / jnp.maximum(c, 1.0)).astype(x.dtype)


def sparse_sum_pool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Sum pooling over a kernel map (ME.MinkowskiSumPooling equivalent)."""

    def step(acc, ik):
        return acc + _gather_rows(x, ik).astype(jnp.float32), None

    s0 = jnp.zeros((idx.shape[1], x.shape[1]), dtype=jnp.float32)
    s, _ = lax.scan(step, s0, idx)
    return s.astype(x.dtype)


def sparse_max_pool(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Max pooling over a kernel map (missing neighbors ignored)."""
    neg = jnp.finfo(jnp.float32).min

    def step(acc, ik):
        g = _gather_rows(x, ik).astype(jnp.float32)
        g = jnp.where((ik >= 0)[:, None], g, neg)
        return jnp.maximum(acc, g), None

    m0 = jnp.full((idx.shape[1], x.shape[1]), neg, dtype=jnp.float32)
    m, _ = lax.scan(step, m0, idx)
    return jnp.where(m == neg, 0.0, m).astype(x.dtype)
