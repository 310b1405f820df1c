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


@partial(jax.custom_vjp, nondiff_argnums=())
def _conv_core(x: jnp.ndarray, w: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return _conv_fwd_impl(x, w, idx)


def _conv_fwd_impl(x, w, idx):
    n_out = idx.shape[1]
    c_out = w.shape[2]

    def step(acc, kw):
        wk, ik = kw
        g = _gather_rows(x, ik)
        acc = acc + jnp.dot(g, wk, preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((n_out, c_out), dtype=jnp.float32)
    acc, _ = lax.scan(step, acc0, (w, idx))
    return acc.astype(x.dtype)


def _conv_fwd(x, w, idx):
    return _conv_fwd_impl(x, w, idx), (x, w, idx)


def _conv_bwd(res, g_out):
    x, w, idx = res
    n_in = x.shape[0]
    g32 = g_out.astype(jnp.float32)

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

    dx0 = jnp.zeros((n_in, x.shape[1]), dtype=jnp.float32)
    dx, dw = lax.scan(step, dx0, (w, idx))
    return dx.astype(x.dtype), dw.astype(w.dtype), None


_conv_core.defvjp(_conv_fwd, _conv_bwd)


def sparse_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    idx: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Apply a sparse convolution.

    x: (cap_in, Cin) features (rows past the valid count may be garbage —
       they are never referenced because kernel maps only index valid rows).
    w: (K, Cin, Cout) kernel weights, slot order = the kernel map's offset
       order.
    idx: (K, cap_out) int32 kernel map (-1 = missing neighbor).
    Returns (cap_out, Cout); padding output rows (all slots -1) are exactly 0
    before bias.
    """
    assert w.ndim == 3 and idx.ndim == 2 and w.shape[0] == idx.shape[0], (
        f"w {w.shape} vs idx {idx.shape}"
    )
    out = _conv_core(x, w, idx)
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
    valid = (idx >= 0).astype(jnp.float32)

    def step(acc, ik):
        s, c = acc
        g = _gather_rows(x, ik).astype(jnp.float32)
        return (s + g, c + (ik >= 0).astype(jnp.float32)[:, None]), None

    s0 = jnp.zeros((idx.shape[1], x.shape[1]), dtype=jnp.float32)
    c0 = jnp.zeros((idx.shape[1], 1), dtype=jnp.float32)
    (s, c), _ = lax.scan(step, (s0, c0), idx)
    del valid
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
