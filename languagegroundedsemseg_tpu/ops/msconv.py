"""Masked-shift fused sparse convolution — the TPU fast path for stride-1
hypercube kernels.

Cost model (measured, PERF.md round 2): a gather fused into a matmul costs
~4.4 ns/row independent of row width and index locality, provided the
source table stays under the fast-table byte budget (~150 MB); the flat
path (ops/spconv.py) pays that per kernel slot — 26 gathered rows per
output voxel for a 3^3 kernel. This path exploits the sorted-key layout
(z varies fastest, so a voxel's z+-1 neighbors are its physical array
neighbors when present) to serve each (dx, dy) offset column with ONE
gathered row from

    T3 = [x_prev * m_prev | x | x_next * m_next]    (cap+1 rows, 3C)

where m_prev[r]/m_next[r] are host-built masks zeroing the shifted columns
whenever the physical neighbor is not the true z+-1 neighbor. The center
column needs no gather at all (its anchors are the identity, so T3's own
rows are its triples). Anchor rows are each column's dz=0 kernel-map
entries; outputs whose dz=0 neighbor is missing but a dz=+-1 neighbor
exists are handled by a host-compacted COO leftover list (gather +
per-slot masked matmuls + sorted segment_sum). Per output voxel: 8 fused
gathered rows + ~1.4 leftover rows instead of 26.

Replaces MinkowskiEngine's per-slot gather-GEMM for the stride-1 convs
(reference models/modules/common.py:179-236).

Backward is gather-only and reuses the SAME tables: the offset region is
symmetric, so the transpose pair-set {(i, o, mirror(k))} equals the map's
own pair-set, and dX = masked_shift_fwd(dOut, W') with W'[k] =
W[mirror(k)]^T. dW re-gathers the fused rows and contracts on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class MSMeta(NamedTuple):
    """Static (hashable) part of a MaskedShiftMap.

    cols: slot triples (kA, kB, kC) in ascending dz; cols[0] is the center
    column (identity anchors — served without a gather). mirror_perm:
    offsets[p[k]] == -offsets[k]. lo_slots: slot ids appearing in the
    slot-major leftover COO, in segment order. seg_cap: static bound on
    any slot's segment length.
    """

    cols: Tuple[Tuple[int, int, int], ...]
    mirror_perm: Tuple[int, ...]
    lo_slots: Tuple[int, ...]
    seg_cap: int = 0


def _t3(x, mp, mn):
    """(cap, C) -> (cap+1, 3C) masked-shift table with zero guard row."""
    xp = jnp.roll(x, 1, axis=0) * mp[:, None].astype(x.dtype)
    xn = jnp.roll(x, -1, axis=0) * mn[:, None].astype(x.dtype)
    t = jnp.concatenate([xp, x, xn], axis=1)
    return jnp.concatenate([t, jnp.zeros((1, t.shape[1]), x.dtype)], axis=0)


def _wstack(w, cols):
    """(K, C, C') -> (len(cols), 3C, C') stacking each column's 3 slots."""
    return jnp.stack(
        [jnp.concatenate([w[ka], w[kb], w[kc]], axis=0) for ka, kb, kc in cols]
    )


def _leftover_fwd(x, w, lo_in, lo_out, lo_slot, lo_off, lo_slots, n_out,
                  c_out, seg_cap):
    """COO leftovers: out[lo_out] += x[lo_in] @ w[lo_slot].

    The COO is SLOT-MAJOR (host-sorted by (slot, out)); ``lo_off[j]`` is the
    start of lo_slots[j]'s segment and ``seg_cap`` a static bound on any
    segment length. Each slot is ONE un-masked matmul over a dynamic slice
    of the gathered rows, written back with dynamic_update_slice: a row's
    last writer is the slot that owns it (segments ascend, so the last j
    with off_j <= p is exactly p's segment), which makes the overlapping
    fixed-size writes correct without any per-row selects — the select
    chain was the dominant leftover cost. Tail guards gather the zero row.
    """
    p_rows = lo_in.shape[0]
    xg = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    g = jnp.take(xg, lo_in, axis=0)
    contrib = jnp.zeros((p_rows, c_out), jnp.float32)
    for j, k in enumerate(lo_slots):
        off = lo_off[j]
        seg = jax.lax.dynamic_slice(g, (off, 0), (seg_cap, g.shape[1]))
        res = jnp.dot(seg, w[k], preferred_element_type=jnp.float32)
        contrib = jax.lax.dynamic_update_slice(contrib, res, (off, 0))
    return jax.ops.segment_sum(
        contrib, lo_out, num_segments=n_out + 1, indices_are_sorted=False
    )[:-1]


def _ms_fwd_impl(x, w, mp, mn, anchors, lo_in, lo_out, lo_slot, lo_off,
                 meta: MSMeta):
    n = x.shape[0]
    c_out = w.shape[2]
    t3 = _t3(x, mp, mn)
    ws = _wstack(w, meta.cols)
    # center column: T3 rows are exactly the outputs' triples — no gather
    acc = jnp.dot(t3[:-1], ws[0], preferred_element_type=jnp.float32)

    def body(a, gw):
        i, wk = gw
        return a + jnp.dot(jnp.take(t3, i, axis=0), wk,
                           preferred_element_type=jnp.float32), None

    acc, _ = lax.scan(body, acc, (anchors, ws[1:]))
    acc = acc + _leftover_fwd(x, w, lo_in, lo_out, lo_slot, lo_off,
                              meta.lo_slots, n, c_out, meta.seg_cap)
    return acc


def _mirror_w(w, meta: MSMeta):
    """Transpose-conv weights: W'[k] = W[mirror(k)]^T."""
    perm = jnp.asarray(meta.mirror_perm)
    return jnp.swapaxes(w.astype(jnp.float32)[perm], 1, 2)


def _ms_dw_impl(x, g32, mp, mn, anchors, lo_in, lo_out, lo_slot, lo_off, meta, k_num):
    """dW[k] = gathered_k^T @ dOut, re-gathering the fused rows."""
    c_in = x.shape[1]
    t3 = _t3(x, mp, mn)
    dw = [None] * k_num

    def put(col, dwg):
        for j, k in enumerate(col):
            piece = dwg[j * c_in:(j + 1) * c_in]
            dw[k] = piece if dw[k] is None else dw[k] + piece

    put(meta.cols[0], jax.lax.dot_general(
        t3[:-1], g32, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    for gi, col in enumerate(meta.cols[1:]):
        g = jnp.take(t3, anchors[gi], axis=0)
        put(col, jax.lax.dot_general(
            g, g32, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    # leftover dW: per-slot segment outer products (slot-major COO; rows
    # beyond a slot's segment are zeroed by an iota row mask since sums —
    # unlike the forward's overwrites — would corrupt)
    xg = jnp.concatenate([x, jnp.zeros((1, c_in), x.dtype)], axis=0)
    gl = jnp.take(xg, lo_in, axis=0).astype(jnp.float32)
    g_pad = jnp.concatenate(
        [g32, jnp.zeros((1, g32.shape[1]), jnp.float32)], axis=0)
    go = jnp.take(g_pad, lo_out, axis=0)
    seg_cap = meta.seg_cap
    row = jnp.arange(seg_cap)[:, None]
    for j, k in enumerate(meta.lo_slots):
        off = lo_off[j]
        length = lo_off[j + 1] - off
        sg = jax.lax.dynamic_slice(gl, (off, 0), (seg_cap, c_in))
        so = jax.lax.dynamic_slice(go, (off, 0), (seg_cap, go.shape[1]))
        sg = jnp.where(row < length, sg, 0.0)
        dk = jax.lax.dot_general(
            sg, so,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw[k] = dk if dw[k] is None else dw[k] + dk
    zero = jnp.zeros((c_in, g32.shape[1]), jnp.float32)
    return jnp.stack([zero if d is None else d for d in dw])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _ms_core(x, w, mp, mn, anchors, lo_in, lo_out, lo_slot, lo_off, meta):
    return _ms_fwd_impl(x, w, mp, mn, anchors, lo_in, lo_out, lo_slot,
                        lo_off, meta).astype(x.dtype)


def _ms_fwd(x, w, mp, mn, anchors, lo_in, lo_out, lo_slot, lo_off, meta):
    out = _ms_fwd_impl(x, w, mp, mn, anchors, lo_in, lo_out, lo_slot,
                       lo_off, meta).astype(x.dtype)
    return out, (x, w, mp, mn, anchors, lo_in, lo_out, lo_slot, lo_off)


def _ms_bwd(meta: MSMeta, res, g_out):
    x, w, mp, mn, anchors, lo_in, lo_out, lo_slot, lo_off = res
    g32 = g_out.astype(jnp.float32)
    wt = _mirror_w(w, meta)
    dx = _ms_fwd_impl(g32, wt, mp, mn, anchors, lo_in, lo_out, lo_slot,
                      lo_off, meta)
    dw = _ms_dw_impl(x, g32, mp, mn, anchors, lo_in, lo_out, lo_slot,
                     lo_off, meta, w.shape[0])
    return (dx.astype(x.dtype), dw.astype(w.dtype)) + (None,) * 7


_ms_core.defvjp(_ms_fwd, _ms_bwd)


# Above the fast-table byte budget the fused gathers fall off a cliff
# (measured: 131 MB fast, 151 MB already slow, 302 MB slow); flat or the
# one-hot kernel wins beyond it.
FAST_TABLE_BYTES = 140 * 1024 * 1024
# bf16 tables halve the footprint but bf16 gathers measured slow on their
# own (60 ms vs one-hot 24.8 at L0 C=96); opt-in only.
BF16_TABLE_FALLBACK = False


def masked_shift_conv(x, w, msmap, bias=None):
    """Apply a stride-1 k3 sparse conv through a MaskedShiftMap.

    When the f32 T3 table would exceed the fast-table byte budget but the
    bf16 table fits, the conv runs with bf16 inputs (f32 accumulation) —
    the same precision class as the one-hot kernel path. Returns None when
    even the bf16 table exceeds the budget (caller falls back).
    """
    itemsize = jnp.dtype(x.dtype).itemsize
    table_bytes = (x.shape[0] + 1) * 3 * x.shape[1] * itemsize
    if table_bytes > FAST_TABLE_BYTES:
        if (BF16_TABLE_FALLBACK and itemsize > 2
                and table_bytes // 2 <= FAST_TABLE_BYTES):
            x = x.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
        else:
            return None
    meta = MSMeta(tuple(msmap.cols), tuple(msmap.mirror_perm),
                  tuple(msmap.lo_slots), int(msmap.seg_cap))
    out = _ms_core(
        x, w, msmap.mp, msmap.mn, msmap.anchors,
        msmap.lo_in, msmap.lo_out, msmap.lo_slot, msmap.lo_off, meta,
    )
    out = out.astype(jnp.float32)
    if bias is not None:
        out = out + bias
    return out
