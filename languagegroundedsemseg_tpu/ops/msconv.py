"""Masked-shift fused sparse convolution — the TPU fast path for stride-1
hypercube kernels.

Cost model (measured, PERF.md round 3): a row gather fused into a matmul
costs ~4.4 ns/row at <=128-lane rows and ~2-3x that for wider rows,
provided the source table stays under the fast-table byte budget
(~140 MB). The flat path (ops/spconv.py) pays one gathered row per kernel
slot — 26 per output voxel for a 3^3 kernel. This path exploits the
sorted-key layout (z varies fastest, so a voxel's z+-1 neighbors are its
physical array neighbors when present) to serve each (dx, dy) offset
column with ONE gathered row from

    T3 = [x_prev * mp | x * mc | x_next * mn]    (cap+1 rows, 3C)

where mp/mn are host-built per-row masks zeroing the shifted thirds
whenever the physical neighbor is not the true z-neighbor, and mc zeroes
the center third at sentinel/padding rows. The center column needs no
gather at all (its anchors are the identity). Outputs whose dz=0 neighbor
is missing anchor a *sentinel zero row* that the graph builder interleaved
at the run boundary (graph_host.py:expand_sentinels) — its masked thirds
expose exactly the true z+-1 neighbors, so the fused path is exact with
8 gathered rows per output voxel and NO leftover COO. The only residual
COO is the tiny window-overflow list (anchors too far from their output
for the windowed paths; ~<1% of entries), which every path adds back.

Tables larger than the fast-table budget fall off a measured gather cliff;
those run the same math over barriered static window slices (each window
under the budget), which restores most of the fused gather rate.

Replaces MinkowskiEngine's per-slot gather-GEMM for the stride-1 convs
(reference models/modules/common.py:179-236).

Backward is gather-only and reuses the SAME tables: the offset region is
symmetric, so the transpose pair-set {(i, o, mirror(k))} equals the map's
own pair-set, and dX = masked_shift_fwd(dOut, W') with W'[k] =
W[mirror(k)]^T — exact for any kernel/ov partition of the pairs, since
the forward algorithm sums over exactly the map's pairs. dW re-gathers
the fused rows and contracts on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Above the fast-table byte budget the fused gathers fall off a cliff
# (measured: 131 MB fast, 151 MB already slow, 302 MB slow); the windowed
# variant slices the table into under-budget barriered windows instead.
FAST_TABLE_BYTES = 140 * 1024 * 1024
# Window margin: every anchor the host keeps in the anchors array satisfies
# |anchor - out_row| <= GWIN_MARGIN (graph_host routes the rest to the ov
# COO), so a window of [w*SW - M, w*SW + SW + M) covers all its outputs'
# anchors for any SW. Must match graph_host._try_masked_shift_map.
GWIN_MARGIN = 16384


class MSMeta(NamedTuple):
    """Static (hashable) part of a MaskedShiftMap.

    cols: slot triples (kA, kB, kC) in ascending dz; cols[0] is the center
    column (identity anchors — served without a gather). mirror_perm:
    offsets[p[k]] == -offsets[k]. ov_seg: static bound on any ov column
    segment length.
    """

    cols: Tuple[Tuple[int, int, int], ...]
    mirror_perm: Tuple[int, ...]
    ov_seg: int = 0


def _t3(x, mp, mn, mc):
    """(cap, C) -> (cap+1, 3C) masked-shift table with zero guard row."""
    xp = jnp.roll(x, 1, axis=0) * mp[:, None].astype(x.dtype)
    xn = jnp.roll(x, -1, axis=0) * mn[:, None].astype(x.dtype)
    xc = x * mc[:, None].astype(x.dtype)
    t = jnp.concatenate([xp, xc, xn], axis=1)
    return jnp.concatenate([t, jnp.zeros((1, t.shape[1]), x.dtype)], axis=0)


def _wstack(w, cols):
    """(K, C, C') -> (len(cols), 3C, C') stacking each column's 3 slots."""
    return jnp.stack(
        [jnp.concatenate([w[ka], w[kb], w[kc]], axis=0) for ka, kb, kc in cols]
    )


def _gather_t3_rows(x, mp, mn, mc, idx):
    """Rows of T3 at ``idx`` WITHOUT materializing T3: three narrow fused
    gathers from x (plus mask gathers). An explicit ``take`` from the
    (cap+1, 3C) T3 forces XLA to materialize the whole table first —
    measured 12.9 ms of a 34.5 ms L0 conv — while per-third gathers from
    x fuse. The guard index (== cap) yields a zero row, matching T3's
    appended zero guard; the %cap wraparound matches jnp.roll (those rows
    are masked by mp/mn exactly as in _t3)."""
    cap = x.shape[0]
    dt = x.dtype
    valid = (idx < cap).astype(dt)[:, None]
    j = jnp.where(idx < cap, idx, 0)
    gp = jnp.take(x, (j - 1) % cap, axis=0) * (
        jnp.take(mp, j).astype(dt)[:, None] * valid)
    gc = jnp.take(x, j, axis=0) * (jnp.take(mc, j).astype(dt)[:, None] * valid)
    gn = jnp.take(x, (j + 1) % cap, axis=0) * (
        jnp.take(mn, j).astype(dt)[:, None] * valid)
    return jnp.concatenate([gp, gc, gn], axis=1)


def _ov_fwd(x, mp, mn, mc, ws, ov_in, ov_out, ov_off, n_out, c_out, ov_seg):
    """Window-overflow COO: out[ov_out] += T3[ov_in] @ ws[col].

    Column-major segments (ov_off[gi] = start of column gi's segment);
    each segment is one un-masked matmul over a dynamic slice of the
    gathered rows, written back with dynamic_update_slice overwrite
    semantics (segments ascend, so a row's last writer is its own
    column). Guard rows gather the zero row and scatter past n_out.
    """
    if ov_in.shape[0] == 0:
        return 0.0
    g = _gather_t3_rows(x, mp, mn, mc, ov_in)
    rows = g.shape[0]
    contrib = jnp.zeros((rows, c_out), jnp.float32)
    for gi in range(ws.shape[0] - 1):
        off = ov_off[gi]
        seg = lax.dynamic_slice(g, (off, 0), (ov_seg, g.shape[1]))
        res = jnp.dot(seg, ws[gi + 1], preferred_element_type=jnp.float32)
        contrib = lax.dynamic_update_slice(contrib, res, (off, 0))
    return jax.ops.segment_sum(
        contrib, ov_out, num_segments=n_out + 1, indices_are_sorted=False
    )[:-1]


# Minimum window width for the over-budget windowed variant (module-level so
# tests can shrink it together with GWIN_MARGIN to exercise the path at
# small capacities).
MIN_WINDOW_ROWS = 8192


def _gather_window_plan(cap: int, row_bytes: int):
    """Static window slicing for over-budget tables: (SW, n_win) or None
    when even a minimal window exceeds the budget (flat fallback)."""
    budget_rows = FAST_TABLE_BYTES // max(row_bytes, 1)
    min_sw = MIN_WINDOW_ROWS
    if budget_rows < 2 * GWIN_MARGIN + min_sw + 1:
        return None
    sw = (budget_rows - 2 * GWIN_MARGIN - 1) // min_sw * min_sw
    sw = min(sw, cap)
    return sw, -(-cap // sw)


def _ms_fwd_impl(x, w, mp, mn, mc, anchors, ov_in, ov_out, ov_off,
                 meta: MSMeta):
    cap = x.shape[0]
    c_out = w.shape[2]
    cw = 3 * x.shape[1]
    t3 = _t3(x, mp, mn, mc)
    ws = _wstack(w, meta.cols)
    # center column: T3 rows are exactly the outputs' triples — no gather
    acc0 = jnp.dot(t3[:-1], ws[0], preferred_element_type=jnp.float32)

    table_bytes = (cap + 1) * cw * jnp.dtype(x.dtype).itemsize
    if table_bytes <= FAST_TABLE_BYTES:
        def body(a, gw):
            i, wk = gw
            return a + jnp.dot(jnp.take(t3, i, axis=0), wk,
                               preferred_element_type=jnp.float32), None

        acc, _ = lax.scan(body, acc0, (anchors, ws[1:]))
    else:
        plan = _gather_window_plan(cap, cw * jnp.dtype(x.dtype).itemsize)
        if plan is None:
            raise ValueError(
                "masked_shift_conv: table over budget and unwindowable "
                "(caller should have used the flat path)")
        sw, n_win = plan
        m = GWIN_MARGIN
        t3pad = jnp.concatenate(
            [jnp.zeros((m, cw), x.dtype), t3[:-1],
             jnp.zeros((n_win * sw - cap + m, cw), x.dtype)], axis=0)
        guard_rel = sw + 2 * m
        outs = []
        for wi in range(n_win):
            lo = wi * sw
            size = min(sw, cap - lo)
            win = lax.concatenate(
                [lax.slice_in_dim(t3pad, lo, lo + sw + 2 * m, axis=0),
                 jnp.zeros((1, cw), x.dtype)], 0)
            win = lax.optimization_barrier(win)
            acc = lax.slice_in_dim(acc0, lo, lo + size, axis=0)
            for k in range(anchors.shape[0]):
                a = lax.slice_in_dim(anchors[k], lo, lo + size, axis=0)
                rel = jnp.where(a >= cap, guard_rel, a - (lo - m))
                acc = acc + jnp.dot(jnp.take(win, rel, axis=0), ws[k + 1],
                                    preferred_element_type=jnp.float32)
            outs.append(acc)
        acc = jnp.concatenate(outs, axis=0)

    acc = acc + _ov_fwd(x, mp, mn, mc, ws, ov_in, ov_out, ov_off, cap,
                        c_out, meta.ov_seg)
    return acc * mc[:, None]


def _mirror_w(w, meta: MSMeta):
    """Transpose-conv weights: W'[k] = W[mirror(k)]^T."""
    perm = jnp.asarray(meta.mirror_perm)
    return jnp.swapaxes(w.astype(jnp.float32)[perm], 1, 2)


def _ms_dw_impl(x, g32, mp, mn, mc, anchors, ov_in, ov_out, ov_off,
                meta: MSMeta, k_num):
    """dW[k] = gathered_k^T @ dOut, re-gathering the fused rows."""
    c_in = x.shape[1]
    cap = x.shape[0]
    t3 = _t3(x, mp, mn, mc)
    dw = [None] * k_num

    def put(col, dwg):
        for j, k in enumerate(col):
            piece = dwg[j * c_in:(j + 1) * c_in]
            dw[k] = piece if dw[k] is None else dw[k] + piece

    put(meta.cols[0], lax.dot_general(
        t3[:-1], g32, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    for gi, col in enumerate(meta.cols[1:]):
        g = jnp.take(t3, anchors[gi], axis=0)
        put(col, lax.dot_general(
            g, g32, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    for gi, dcol in _ov_dw_pieces(x, mp, mn, mc, g32, ov_in, ov_out,
                                  ov_off, len(meta.cols) - 1, meta.ov_seg):
        put(meta.cols[gi + 1], dcol)
    zero = jnp.zeros((c_in, g32.shape[1]), jnp.float32)
    return jnp.stack([zero if d is None else d for d in dw])


def _ov_dw_pieces(x, mp, mn, mc, g32, ov_in, ov_out, ov_off, n_cols,
                  ov_seg):
    """ov dW: per-column segment outer products (rows beyond a segment are
    zeroed by an iota row mask since sums — unlike the forward's overwrites
    — would corrupt). Yields (column index, (3C, Cout) piece)."""
    if not ov_in.shape[0]:
        return
    cap = x.shape[0]
    gl = _gather_t3_rows(x, mp, mn, mc, ov_in).astype(jnp.float32)
    g_pad = jnp.concatenate(
        [g32, jnp.zeros((1, g32.shape[1]), jnp.float32)], axis=0)
    go = jnp.take(g_pad, jnp.minimum(ov_out, cap), axis=0)
    row = jnp.arange(ov_seg)[:, None]
    for gi in range(n_cols):
        off = ov_off[gi]
        length = ov_off[gi + 1] - off
        sg = lax.dynamic_slice(gl, (off, 0), (ov_seg, gl.shape[1]))
        so = lax.dynamic_slice(go, (off, 0), (ov_seg, go.shape[1]))
        sg = jnp.where(row < length, sg, 0.0)
        yield gi, lax.dot_general(
            sg, so,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _ms_core(x, w, mp, mn, mc, anchors, ov_in, ov_out, ov_off, meta):
    return _ms_fwd_impl(x, w, mp, mn, mc, anchors, ov_in, ov_out, ov_off,
                        meta).astype(x.dtype)


def _ms_fwd(x, w, mp, mn, mc, anchors, ov_in, ov_out, ov_off, meta):
    out = _ms_fwd_impl(x, w, mp, mn, mc, anchors, ov_in, ov_out, ov_off,
                       meta).astype(x.dtype)
    return out, (x, w, mp, mn, mc, anchors, ov_in, ov_out, ov_off)


def _ms_bwd(meta: MSMeta, res, g_out):
    x, w, mp, mn, mc, anchors, ov_in, ov_out, ov_off = res
    g32 = g_out.astype(jnp.float32)
    wt = _mirror_w(w, meta)
    # dX: same pair structure with mirrored transposed weights. The T3
    # build masks g's center third with mc, which is exactly the forward's
    # output masking applied on the o side; the trailing *mc zeroes
    # sentinel-row grads (their x never contributes).
    dx = _ms_fwd_impl(g32, wt, mp, mn, mc, anchors, ov_in, ov_out, ov_off,
                      meta)
    dw = _ms_dw_impl(x, g32 * mc[:, None], mp, mn, mc, anchors,
                     ov_in, ov_out, ov_off, meta, w.shape[0])
    return (dx.astype(x.dtype), dw.astype(w.dtype)) + (None,) * 7


_ms_core.defvjp(_ms_fwd, _ms_bwd)


def _abs_anchors(anchors):
    """Decode delta-shipped anchors. Production builds ship anchors as
    int16 row deltas (|anchor - out| <= GWIN_MARGIN after routing, with
    -32768 as the guard; sparse/graph_host.py) — expand back to absolute
    int32 row ids on device. int32 anchors pass through unchanged."""
    if anchors.dtype != jnp.int16:
        return anchors
    cap = anchors.shape[-1]
    rows = jnp.arange(cap, dtype=jnp.int32)
    a = rows + anchors.astype(jnp.int32)
    return jnp.where(anchors == jnp.int16(-32768), cap, a)


def masked_shift_conv(x, w, msmap, bias=None):
    """Apply a stride-1 k3 sparse conv through a MaskedShiftMap.

    Exact (sentinel rows serve every gap case; the ov COO serves window
    outliers). Over-budget tables run the windowed variant; returns None
    only when even that is impossible (caller falls back to flat).
    """
    itemsize = jnp.dtype(x.dtype).itemsize
    cw_bytes = 3 * x.shape[1] * itemsize
    table_bytes = (x.shape[0] + 1) * cw_bytes
    if (table_bytes > FAST_TABLE_BYTES
            and _gather_window_plan(x.shape[0], cw_bytes) is None):
        return None
    meta = MSMeta(tuple(msmap.cols), tuple(msmap.mirror_perm),
                  int(msmap.ov_seg))
    out = _ms_core(
        x, w, msmap.mp, msmap.mn, msmap.mc, _abs_anchors(msmap.anchors),
        msmap.ov_in, msmap.ov_out, msmap.ov_off, meta,
    )
    out = out.astype(jnp.float32)
    if bias is not None:
        out = out + bias * msmap.mc[:, None]
    return out
