"""Windowed one-hot gather-GEMM sparse conv — the Pallas/MXU fast path.

The XLA gather engine moves ~4.4 ns/row fused and falls to ~14 ns/row once
the source table passes ~150 MB (PERF.md). This kernel removes row-gathers
from the hot path entirely: sorted keys make each (dx, dy) offset column's
anchors LOCAL (p99.9 |anchor - out_row| ~ 9k on ScanNet-like scenes), so a
1024-row output tile reads each column through a ~1.5k-row VMEM window and
selects rows with a ONE-HOT matmul on the MXU:

    out_tile += (iota == rel_anchor) @ window @ W_col      (bf16, f32 accum)

Columns are grouped by dx (3 windows per tile: dx = -1, 0, +1 — a column's
window offset is dominated by the x displacement in the sort order), so a
tile costs 3 window DMAs + 9 selector matmuls. The windows read the SAME
masked-shift table T3 = [x_prev*m_prev | x | x_next*m_next] used by
ops/msconv.py, so one anchored select serves a column's 3 kernel slots.
Anchors that fall outside their tile's window are routed by the host into
the shared COO leftover list (0.17% at margin 8k); missing-anchor guards
simply never match the iota. Replaces MinkowskiEngine's gather-GEMM
(reference models/modules/common.py:179-236) with systolic-array work:
~2.3 TFLOP(bf16) per 262k-voxel C=96 conv ~ 6 ms vs ~30 ms gather-bound.

Backward reuses the structure: dX is the same kernel with column-mirrored
transposed weights (symmetric region, see ops/msconv.py), and dW is a
second kernel accumulating window^T selector products per column.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from languagegroundedsemseg_tpu.ops.msconv import (
    MSMeta,
    _mirror_w,
    _ov_dw_pieces,
    _ov_fwd,
    _t3,
    _wstack,
)

TILE = 1024     # output rows per grid step
WIN = 1536      # window rows per column group
N_GROUPS = 3    # dx = -1, 0, +1
VMEM_LIMIT = 32 * 1024 * 1024


def _vmem_estimate(cw_pad: int, c_out: int) -> int:
    """Rough per-step VMEM footprint: window + selector + weights + dW
    accumulator + gathered block + out tile + anchors."""
    return (
        N_GROUPS * WIN * cw_pad * 2  # window buffers (bf16)
        + TILE * WIN * 2            # selector (bf16)
        + 9 * cw_pad * c_out * 6    # weight stack (bf16) + dW accum (f32)
        + TILE * cw_pad * 4         # selected rows (f32)
        + 2 * TILE * c_out * 4      # out tile + grad tile
        + 8 * TILE * 4              # anchors block
    )


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _t3_padded(t3, cw_pad: int, rows_pad: int):
    """Masked-shift table in bf16, channel- and row-padded for DMA tiling."""
    t = t3[:-1]  # (cap, 3C); guards never match the iota
    cap, cw = t.shape
    t = jnp.pad(t, ((0, rows_pad - cap), (0, cw_pad - cw)))
    return t.astype(jnp.bfloat16)


def _stack_w_padded(w, cols, cw_pad: int, dtype):
    """(K, C, Cout) -> (9, cw_pad, Cout): center column first."""
    c = w.shape[1]
    stacks = []
    for ka, kb, kc in cols:
        s = jnp.concatenate([w[ka], w[kb], w[kc]], axis=0)
        stacks.append(jnp.pad(s, ((0, cw_pad - 3 * c), (0, 0))))
    return jnp.stack(stacks).astype(dtype)


def _fwd_kernel(n_cols_per_group, wstart_ref, anchors_ref, t3_ref, w_ref,
                out_ref, win, sem):
    t = pl.program_id(0)
    b = TILE
    # all three window DMAs in flight before any compute (latency hiding)
    dmas, starts = [], []
    for g in range(N_GROUPS):
        ws = pl.multiple_of(wstart_ref[t * N_GROUPS + g], 8)
        starts.append(ws)
        dma = pltpu.make_async_copy(
            t3_ref.at[pl.ds(ws, WIN), :], win.at[g], sem.at[g])
        dma.start()
        dmas.append(dma)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    col = 0
    for g in range(N_GROUPS):
        ws = starts[g]
        dmas[g].wait()
        wb = win[g].astype(jnp.bfloat16)
        for _ in range(n_cols_per_group[g]):
            if col == 0:  # center column: anchors are the identity
                rel = (
                    jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
                    + t * b - ws
                )
            else:
                rel = anchors_ref[col - 1, :] - ws
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (b, WIN), 1)
                == rel[:, None]
            ).astype(jnp.bfloat16)
            # project the window FIRST (row selection commutes with the
            # linear map): WIN x cw @ cw x Cout is ~3x cheaper than
            # selecting cw-wide rows and projecting the selection
            proj = jnp.dot(wb, w_ref[col], preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(
                sel, proj.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            col += 1
    out_ref[:] = acc


def _dw_kernel(n_cols_per_group, wstart_ref, anchors_ref, t3_ref, gout_ref,
               dw_ref, win, sem):
    t = pl.program_id(0)
    b = TILE

    @pl.when(t == 0)
    def _():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    dmas, starts = [], []
    for g in range(N_GROUPS):
        ws = pl.multiple_of(wstart_ref[t * N_GROUPS + g], 8)
        starts.append(ws)
        dma = pltpu.make_async_copy(
            t3_ref.at[pl.ds(ws, WIN), :], win.at[g], sem.at[g])
        dma.start()
        dmas.append(dma)
    gout = gout_ref[:].astype(jnp.bfloat16)
    col = 0
    for g in range(N_GROUPS):
        ws = starts[g]
        dmas[g].wait()
        wb = win[g].astype(jnp.bfloat16)
        for _ in range(n_cols_per_group[g]):
            if col == 0:
                rel = (
                    jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)[:, 0]
                    + t * b - ws
                )
            else:
                rel = anchors_ref[col - 1, :] - ws
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (b, WIN), 1)
                == rel[:, None]
            ).astype(jnp.bfloat16)
            # dW = win^T @ (sel^T @ gout): scatter-by-selector first, then
            # one window-sized contraction (same reorder as the forward)
            st = jax.lax.dot_general(
                sel, gout,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (WIN, c_out)
            dw_ref[col] += jax.lax.dot_general(
                wb, st.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            col += 1


def _run_fwd(wstart, anchors, t3p, wstk, n_tiles, cap, c_out, meta_groups,
             interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, c_out), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_GROUPS, WIN, t3p.shape[1]), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((N_GROUPS,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, meta_groups),
        out_shape=jax.ShapeDtypeStruct((cap, c_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(wstart, anchors, t3p, wstk)


def _run_dw(wstart, anchors, t3p, gout, n_tiles, cap, cw_pad, c_out,
            meta_groups, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, TILE), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TILE, c_out), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cw_pad, c_out), lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_GROUPS, WIN, cw_pad), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((N_GROUPS,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, meta_groups),
        out_shape=jax.ShapeDtypeStruct((9, cw_pad, c_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(wstart, anchors, t3p, gout)


class OHMeta(NamedTuple):
    cols: Tuple[Tuple[int, int, int], ...]
    mirror_perm: Tuple[int, ...]
    groups: Tuple[int, int, int]  # columns per dx group (center group first)
    ov_seg: int
    interpret: bool


def _ms_meta(meta: OHMeta) -> MSMeta:
    return MSMeta(meta.cols, meta.mirror_perm, meta.ov_seg)


def _oh_fwd_impl(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out, ov_off,
                 meta: OHMeta):
    cap, c = x.shape
    c_out = w.shape[2]
    cw_pad = _pad128(3 * c)
    n_tiles = cap // TILE
    rows_pad = cap + WIN  # window starts are clamped to <= cap
    t3 = _t3(x, mp, mn, mc)
    t3p = _t3_padded(t3, cw_pad, rows_pad)
    wstk = _stack_w_padded(w, meta.cols, cw_pad, jnp.bfloat16)
    acc = _run_fwd(wstart, anchors, t3p, wstk, n_tiles, cap, c_out,
                   meta.groups, interpret=meta.interpret)
    acc = acc + _ov_fwd(t3, _wstack(w, meta.cols), ov_in, ov_out, ov_off,
                        cap, c_out, meta.ov_seg)
    return acc * mc[:, None]


def _oh_dw_impl(x, g32, mp, mn, mc, anchors, wstart, ov_in, ov_out, ov_off,
                meta: OHMeta, k_num):
    cap, c = x.shape
    c_out = g32.shape[1]
    cw_pad = _pad128(3 * c)
    n_tiles = cap // TILE
    t3 = _t3(x, mp, mn, mc)
    t3p = _t3_padded(t3, cw_pad, cap + WIN)
    dws = _run_dw(wstart, anchors, t3p, g32.astype(jnp.float32), n_tiles,
                  cap, cw_pad, c_out, meta.groups, interpret=meta.interpret)
    dw = [None] * k_num
    for gi, (ka, kb, kc) in enumerate(meta.cols):
        for j, k in enumerate((ka, kb, kc)):
            piece = dws[gi, j * c:(j + 1) * c]
            dw[k] = piece if dw[k] is None else dw[k] + piece
    for gi, dcol in _ov_dw_pieces(t3, g32, ov_in, ov_out, ov_off,
                                  len(meta.cols) - 1, meta.ov_seg):
        ka, kb, kc = meta.cols[gi + 1]
        for j, k in enumerate((ka, kb, kc)):
            dw[k] = dw[k] + dcol[j * c:(j + 1) * c]
    zero = jnp.zeros((c, c_out), jnp.float32)
    return jnp.stack([zero if d is None else d for d in dw])


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def _oh_core(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out, ov_off, meta):
    return _oh_fwd_impl(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out,
                        ov_off, meta).astype(x.dtype)


def _oh_fwd(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out, ov_off, meta):
    out = _oh_fwd_impl(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out,
                       ov_off, meta).astype(x.dtype)
    return out, (x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out, ov_off)


def _oh_bwd(meta: OHMeta, res, g_out):
    x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out, ov_off = res
    g32 = g_out.astype(jnp.float32)
    wt = _mirror_w(w, _ms_meta(meta))
    dx = _oh_fwd_impl(g32, wt, mp, mn, mc, anchors, wstart, ov_in, ov_out,
                      ov_off, meta)
    dw = _oh_dw_impl(x, g32 * mc[:, None], mp, mn, mc, anchors, wstart,
                     ov_in, ov_out, ov_off, meta, w.shape[0])
    return (dx.astype(x.dtype), dw.astype(w.dtype)) + (None,) * 8


_oh_core.defvjp(_oh_fwd, _oh_bwd)


def onehot_window_conv(x, w, msmap, bias=None, interpret=None):
    """Apply a stride-1 k3 conv through a window-annotated MaskedShiftMap.

    Requires msmap.wstart (built when cap >= 4 * TILE); returns None when
    the map has no window annotation or shapes don't divide — caller falls
    back to masked-shift / flat. bf16 compute, f32 accumulation.
    """
    if getattr(msmap, "wstart", None) is None or msmap.wstart.size == 0:
        return None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if _vmem_estimate(_pad128(3 * x.shape[1]), w.shape[2]) > 20 * 1024 * 1024:
        return None  # wide channels: masked-shift handles the small levels
    cap = x.shape[0]
    if cap % TILE or cap // TILE != msmap.wstart.shape[0] // N_GROUPS:
        return None
    meta = OHMeta(tuple(msmap.cols), tuple(msmap.mirror_perm),
                  tuple(msmap.col_groups), int(msmap.ov_seg), interpret)
    out = _oh_core(
        x, w, msmap.mp, msmap.mn, msmap.mc, msmap.anchors, msmap.wstart,
        msmap.ov_in, msmap.ov_out, msmap.ov_off, meta,
    )
    if bias is not None:
        out = out + bias * msmap.mc[:, None]
    return out
