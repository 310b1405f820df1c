"""Selector-kernel sparse conv — the Pallas/MXU fast path for wide channels.

The XLA gather engine moves ~4.4 ns/row fused and falls to ~14 ns/row once
the source table passes ~150 MB (PERF.md). This path removes row-gathers
from the hot path entirely and splits the conv into two MXU stages:

1. **Pre-projection (XLA, full-efficiency GEMM).** The masked-shift table
   T3 = [x_prev*mp | x | x_next*mn] (ops/msconv.py) serves a whole (dx, dy)
   offset column's 3 kernel slots with one row, so the conv becomes
   out[o] = sum_cols P_col[anchor_col(o)] with P_col = T3 @ W_col — eight
   (cap, 3C) @ (3C, Cout) GEMMs computed once, outside the kernel, at the
   MXU's native efficiency. The center column needs no selection at all
   (its anchors are the identity): acc0 = T3 @ W_center.

2. **Selection (Pallas).** Sorted keys make each column's anchors LOCAL
   (within a tile of consecutive outputs the anchor spread is small), so a
   TILE-row output tile reads each column's P through a small VMEM window
   and selects rows with a one-hot matmul on the MXU:

       acc_tile += (iota == anchor - wstart) @ P_col[wstart : wstart+WIN]

   Window geometry (tile, win) is chosen per map by the host from a menu
   (sparse/graph_host.py:_WINDOW_MENU) — selector FLOPs scale linearly
   with ``win``, so the tightest window whose out-of-window anchor count
   fits the overflow COO budget wins. Out-of-window anchors ride the COO
   leftover list; guard anchors (= cap) can never land inside a window
   because starts are clamped to cap - win.

Replaces MinkowskiEngine's gather-GEMM (reference
models/modules/common.py:179-236) with systolic-array work.

Backward:
  - dX is the same two stages over T3(g) with column-mirrored transposed
    weights (symmetric region — identical pair set, see ops/msconv.py).
  - dW uses the host-built INVERSE anchor map: the per-column anchor map is
    injective, so dW_col = T3^T @ G_col with G_col[r] = g[inv_col(r)] —
    the same selection kernel gathers g through windows over the inverse
    tiling, then eight (3C, cap) @ (cap, Cout) XLA GEMMs contract. Pairs
    outside the inverse windows ride the dW-only dwov COO.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
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

VMEM_LIMIT = 64 * 1024 * 1024
VMEM_BUDGET = 24 * 1024 * 1024


def _vmem_estimate(n_cols: int, tile: int, win: int, c_out: int) -> int:
    """Per-step VMEM footprint: double-buffered column windows (bf16) +
    selector (bf16) + acc/out tiles (f32) + anchors block."""
    return (
        2 * n_cols * win * c_out * 2
        + tile * win * 2
        + 3 * tile * c_out * 4
        + n_cols * tile * 4
    )


def _sel_fwd_kernel(n_cols, c_run, wstart_ref, anchors_ref, mc_ref,
                    center_ref, src_ref, out_ref, win, sem):
    """Select + accumulate over the fused projection table.

    src_ref is the single (cap, (n_cols+1)*c_run) bf16 projection P = T3 @
    [W_center | W_col1 | ... | W_col8]: ONE full-efficiency GEMM outside
    the kernel instead of 9 (T3 is read once, and the separate f32 acc0
    round-trip disappears). Column c's window is the lane-block slice
    [ws : ws+wn, (c+1)*c_run : (c+2)*c_run] — lane offsets are multiples
    of c_run (itself a multiple of the 128 lane tile), so HBM slices stay
    aligned. center_ref is the same array's block-0 lane slice delivered
    through the grid pipeline (no manual DMA needed: its rows are exactly
    the output tile's rows).

    The column windows are DOUBLE-BUFFERED across grid steps (win/sem have
    a leading 2-slot axis): step t computes from slot t%2 while slot
    (t+1)%2 fills with tile t+1's windows, so the manual DMAs overlap the
    previous step's selector matmuls instead of serializing with them
    (measured ~1.5x on the shipped L0 conv).
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    b = out_ref.shape[0]
    wn = win.shape[2]

    def dma(slot, tile, c):
        ws = pl.multiple_of(wstart_ref[tile * n_cols + c], 8)
        return ws, pltpu.make_async_copy(
            src_ref.at[pl.ds(ws, wn), pl.ds((c + 1) * c_run, c_run)],
            win.at[slot, c], sem.at[slot, c])

    @pl.when(t == 0)
    def _first():
        for c in range(n_cols):
            dma(0, t, c)[1].start()

    @pl.when(t + 1 < nt)
    def _next():
        for c in range(n_cols):
            dma((t + 1) % 2, t + 1, c)[1].start()

    acc = center_ref[:].astype(jnp.float32)
    slot = t % 2
    for c in range(n_cols):
        ws, d = dma(slot, t, c)
        d.wait()
        rel = anchors_ref[c, :] - ws
        sel = (
            lax.broadcasted_iota(jnp.int32, (b, wn), 1) == rel[:, None]
        ).astype(jnp.bfloat16)
        acc = acc + jnp.dot(sel, win[slot, c],
                            preferred_element_type=jnp.float32)
    # fold the real-row mask into the epilogue: kills the center block's
    # garbage at sentinel rows and saves a separate full-size multiply
    # pass after the kernel (ov entries only ever target mc=1 rows)
    out_ref[:] = acc * mc_ref[0, :][:, None]


def _dw_kernel(n_cols, wstart_ref, inv_anchors_ref, t3_ref, g_ref, out_ref,
               win, sem):
    """Fully fused dW: out[c] = sum_tiles T3_tile^T @ (onehot(inv) @ g_win).

    The output block (n_cols, 3C, c_run) stays resident in VMEM and
    accumulates across the whole grid (constant index_map), so the old
    intermediate — a (n_cols, cap, c_run) selected-gradient tensor written
    to and re-read from HBM (1.2 GB at L0 bench shapes) plus 8 follow-up
    XLA GEMMs re-reading T3 — disappears; T3 streams through once as
    pipelined tile blocks and g through the per-column windows.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    b = t3_ref.shape[0]
    wn = win.shape[2]

    @pl.when(t == 0)
    def _init():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def dma(slot, tile, c):
        ws = pl.multiple_of(wstart_ref[tile * n_cols + c], 8)
        return ws, pltpu.make_async_copy(
            g_ref.at[pl.ds(ws, wn), :], win.at[slot, c], sem.at[slot, c])

    @pl.when(t == 0)
    def _first():
        for c in range(n_cols):
            dma(0, t, c)[1].start()

    @pl.when(t + 1 < nt)
    def _next():
        for c in range(n_cols):
            dma((t + 1) % 2, t + 1, c)[1].start()

    slot = t % 2
    t3b = t3_ref[:]
    gsels = []
    for c in range(n_cols):
        ws, d = dma(slot, t, c)
        d.wait()
        rel = inv_anchors_ref[c, :] - ws
        # rows with no inverse pair (guard) miss the window -> zero row
        sel = (
            lax.broadcasted_iota(jnp.int32, (b, wn), 1) == rel[:, None]
        ).astype(jnp.bfloat16)
        gsels.append(jnp.dot(
            sel, win[slot, c],
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    # one wide contraction per tile instead of n_cols narrow ones
    gall = jnp.concatenate(gsels, axis=1)  # (b, n_cols * c_run)
    part = lax.dot_general(
        t3b, gall, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (cw, n_cols * c_run)
    cw = t3_ref.shape[1]
    c_run = win.shape[3]
    for c in range(n_cols):
        out_ref[c] += part[:, c * c_run:(c + 1) * c_run]


def _run_sel_fwd(wstart, anchors, mc, pall, n_cols, tile, winw, interpret,
                 out_rows=None):
    # out_rows: output tiling length; defaults to pall's row count (the k3
    # same-level case). Strided (down) convs select from a LONGER input
    # projection: anchors/mc/out are (out_rows,)-sized, windows and the
    # (zero) center block still index pall's rows.
    cap = pall.shape[0] if out_rows is None else out_rows
    c_run = pall.shape[1] // (n_cols + 1)
    n_tiles = cap // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_cols, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            # center lane-block of pall, pipelined (same array rides again
            # below as ANY for the manual per-column window DMAs)
            pl.BlockSpec((tile, c_run), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, c_run), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n_cols, winw, c_run), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, n_cols)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_sel_fwd_kernel, n_cols, c_run),
        out_shape=jax.ShapeDtypeStruct((cap, c_run), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    # Mosaic can't cast uint8 in-kernel — cast the tiny mask outside
    )(wstart, anchors, mc.reshape(1, cap).astype(jnp.float32), pall, pall)


def _run_dw_fused(inv_wstart, inv_anchors, t3b, g, tile, winw, interpret):
    """dW partials per column: (n_cols, 3C, c_run) f32 = sum over output
    tiles of T3^T @ g[inv]. t3b: (cap, 3C) bf16; g: (cap, c_run) bf16."""
    n_cols = inv_anchors.shape[0]
    cap, cw = t3b.shape
    c_out = g.shape[1]
    n_tiles = cap // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_cols, tile), lambda t, *_: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, cw), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # constant index_map: the dW accumulator stays resident in VMEM
        # across all grid steps (standard reduction pattern)
        out_specs=pl.BlockSpec((n_cols, cw, c_out), lambda t, *_: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n_cols, winw, c_out), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, n_cols)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dw_kernel, n_cols),
        out_shape=jax.ShapeDtypeStruct((n_cols, cw, c_out), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(inv_wstart, inv_anchors, t3b, g)


_TPU_PROBE: dict = {}


def _on_tpu() -> bool:
    """True when a trace built here will execute on the TPU. Checks the
    default_device override as well as the backend: trainer.init_on_cpu
    runs inits under ``jax.default_device(cpu)`` while the process backend
    is still "tpu" — emitting a real pallas_call there is a CPU-lowering
    error, so those traces must take the gather fallbacks."""
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
        return False
    return jax.default_backend() == "tpu"


def _tpu_kernels_ok() -> bool:
    """One-time probe: compile + run tiny selector kernels on the real TPU.

    A Mosaic/toolchain incompatibility would otherwise surface as a compile
    error inside the WHOLE model's jit; probing lets routing fall back to
    the gather paths instead. Result is cached per process.
    """
    if "ok" not in _TPU_PROBE:

        def _probe():
            import numpy as _np

            cap, tile, winw, c_out, n_cols = 1024, 256, 512, 128, 2
            wstart = jnp.zeros((cap // tile * n_cols,), jnp.int32)
            anchors = jnp.tile(jnp.arange(cap, dtype=jnp.int32), (n_cols, 1))
            pall = jnp.ones((cap, (n_cols + 1) * c_out), jnp.bfloat16)
            mcp = jnp.ones((cap,), jnp.uint8)
            out = _run_sel_fwd(wstart, anchors, mcp, pall, n_cols, tile,
                               winw, False)
            g = jnp.ones((cap, c_out), jnp.bfloat16)
            t3b = jnp.ones((cap, 96), jnp.bfloat16)  # unaligned 3C on purpose
            out2 = _run_dw_fused(wstart, anchors, t3b, g, tile, winw, False)
            # child-sum kernel incl. the n_groups=2 split layout
            pg = jnp.zeros((2, cap), jnp.int32)
            ws2 = jnp.zeros((512 // 128 * 2,), jnp.int32)
            out3 = _run_csum(ws2, pg, pall[:, :c_out], 512, 128, winw, 2,
                             False)
            # force real execution (block_until_ready alone can return
            # early under the axon relay)
            return bool(
                _np.isfinite(float(out[0, 0]))
                and _np.isfinite(float(out2[0, 0, 0]))
                and _np.isfinite(float(out3[0, 0]))
            )

        try:
            # Routing runs at trace time, so this usually executes inside
            # another jit's trace. JAX trace contexts are thread-local:
            # run the probe in a worker thread so its pallas_calls compile
            # and execute for real instead of being staged into the outer
            # trace (which would raise and silently cache "kernel broken",
            # pinning every conv to the gather paths).
            import concurrent.futures as _cf

            with _cf.ThreadPoolExecutor(max_workers=1) as _ex:
                # generous: a cold remote compile of the probe kernels can
                # take minutes under axon, and a TIMEOUT here pins the
                # whole process to the ~2x-slower gather paths
                _TPU_PROBE["ok"] = _ex.submit(_probe).result(timeout=1200)
        except Exception as e:  # noqa: BLE001 — any failure: don't route here
            _TPU_PROBE["ok"] = False
            _TPU_PROBE["error"] = repr(e)
        if not _TPU_PROBE["ok"]:
            import warnings

            # Loud: a silent probe failure degrades every conv to the
            # gather paths (~2x slower end to end).
            warnings.warn(
                "selector-kernel TPU probe failed — falling back to gather "
                f"conv paths: {_TPU_PROBE.get('error', 'non-finite output')}",
                RuntimeWarning,
                stacklevel=2,
            )
    return _TPU_PROBE["ok"]


class OHMeta(NamedTuple):
    cols: Tuple[Tuple[int, int, int], ...]
    mirror_perm: Tuple[int, ...]
    ov_seg: int
    dwov_seg: int
    tile: int
    win: int
    interpret: bool


def _ms_meta(meta: OHMeta) -> MSMeta:
    return MSMeta(meta.cols, meta.mirror_perm, meta.ov_seg)


def _ov_from_pall(pall, n_cols, ov_in, ov_out, ov_off, cap):
    """Overflow COO served straight from the projection table: the entry
    (col, o, i)'s contribution is exactly P_col[i] — one narrow gather of
    the already-computed pall rows + a segment sum, instead of re-gathering
    3C-wide T3 rows and running 8 per-column GEMM segments (measured
    8.5 ms -> <1 ms at L0 bench shapes)."""
    if ov_in.shape[0] == 0:
        return 0.0
    c_run = pall.shape[1] // (n_cols + 1)
    n = ov_in.shape[0]
    # per-entry column from the segment offsets (entries are column-major)
    col = jnp.searchsorted(ov_off[1:-1], jnp.arange(n, dtype=jnp.int32),
                           side="right").astype(jnp.int32)
    valid = ov_in < cap
    flat = jnp.where(valid, ov_in * (n_cols + 1) + col + 1, 0)
    p3 = pall.reshape(cap * (n_cols + 1), c_run)
    g = jnp.take(p3, flat, axis=0).astype(jnp.float32)
    g = jnp.where(valid[:, None], g, 0.0)
    return jax.ops.segment_sum(
        g, ov_out, num_segments=cap + 1, indices_are_sorted=False)[:-1]


def _oh_fwd_impl(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out, ov_off,
                 meta: OHMeta):
    cap = x.shape[0]
    wstk = _wstack(w, meta.cols)  # (G, 3C, c_out) f32
    # ONE fused projection GEMM for all 9 columns (center block first):
    # T3 is read once and the separate f32 center round-trip disappears.
    # T3 builds directly in bf16 — the masks are {0,1}, so
    # (x*m).astype(bf16) == x.astype(bf16)*m exactly, and the f32
    # (cap, 3C) round-trip (680 MB at L0 bench shapes) disappears. The
    # barrier keeps XLA from fusing the T3 build INTO the GEMM: in
    # isolation the fused form wins (5.4 vs 6.7 ms,
    # scripts/bench_proj_micro.py) but in the full conv composition it
    # REGRESSES ~7 ms (the fused prologue re-reads x per K-panel);
    # bf16 preferred_element_type fuses the output cast into the GEMM
    # epilogue (saves a full f32 round-trip of the 9-column table).
    t3b = lax.optimization_barrier(
        _t3(x.astype(jnp.bfloat16), mp, mn, mc)[:-1])
    wall = jnp.concatenate(list(wstk), axis=1).astype(jnp.bfloat16)
    pall = jnp.dot(t3b, wall, preferred_element_type=jnp.bfloat16)
    acc = _run_sel_fwd(wstart, anchors, mc, pall, wstk.shape[0] - 1,
                       meta.tile, meta.win, meta.interpret)
    # ov entries only target mc=1 rows (sentinel outputs carry guard
    # anchors by construction), so no mask is needed after the kernel's
    # fused epilogue multiply.
    return acc + _ov_from_pall(pall, wstk.shape[0] - 1, ov_in, ov_out,
                               ov_off, cap)


def _oh_dw_impl(x, g32, mp, mn, mc, inv_anchors, inv_wstart,
                dwov_in, dwov_out, dwov_off, meta: OHMeta, k_num):
    c = x.shape[1]
    dw = [None] * k_num

    def put(col, dwg):
        for j, k in enumerate(col):
            piece = dwg[j * c:(j + 1) * c]
            dw[k] = piece if dw[k] is None else dw[k] + piece

    # bf16 T3 only (see _oh_fwd_impl) — the center contraction runs with
    # bf16 operands / f32 accumulation, matching the fused dW kernel's
    # precision for the other 8 columns.
    t3b = lax.optimization_barrier(
        _t3(x.astype(jnp.bfloat16), mp, mn, mc)[:-1])
    gb = g32.astype(jnp.bfloat16)
    put(meta.cols[0], lax.dot_general(
        t3b, gb, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))
    dwcols = _run_dw_fused(inv_wstart, inv_anchors, t3b, gb,
                           meta.tile, meta.win, meta.interpret)
    for gi, col in enumerate(meta.cols[1:]):
        put(col, dwcols[gi])
    for gi, dcol in _ov_dw_pieces(x, mp, mn, mc, g32, dwov_in, dwov_out,
                                  dwov_off, len(meta.cols) - 1,
                                  meta.dwov_seg):
        put(meta.cols[gi + 1], dcol)
    zero = jnp.zeros((c, g32.shape[1]), jnp.float32)
    return jnp.stack([zero if d is None else d for d in dw])


@functools.partial(jax.custom_vjp, nondiff_argnums=(15,))
def _oh_core(x, w, mp, mn, mc, anchors, wstart, inv_anchors, inv_wstart,
             ov_in, ov_out, ov_off, dwov_in, dwov_out, dwov_off, meta):
    return _oh_fwd_impl(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out,
                        ov_off, meta).astype(x.dtype)


def _oh_fwd(x, w, mp, mn, mc, anchors, wstart, inv_anchors, inv_wstart,
            ov_in, ov_out, ov_off, dwov_in, dwov_out, dwov_off, meta):
    out = _oh_fwd_impl(x, w, mp, mn, mc, anchors, wstart, ov_in, ov_out,
                       ov_off, meta).astype(x.dtype)
    return out, (x, w, mp, mn, mc, anchors, wstart, inv_anchors, inv_wstart,
                 ov_in, ov_out, ov_off, dwov_in, dwov_out, dwov_off)


def _entry_cols(off, n):
    """Column id per packed-COO entry from the per-column offsets (entry j
    lives in column c iff off[c] <= j < off[c+1]; end-padding entries map
    past the last column and get dropped by the scatters' mode="drop")."""
    j = jnp.arange(n, dtype=jnp.int32)
    return jnp.sum(j[:, None] >= off[None, 1:], axis=1).astype(jnp.int32)


def _inv_from_anchors(anchors, ov_in, ov_out, ov_off, dwov_in, dwov_off):
    """Rebuild the dW inverse tiling on device. Production builds ship a
    0-width inv_anchors (sparse/graph_host.py — it is a pure function of
    (anchors, ov, dwov), and dropping it saves ~30% of the batch's H2D
    bytes): pre-routing anchors = final anchors with the ov entries
    restored; the inverse is its per-column scatter (injective per column
    over the complete pair set); dwov positions are re-guarded exactly as
    the host's _route_bad did."""
    n_cols, cap = anchors.shape
    a_full = anchors
    if ov_in.shape[0]:
        ci = _entry_cols(ov_off, ov_in.shape[0])
        a_full = a_full.at[ci, ov_out].set(ov_in, mode="drop")
    rows = jnp.arange(n_cols, dtype=jnp.int32)[:, None]
    o = jnp.broadcast_to(jnp.arange(cap, dtype=jnp.int32)[None, :],
                         (n_cols, cap))
    inv = jnp.full((n_cols, cap), cap, jnp.int32)
    inv = inv.at[rows, a_full].set(o, mode="drop")
    if dwov_in.shape[0]:
        cj = _entry_cols(dwov_off, dwov_in.shape[0])
        inv = inv.at[cj, dwov_in].set(cap, mode="drop")
    return inv


def _oh_bwd(meta: OHMeta, res, g_out):
    (x, w, mp, mn, mc, anchors, wstart, inv_anchors, inv_wstart,
     ov_in, ov_out, ov_off, dwov_in, dwov_out, dwov_off) = res
    if inv_anchors.shape[1] == 0:
        inv_anchors = _inv_from_anchors(anchors, ov_in, ov_out, ov_off,
                                        dwov_in, dwov_off)
    g32 = g_out.astype(jnp.float32)
    wt = _mirror_w(w, _ms_meta(meta))
    # dX: same pair structure with mirrored transposed weights (exact for
    # any kernel/COO partition of the pairs — see ops/msconv.py). The dX
    # kernel's lane width is c_in — pad to the 128 lane tile like the
    # forward does for c_out, and slice back.
    c_in = x.shape[1]
    ci_pad = (-c_in) % 128
    if ci_pad:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, ci_pad)))
    dx = _oh_fwd_impl(g32, wt, mp, mn, mc, anchors, wstart, ov_in, ov_out,
                      ov_off, meta)
    if ci_pad:
        dx = dx[:, :c_in]
    dw = _oh_dw_impl(x, g32 * mc[:, None], mp, mn, mc, inv_anchors,
                     inv_wstart, dwov_in, dwov_out, dwov_off, meta,
                     w.shape[0])
    return (dx.astype(x.dtype), dw.astype(w.dtype)) + (None,) * 13


_oh_core.defvjp(_oh_fwd, _oh_bwd)


def onehot_window_conv(x, w, msmap, bias=None, interpret=None):
    """Apply a stride-1 k3 conv through a window-annotated MaskedShiftMap.

    Requires the host's (tile, win) window annotation; returns None when
    the map has none, shapes don't divide, or the VMEM footprint is out of
    budget — caller falls back to masked-shift / flat. bf16 selection and
    projection, f32 accumulation.
    """
    tile, winw = int(getattr(msmap, "tile", 0)), int(getattr(msmap, "win", 0))
    if tile <= 0 or msmap.wstart.size == 0 or msmap.inv_wstart.size == 0:
        return None
    if interpret is None:
        # Off-TPU the interpreted kernel is far slower than the gather
        # paths — only run it when a caller (tests) asks explicitly.
        if not _on_tpu():
            return None
        if not _tpu_kernels_ok():
            return None
        interpret = False
    cap = x.shape[0]
    c_out = w.shape[2]
    n_cols = msmap.anchors.shape[0]
    if cap % tile or cap < winw:
        return None
    # Mosaic HBM memref slices must be 128-aligned in the lane dim: pad the
    # output channels of W to the next lane-tile multiple (the projection
    # GEMMs pad lanes to 128 internally anyway, so the extra columns are
    # near-free) and slice the result back. The pad/slice VJP pair keeps
    # dX/dW exact at the original width.
    c_pad = (-c_out) % 128
    c_run = c_out + c_pad
    if _vmem_estimate(n_cols, tile, winw, c_run) > VMEM_BUDGET:
        return None
    meta = OHMeta(tuple(msmap.cols), tuple(msmap.mirror_perm),
                  int(msmap.ov_seg), int(msmap.dwov_seg), tile, winw,
                  interpret)
    from languagegroundedsemseg_tpu.ops.msconv import _abs_anchors

    wp = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad))) if c_pad else w
    out = _oh_core(
        x, wp, msmap.mp, msmap.mn, msmap.mc, _abs_anchors(msmap.anchors),
        msmap.wstart, msmap.inv_anchors, msmap.inv_wstart,
        msmap.ov_in, msmap.ov_out, msmap.ov_off,
        msmap.dwov_in, msmap.dwov_out, msmap.dwov_off, meta,
    )
    if c_pad:
        out = out[:, :c_out]
    if bias is not None:
        out = out + bias * msmap.mc[:, None]
    return out


# ---- child-sum conv: strided (down) convs through one windowed sum-matmul -


class CSMeta(NamedTuple):
    n_slots: int
    ov_seg: int
    tile: int
    win: int
    interpret: bool
    n_groups: int = 1


def _csum_vmem_estimate(tile: int, win: int, c_out: int,
                        n_groups: int = 1) -> int:
    """Per-step VMEM for the child-sum kernel: it allocates ONE shared
    double-buffered projection window per slot GROUP (not one per slot
    like the k3 kernel modeled by _vmem_estimate) + the parent windows +
    selector + out tile."""
    return n_groups * (
        2 * win * c_out * 2   # (2, g, win, c_run) bf16 projection windows
        + 2 * win * 4         # (2, g, 1, win) int32 parent windows
        + tile * win * 2      # selector one-hot (bf16 intermediate)
    ) + 2 * tile * c_out * 4  # out tile f32 + acc headroom


def _ov_fwd_plain(x, w, ov_in, ov_out, ov_off, n_out, ov_seg):
    """Out-of-window COO for slot-window convs: out[o] += x[i] @ w[slot],
    column(slot)-major segments, guard in = cap_in / out = n_out."""
    if ov_in.shape[0] == 0:
        return 0.0
    cap_in = x.shape[0]
    valid = (ov_in < cap_in).astype(x.dtype)[:, None]
    g = jnp.take(x, jnp.where(ov_in < cap_in, ov_in, 0), axis=0) * valid
    contrib = jnp.zeros((g.shape[0], w.shape[2]), jnp.float32)
    for k in range(w.shape[0]):
        off = ov_off[k]
        seg = lax.dynamic_slice(g, (off, 0), (ov_seg, g.shape[1]))
        res = jnp.dot(seg, w[k], preferred_element_type=jnp.float32)
        contrib = lax.dynamic_update_slice(contrib, res, (off, 0))
    return jax.ops.segment_sum(
        contrib, ov_out, num_segments=n_out + 1, indices_are_sorted=False
    )[:-1]


def _csum_kernel(cap_out, n_groups, wstart_ref, *refs):
    """out_tile = sum_g S_g @ P_win_g with S_g[o, i] = (parent_g_win[i] == o).

    ONE windowed sum-matmul per (output tile, slot group) — vs one per
    (tile, slot) in a per-slot selection design, 8x less window DMA.
    Each group's parent rides as its own (1, cap_in) int32 row (Mosaic
    cannot 1-row-slice a stacked (G, cap_in) int32 memref: sublane tiling
    is 2) whose window slice broadcasts across the tile's output rows;
    rows with no pair IN THAT GROUP carry parent = cap_out (never
    matches), so groups can never double-count a pair. Double-buffered
    like _sel_fwd_kernel.
    """
    parent_refs = refs[:n_groups]
    p_ref, out_ref, win, pwin, sem, psem = refs[n_groups:]
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    b = out_ref.shape[0]
    wn = win.shape[2]

    def dma(slot, tile_i, g):
        ws = pl.multiple_of(wstart_ref[tile_i * n_groups + g], 128)
        return (
            pltpu.make_async_copy(p_ref.at[pl.ds(ws, wn), :],
                                  win.at[slot, g], sem.at[slot, g]),
            pltpu.make_async_copy(parent_refs[g].at[:, pl.ds(ws, wn)],
                                  pwin.at[slot, g], psem.at[slot, g]),
        )

    @pl.when(t == 0)
    def _first():
        for g in range(n_groups):
            for d in dma(0, t, g):
                d.start()

    @pl.when(t + 1 < nt)
    def _next():
        for g in range(n_groups):
            for d in dma((t + 1) % 2, t + 1, g):
                d.start()

    slot = t % 2
    rows = t * b + lax.broadcasted_iota(jnp.int32, (b, wn), 0)
    acc = None
    for g in range(n_groups):
        for d in dma(slot, t, g):
            d.wait()
        sel = (pwin[slot, g] == rows).astype(jnp.bfloat16)
        part = jnp.dot(sel, win[slot, g], preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out_ref[:] = acc


def _run_csum(wstart, parent_g, pall, cap_out, tile, winw, n_groups,
              interpret):
    cap_in, c_run = pall.shape
    n_tiles = cap_out // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            # per-group parent rows (1, cap_in), then pall
            *([pl.BlockSpec(memory_space=pl.ANY)] * n_groups),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((tile, c_run), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n_groups, winw, c_run), jnp.bfloat16),
            pltpu.VMEM((2, n_groups, 1, winw), jnp.int32),
            pltpu.SemaphoreType.DMA((2, n_groups)),
            pltpu.SemaphoreType.DMA((2, n_groups)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_csum_kernel, cap_out, n_groups),
        out_shape=jax.ShapeDtypeStruct((cap_out, c_run), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(wstart, *(parent_g[g].reshape(1, cap_in) for g in range(n_groups)),
      pall)


def _parent_groups(parent, kslot, n_slots, n_groups, cap_out):
    """(n_groups, cap_in) per-group parent rows for the windowed kernel:
    group g keeps rows whose slot falls in its contiguous slot range
    (k2s2 with n_groups=2: the offset's dx half — see
    graph_host._try_child_sum_map); all other rows (including kslot ==
    n_slots guards) read the never-matching cap_out."""
    cap_in = parent.shape[0]
    if n_groups == 1:
        return parent.reshape(1, cap_in)
    gsz = n_slots // n_groups
    grp = (kslot // gsz).astype(jnp.int32)  # guards land at n_groups
    gids = jnp.arange(n_groups, dtype=jnp.int32)[:, None]
    return jnp.where(grp[None, :] == gids, parent[None, :],
                     jnp.int32(cap_out))


def _cs_fwd_impl(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off,
                 cap_out, meta: CSMeta):
    c_run = w.shape[2]
    k = meta.n_slots
    xb = x.astype(jnp.bfloat16)
    # one-hot slot stack: row i contributes x[i] in block kslot[i] only, so
    # ONE GEMM computes P[i] = x[i] @ W[kslot[i]] for every row. Barriered
    # for the same reason as the k3 projection (see _oh_fwd_impl).
    xk = lax.optimization_barrier(jnp.concatenate(
        [xb * (kslot == j)[:, None].astype(jnp.bfloat16) for j in range(k)],
        axis=1))
    wflat = jnp.concatenate([w[j] for j in range(k)],
                            axis=0).astype(jnp.bfloat16)
    pall = jnp.dot(xk, wflat, preferred_element_type=jnp.bfloat16)
    parent_g = _parent_groups(parent, kslot, k, meta.n_groups, cap_out)
    acc = _run_csum(wstart, parent_g, pall, cap_out, meta.tile, meta.win,
                    meta.n_groups, meta.interpret)
    return acc + _ov_fwd_plain(x, w, ov_in, ov_out, ov_off, cap_out,
                               meta.ov_seg)


def _cs_scatter_impl(x, w, parent, kslot, cap_out):
    """Scatter fallback for the child-sum direction: exact over the full
    (parent, kslot) partition, no window machinery. Serves CPU/tests, maps
    without a window annotation (tile == 0), and VMEM-overflow rejections.
    P[i] = x[i] @ W[kslot[i]] via K masked matmuls; guard rows (kslot == K)
    never match a slot, so they contribute zero and their parent (cap_out)
    lands in the dropped scatter row."""
    x32 = x.astype(jnp.float32)
    p = jnp.zeros((x.shape[0], w.shape[2]), jnp.float32)
    for j in range(w.shape[0]):
        xj = jnp.where((kslot == j)[:, None], x32, 0.0)
        p = p + jnp.dot(xj, w[j].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scatter_to = jnp.minimum(parent, cap_out)
    out = jnp.zeros((cap_out + 1, w.shape[2]), jnp.float32)
    return out.at[scatter_to].add(p, mode="drop")[:cap_out]


def _cs_apply(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off, cap_out,
              meta: CSMeta):
    """Child-sum direction (fine rows -> coarse sums): windowed kernel when
    annotated (meta.tile > 0), scatter fallback otherwise. Used by the down
    conv forward AND the transpose (up) conv backward dX."""
    if meta.tile > 0:
        return _cs_fwd_impl(x, w, wstart, parent, kslot, ov_in, ov_out,
                            ov_off, cap_out, meta)
    return _cs_scatter_impl(x, w, parent, kslot, cap_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _cs_core(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off, cap_out,
             meta):
    return _cs_apply(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off,
                     cap_out, meta).astype(x.dtype)


def _cs_fwd(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off, cap_out,
            meta):
    out = _cs_apply(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off,
                    cap_out, meta).astype(x.dtype)
    return out, (x, w, parent, kslot)


def _cs_bwd(cap_out, meta: CSMeta, res, g_out):
    """Gather-only backward via the down map's input PARTITION: every input
    row belongs to exactly one (parent output, slot) pair, so dX is a
    ParentMap conv with transposed weights and dW is K masked contractions
    against g[parent] — no windows, no scatters, exact over all pairs
    (including the forward's out-of-window COO entries)."""
    from languagegroundedsemseg_tpu.ops.spconv import _parent_fwd_impl

    x, w, parent, kslot = res
    g32 = g_out.astype(jnp.float32)
    wt = jnp.swapaxes(w.astype(jnp.float32), 1, 2)  # (K, c_run, C)
    # guard rows carry parent = cap_out (one past the end); clip explicitly
    # so the (discarded — kslot never matches) gather is in-bounds by
    # construction rather than by JAX's OOB-clamp semantics
    n_out = g32.shape[0]
    pclip = jnp.clip(parent, 0, n_out - 1)
    dx = _parent_fwd_impl(g32, wt, pclip, kslot)
    gp = jnp.take(g32, pclip, axis=0)
    x32 = x.astype(jnp.float32)
    dws = []
    for k in range(meta.n_slots):
        gk = jnp.where((kslot == k)[:, None], gp, 0.0)
        dws.append(lax.dot_general(
            x32, gk, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dw = jnp.stack(dws)
    return (dx.astype(x.dtype), dw.astype(w.dtype)) + (None,) * 6


_cs_core.defvjp(_cs_fwd, _cs_bwd)


def _cs_route(csmap, c_out, cap_in, interpret):
    """Pick the child-sum execution path: (tile, win, c_pad, interpret) with
    tile == 0 meaning the scatter fallback. Never refuses: the (parent,
    kslot) partition alone is a complete representation of the map."""
    tile, winw = int(getattr(csmap, "tile", 0)), int(getattr(csmap, "win", 0))
    n_groups = int(getattr(csmap, "n_groups", 1))
    c_pad = (-c_out) % 128
    c_run = c_out + c_pad
    use_kernel = tile > 0 and csmap.wstart.size > 0
    if use_kernel and interpret is None:
        if not _on_tpu() or not _tpu_kernels_ok():
            use_kernel = False
        else:
            interpret = False
    if use_kernel and (csmap.out_capacity % tile or cap_in < winw):
        use_kernel = False
    if use_kernel and _csum_vmem_estimate(tile, winw, c_run,
                                          n_groups) > VMEM_BUDGET:
        use_kernel = False
    if not use_kernel:
        tile = winw = 0
        c_pad = 0
    return tile, winw, c_pad, bool(interpret)


def _abs_parent(csmap):
    """Decode the block-delta parent wire format (sparse/graph_host.py
    _try_child_sum_map compact mode): uint16 deltas against a per-128-row
    int32 base; guard rows (kslot == num_slots) decode to out_capacity.
    Absolute int32 parents pass through unchanged."""
    p = csmap.parent
    if p.dtype != jnp.uint16:
        return p
    n = p.shape[0]
    blk = jnp.take(csmap.parent_base,
                   jnp.arange(n, dtype=jnp.int32) >> 7, axis=0)
    dec = blk + p.astype(jnp.int32)
    guard = jnp.int32(csmap.out_capacity)
    return jnp.where(
        csmap.kslot.astype(jnp.int32) == csmap.num_slots, guard, dec)


def child_sum_conv(x, w, csmap, bias=None, interpret=None):
    """Apply a strided (down) conv through a ChildSumMap.

    Routes to the windowed selector kernel when the map carries a (tile,
    win) annotation and the VMEM budget allows; otherwise the scatter
    fallback (CPU/tests, unannotated maps). Always returns an array — the
    (parent, kslot) partition needs no flat-table fallback."""
    tile, winw, c_pad, interpret = _cs_route(csmap, w.shape[2], x.shape[0],
                                             interpret)
    cap_out = csmap.out_capacity
    meta = CSMeta(csmap.num_slots, int(csmap.ov_seg), tile, winw, interpret,
                  int(getattr(csmap, "n_groups", 1)) if tile else 1)
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, c_pad))) if c_pad else w
    out = _cs_core(x, wp, csmap.wstart, _abs_parent(csmap),
                   csmap.kslot, csmap.ov_in, csmap.ov_out, csmap.ov_off,
                   cap_out, meta)
    if c_pad:
        out = out[:, : w.shape[2]]
    if bias is not None:
        out = out + bias
    return out


# ---- transpose (up) conv through the companion down map's ChildSumMap ------
#
# The up map is the exact transpose of its companion down map: offsets
# negate elementwise (sparse/graph_host.py:_map_offsets returns
# -region_offsets in the SAME order for transpose maps), so the down
# partition's (parent, kslot) arrays serve the up conv directly:
#
#   up fwd:   out_fine[o]  = x_coarse[parent[o]] @ W[kslot[o]]
#   up bwd:   dX_coarse    = child-sum of g_fine with W^T (same windows)
#             dW[k]        = sum_{o: kslot[o]==k} x_coarse[parent[o]]^T g[o]
#
# This removes the up maps' flat tables (and their 8-probe host builds)
# entirely — replaces the reference's MinkowskiConvolutionTranspose consumed
# at models/modules/common.py:179-236.


def _tcs_fwd_impl(x, w, parent, kslot, cap_out):
    from languagegroundedsemseg_tpu.ops.spconv import _parent_fwd_impl

    pclip = jnp.clip(parent, 0, x.shape[0] - 1)
    return _parent_fwd_impl(x, w, pclip, kslot)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _tcs_core(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off, cap_out,
              meta):
    return _tcs_fwd_impl(x, w, parent, kslot, cap_out).astype(x.dtype)


def _tcs_fwd(x, w, wstart, parent, kslot, ov_in, ov_out, ov_off, cap_out,
             meta):
    out = _tcs_fwd_impl(x, w, parent, kslot, cap_out).astype(x.dtype)
    return out, (x, w, wstart, parent, kslot, ov_in, ov_out, ov_off)


def _tcs_bwd(cap_out, meta: CSMeta, res, g_out):
    """dX through the child-sum direction (windowed kernel when annotated);
    dW as K masked contractions against x gathered at parent — gather-only,
    mirroring _cs_bwd with x and g roles swapped."""
    x, w, wstart, parent, kslot, ov_in, ov_out, ov_off = res
    g32 = g_out.astype(jnp.float32)
    c_in = x.shape[1]
    ci_pad = (-c_in) % 128 if meta.tile > 0 else 0
    wt = jnp.swapaxes(w.astype(jnp.float32), 1, 2)  # (K, c_out, c_in)
    if ci_pad:
        wt = jnp.pad(wt, ((0, 0), (0, 0), (0, ci_pad)))
    dx = _cs_apply(g32, wt, wstart, parent, kslot, ov_in, ov_out, ov_off,
                   cap_out, meta)
    if ci_pad:
        dx = dx[:, :c_in]
    pclip = jnp.clip(parent, 0, x.shape[0] - 1)
    xp = jnp.take(x, pclip, axis=0).astype(jnp.float32)
    dws = []
    for k in range(meta.n_slots):
        xk = jnp.where((kslot == k)[:, None], xp, 0.0)
        dws.append(lax.dot_general(
            xk, g32, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dw = jnp.stack(dws)
    return (dx.astype(x.dtype), dw.astype(w.dtype)) + (None,) * 6


_tcs_core.defvjp(_tcs_fwd, _tcs_bwd)


def transpose_child_sum_conv(x, w, csmap, bias=None, interpret=None):
    """Apply a k2s2 transpose (up) conv through the companion DOWN map's
    ChildSumMap. x: (coarse cap, Cin); returns (fine cap, Cout) where fine
    cap == csmap.in_capacity. The backward's dX channel width is Cin, so
    routing checks the kernel budget at Cin."""
    tile, winw, _, interpret = _cs_route(csmap, w.shape[1],
                                         int(csmap.in_capacity), interpret)
    meta = CSMeta(csmap.num_slots, int(csmap.ov_seg), tile, winw, interpret,
                  int(getattr(csmap, "n_groups", 1)) if tile else 1)
    out = _tcs_core(x, w, csmap.wstart, _abs_parent(csmap), csmap.kslot,
                    csmap.ov_in, csmap.ov_out, csmap.ov_off,
                    csmap.out_capacity, meta)
    if bias is not None:
        out = out + bias
    return out
