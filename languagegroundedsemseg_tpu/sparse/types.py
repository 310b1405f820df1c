"""Pytree containers for fixed-capacity sparse voxel grids.

Design: every array has a *static* capacity (padded); a scalar ``num`` tracks
the valid prefix. Kernel maps are padded int32 gather-index tables with -1 for
missing neighbors. This replaces MinkowskiEngine's dynamic SparseTensor /
kernel-map machinery (reference lib/train_test/pl_BaselineTrainer.py:300,
models/modules/common.py:192) with shapes XLA can compile once per bucket.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SparseLevel:
    """One stride level of the coordinate pyramid.

    coords: (capacity, 1 + d) int32 — (batch_idx, x, y, z[, t]); rows past
        ``num`` are padding (contents arbitrary, never referenced by maps).
    num: () int32 — number of valid rows.
    stride: static int — tensor stride (1, 2, 4, ... in voxel units).
    """

    coords: Optional[jnp.ndarray]
    num: jnp.ndarray
    stride: int = struct.field(pytree_node=False)
    # Explicit per-row validity (f32 {0,1}). When the sentinel expansion pass
    # (sparse/graph_host.py:expand_sentinels) interleaves zero rows into the
    # layout, valid rows are no longer a prefix and ``num`` counts layout
    # rows (real + sentinel); None keeps the prefix semantics.
    valid: Optional[jnp.ndarray] = None
    # Compact-batch alternative to shipping coords (production loaders,
    # sparse/graph_host.py:finalize_graph ship_coords=False): per-scene row
    # starts (B + 1,) int32 over this level's padded layout. Rows are
    # batch-major (sorted by packed key with the batch id in the top bits),
    # so the batch column of coords is recoverable from the boundaries —
    # the only part of coords the device compute path reads. Spatial
    # coordinates stay host-side; consumers that need them on device (CRF
    # wrappers, visualization dumps) require a ship_coords=True build.
    batch_starts: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        if self.coords is not None:
            return self.coords.shape[0]
        return self.valid.shape[0]

    def mask(self, dtype=jnp.float32) -> jnp.ndarray:
        """(capacity,) validity mask: 1 for real voxel rows, 0 for padding
        and sentinel rows."""
        if self.valid is not None:
            return self.valid.astype(dtype)
        return (jnp.arange(self.capacity) < self.num).astype(dtype)

    def bool_mask(self) -> jnp.ndarray:
        if self.valid is not None:
            return self.valid > 0
        return jnp.arange(self.capacity) < self.num

    @property
    def batch_idx(self) -> jnp.ndarray:
        """(capacity,) int32 scene id per row. Reads coords' batch column
        when shipped; compact batches recover it from the per-scene row
        boundaries (padding rows map to the last scene — every consumer
        masks them out via ``mask()``)."""
        if self.coords is not None:
            return self.coords[:, 0].astype(jnp.int32)
        starts = self.batch_starts
        rows = jnp.arange(self.capacity, dtype=jnp.int32)
        # number of interior boundaries at or below each row = scene id
        return jnp.sum(
            rows[:, None] >= starts[None, 1:-1], axis=1
        ).astype(jnp.int32)


@struct.dataclass
class KernelMap:
    """Padded neighbor-index table for one sparse conv geometry.

    idx: (K, out_capacity) int32 — for output row i and kernel slot k,
        ``idx[k, i]`` is the row in the *input* level's feature array that
        this slot gathers from, or -1 if the neighbor voxel doesn't exist
        (or the output row is padding).
    """

    idx: jnp.ndarray
    # Static slot whose map is the identity (the center offset of a stride-1
    # odd kernel); the conv op skips that gather entirely. -1 if none.
    center_slot: int = struct.field(pytree_node=False, default=-1)
    # Static permutation p with offsets[p[k]] == -offsets[k] (symmetric
    # regions only). Enables a gather-based backward: dX is the forward op
    # with W transposed and slots mirrored — no scatter-add (TPU scatters
    # measure ~4x slower than gathers). None if the region is asymmetric.
    mirror_perm: Optional[Tuple[int, ...]] = struct.field(pytree_node=False, default=None)
    # Name of the companion (transpose) map in the graph, for down/up conv
    # pairs whose backward uses the partner's map. None -> scatter fallback.
    companion: Optional[str] = struct.field(pytree_node=False, default=None)
    # From MapSpec.keep_flat (inverted): True when the spec declares no
    # consumer needs the flat table once a fused map serves the conv path
    # (pooling layers, e.g. models/resnet.py sum-pool, read the flat idx
    # directly and so pin keep_flat=True, the default).
    droppable: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_offsets(self) -> int:
        return self.idx.shape[0]

    @property
    def out_capacity(self) -> int:
        return self.idx.shape[1]


@struct.dataclass
class MaskedShiftMap:
    """Masked-shift fused kernel map for stride-1 hypercube (k3) convs.

    See ops/msconv.py for the cost model and algorithm. Sorted keys put a
    voxel's z+-1 neighbors in its physical prev/next rows whenever they
    exist, so the table T3 = [x_prev*mp | x*mc | x_next*mn] serves a whole
    (dx, dy) offset column with ONE gathered row anchored at the column's
    dz=0 kernel-map entry; host-built masks mp/mn zero the shifted columns
    where the physical neighbor is not the true z-neighbor. Outputs whose
    dz=0 neighbor is missing but a dz=+-1 neighbor exists anchor a
    *sentinel row* — a zero row the expansion pass interleaved at the run
    boundary (graph_host.py:expand_sentinels) whose mp/mn expose exactly
    the true neighbors — so the fused path is exact with no leftover COO.
    The symmetric region makes the backward the same structure on the same
    tables (mirrored transposed weights).

    mp, mn: (cap,) f32 in {0, 1} — physical prev/next row is a true
        z-1 / z+1 neighbor (real rows: of this row; sentinel rows: of the
        gap outputs that anchor them).
    mc: (cap,) f32 in {0, 1} — row is a real voxel (zeroes the center
        third at sentinel/pad rows so stale activations never leak).
    anchors: (G-1, cap) int32 — non-center columns' anchor rows (dz=0 map
        entry, or the boundary sentinel for gap outputs; guard = cap, the
        zero row of T3).
    ov_in / ov_out: (ov_cap + ov_seg,) int32 column-major COO for anchors
        the one-hot window kernel cannot reach (out-of-window outliers);
        ov_off: (G,) segment starts per non-center column. Guards carry
        in = cap, out = cap. The plain gather path ignores these (its
        anchors reach the whole table); the window kernel adds them back.
    cols: static (G, 3) slot triples in ascending dz, center column first.
    mirror_perm: static p with offsets[p[k]] == -offsets[k].
    """

    mp: jnp.ndarray
    mn: jnp.ndarray
    mc: jnp.ndarray
    anchors: jnp.ndarray
    ov_in: jnp.ndarray
    ov_out: jnp.ndarray
    ov_off: jnp.ndarray
    # Selector-kernel window annotation (ops/onehot_conv.py): per-(tile,
    # column) median-centered window starts, flattened (n_tiles * (G-1),)
    # in tile-major order; empty when no (tile, win) config fits the
    # anchor spread / overflow budget. ``tile``/``win`` are the static
    # geometry the starts were computed for.
    wstart: jnp.ndarray
    # Inverse anchors for the selector-kernel dW: inv_anchors[gi, r] = the
    # output row whose column-gi anchor is r (cap = none) — the anchor map
    # per column is injective, so this is exact. dW[col] = T3^T @ g[inv]
    # (see ops/onehot_conv.py). inv_wstart: window starts over the inverse
    # tiling; dwov_*: pairs outside the inverse windows (dW-only COO,
    # same column-major segment format as ov_*).
    inv_anchors: jnp.ndarray
    inv_wstart: jnp.ndarray
    dwov_in: jnp.ndarray
    dwov_out: jnp.ndarray
    dwov_off: jnp.ndarray
    cols: Tuple[Tuple[int, int, int], ...] = struct.field(pytree_node=False)
    mirror_perm: Tuple[int, ...] = struct.field(pytree_node=False)
    ov_seg: int = struct.field(pytree_node=False, default=0)
    dwov_seg: int = struct.field(pytree_node=False, default=0)
    # Static selector-kernel geometry: output rows per grid step / window
    # rows per column. 0 = no window annotation (gather paths only).
    tile: int = struct.field(pytree_node=False, default=0)
    win: int = struct.field(pytree_node=False, default=0)
    companion: Optional[str] = struct.field(pytree_node=False, default=None)

    @property
    def out_capacity(self) -> int:
        return self.mp.shape[0]


@struct.dataclass
class ParentMap:
    """Degenerate map where every output row has at most ONE contributing
    (input row, weight slot) pair — exactly the kernel-size-2 stride-2
    transpose convs of the Res16UNet decoder (each fine voxel has one coarse
    parent). One gather + K masked matmuls replace K gathers.

    parent: (cap_out,) int32 input row (0 if none).
    kslot: (cap_out,) int32 weight slot, or num_slots if no parent.
    """

    parent: jnp.ndarray
    kslot: jnp.ndarray
    num_slots: int = struct.field(pytree_node=False)
    companion: Optional[str] = struct.field(pytree_node=False, default=None)


@struct.dataclass
class ChildSumMap:
    """Child-sum annotation for strided (down) convs.

    The down map is a PARTITION of input rows — each input voxel
    contributes to exactly one (parent output, slot) pair — so the conv is

        out[o] = sum_{i : parent[i] == o} x[i] @ W[kslot[i]]
               = S @ P,   S[o, i] = (parent[i] == o),
                          P[i]    = x[i] @ W[kslot[i]].

    P comes from ONE GEMM over the one-hot slot stack
    [x * (kslot==0) | ... | x * (kslot==K-1)] @ [W_0; ...; W_K-1], and
    sorted keys make the children of consecutive outputs local in the
    input array, so S collapses to a single per-output-tile windowed
    sum-matmul on the MXU (ops/onehot_conv.py:_csum_kernel) — one window
    DMA per tile instead of one per (tile, slot), which is what made the
    previous per-slot selection design DMA-bound. Children outside their
    tile's window ride the ov COO; they can never double count because a
    foreign tile's window compares parent[i] against output rows outside
    parent[i]'s tile.

    The backward needs no window machinery either: dX is a ParentMap conv
    with transposed weights and dW is K masked contractions against
    g[parent] — both gather-only and exact over ALL pairs (kernel + ov).
    parent/kslot are the DOWN direction's partition (input row -> parent
    output row / slot), distinct from the companion up map's ParentMap;
    rows with no pair carry parent = cap_out, kslot = K (guards).

    ov_*: out-of-window entries, column(slot)-major segments, same device
    format as MaskedShiftMap.ov_* but gathering plain x rows.
    wstart: (n_tiles * n_groups,) int32, tile-major — 128-aligned window
    starts over input rows.

    n_groups > 1 splits the slots into contiguous groups of
    num_slots/n_groups (k2s2: group == the offset's dx half) with one
    window per (tile, group): children of one output split into one
    near-monotone input band per dx value, so per-group windows are ~5x
    tighter than one window over the interleaved union
    (graph_host._try_child_sum_map measures and the menu decides). The
    kernel derives each group's parent row from kslot on device — no
    extra wire bytes.
    """

    wstart: jnp.ndarray
    parent: jnp.ndarray
    kslot: jnp.ndarray
    ov_in: jnp.ndarray
    ov_out: jnp.ndarray
    ov_off: jnp.ndarray
    # Wire compaction (production builds): when ``parent`` ships uint16,
    # it holds block deltas against ``parent_base`` (one int32 min per
    # 128 input rows); guard rows decode via kslot == num_slots
    # (ops/onehot_conv.py:_abs_parent). Empty + int32 parent = absolute.
    parent_base: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(0, jnp.int32))
    num_slots: int = struct.field(pytree_node=False, default=0)
    out_capacity_s: int = struct.field(pytree_node=False, default=0)
    ov_seg: int = struct.field(pytree_node=False, default=0)
    tile: int = struct.field(pytree_node=False, default=0)
    win: int = struct.field(pytree_node=False, default=0)
    in_capacity: int = struct.field(pytree_node=False, default=0)
    companion: Optional[str] = struct.field(pytree_node=False, default=None)
    n_groups: int = struct.field(pytree_node=False, default=1)

    @property
    def out_capacity(self) -> int:
        return self.out_capacity_s


@struct.dataclass
class ConvGraph:
    """The full coordinate pyramid + all kernel maps a model needs.

    Built once per batch by the graph builder (host or device); reused by
    every conv in the forward/backward pass. Keys of ``maps`` are the map
    names declared in the model's GraphSpec (e.g. "l2.k3", "down1", "up3").
    ``gmaps`` holds the fused representations (MaskedShiftMap/ParentMap)
    for maps where fusion applies; convs prefer these.
    """

    levels: Tuple[SparseLevel, ...]
    maps: Mapping[str, KernelMap]
    gmaps: Mapping[str, Any] = struct.field(default_factory=dict)

    def level(self, i: int) -> SparseLevel:
        return self.levels[i]

    def map(self, name: str) -> KernelMap:
        return self.maps[name]


def level_capacities(graph: ConvGraph) -> Tuple[int, ...]:
    return tuple(l.capacity for l in graph.levels)


def graph_stats(graph: ConvGraph) -> dict[str, Any]:
    """Host-side debug summary (triggers device sync; do not call in jit)."""
    out = {}
    for i, lvl in enumerate(graph.levels):
        out[f"level{i}"] = dict(
            stride=lvl.stride, capacity=lvl.capacity, num=int(lvl.num)
        )
    for name, m in graph.maps.items():
        fill = float((m.idx >= 0).mean())
        out[f"map:{name}"] = dict(K=m.num_offsets, out_cap=m.out_capacity, fill=fill)
    return out
