"""Host-side (numpy) coordinate pyramid + kernel-map builder.

This is the production input-pipeline path: kernel maps depend only on
coordinates, so they are built on the host (vectorized numpy int64-key
searchsorted joins; a C++ builder plugs in behind the same API) while the
TPU runs the previous step. Mirrors what MinkowskiEngine's coordinate
manager computes on GPU (reference models/modules/common.py:192-203), but
with static capacities so the device graph never recompiles.

Key packing: (b, x, y, z) -> int64 with 16 bits per field. Coordinates must
lie in [-2^15, 2^15) and batch index in [0, 2^16) — comfortably above any
ScanNet scene at 2 cm voxels (~2000 voxels extent, reference
lib/datasets/scannet.py:442).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from languagegroundedsemseg_tpu.sparse.offsets import ConvKind, region_offsets
from languagegroundedsemseg_tpu.sparse.types import (
    ConvGraph,
    KernelMap,
    MaskedShiftMap,
    ParentMap,
    SparseLevel,
)

_COORD_OFF = 1 << 15
_FIELD_BITS = 16
_FIELD_MASK = (1 << _FIELD_BITS) - 1


# 4D (spatio-temporal) layout: b(12) | x(13) | y(13) | z(13) | t(12) = 63 bits
_BITS_4D = (12, 13, 13, 13, 12)
_OFF_4D = (0, 1 << 12, 1 << 12, 1 << 12, 1 << 11)


def pack_keys(coords: np.ndarray) -> np.ndarray:
    """Pack (N, 1+d) int (b, x, y, z[, t]) rows into unique int64 keys.

    d=3 uses the 16-bit-per-field layout (matches the C++ builder); d=4 packs
    (12,13,13,13,12) bits with signed offsets.
    """
    c = np.asarray(coords, dtype=np.int64)
    assert c.ndim == 2 and c.shape[1] in (4, 5), f"expected (N, 4|5), got {c.shape}"
    if c.shape[1] == 5:
        key = np.zeros(len(c), dtype=np.int64)
        shift = 0
        for col in range(4, -1, -1):
            bits, off = _BITS_4D[col], _OFF_4D[col]
            v = c[:, col] + off
            if v.size and (int(v.min()) < 0 or int(v.max()) >= (1 << bits)):
                raise ValueError(f"4D coord column {col} out of packable range")
            key |= v << shift
            shift += bits
        return key
    b = c[:, 0]
    xyz = c[:, 1:] + _COORD_OFF
    if xyz.size:
        lo, hi = int(xyz.min()), int(xyz.max())
        if lo < 0 or hi > _FIELD_MASK:
            raise ValueError(
                f"coordinates out of packable range [-32768, 32767]: "
                f"min={lo - _COORD_OFF}, max={hi - _COORD_OFF}"
            )
    return (
        (b << (3 * _FIELD_BITS))
        | (xyz[:, 0] << (2 * _FIELD_BITS))
        | (xyz[:, 1] << _FIELD_BITS)
        | xyz[:, 2]
    )


def unpack_keys(keys: np.ndarray, d: int = 3) -> np.ndarray:
    k = np.asarray(keys, dtype=np.int64)
    if d == 4:
        cols = []
        shift = 0
        for col in range(4, -1, -1):
            bits, off = _BITS_4D[col], _OFF_4D[col]
            cols.append(((k >> shift) & ((1 << bits) - 1)) - off)
            shift += bits
        return np.stack(cols[::-1], axis=1).astype(np.int32)
    b = k >> (3 * _FIELD_BITS)
    x = ((k >> (2 * _FIELD_BITS)) & _FIELD_MASK) - _COORD_OFF
    y = ((k >> _FIELD_BITS) & _FIELD_MASK) - _COORD_OFF
    z = (k & _FIELD_MASK) - _COORD_OFF
    return np.stack([b, x, y, z], axis=1).astype(np.int32)


def quantize(
    coords: np.ndarray,
    labels: Optional[np.ndarray] = None,
    ignore_label: int = 255,
    return_inverse: bool = False,
):
    """Deduplicate integer voxel coordinates.

    Equivalent of ME.utils.sparse_quantize as used by the reference voxelizer
    (lib/voxelizer.py:142): returns indices of one representative point per
    occupied voxel (first occurrence). If ``labels`` is given, voxels whose
    points disagree on the label get ``ignore_label`` (the consensus variant
    used at lib/voxelizer.py:284).

    Accepts (N, 3) single-sample coords (treated as batch 0) or (N, 4)
    batched coords.
    """
    c = np.asarray(coords)
    if c.shape[1] == 3:
        c = np.concatenate([np.zeros((c.shape[0], 1), dtype=c.dtype), c], axis=1)
    keys = pack_keys(c)
    uniq_keys, first_idx, inverse = np.unique(keys, return_index=True, return_inverse=True)

    out = [first_idx]
    if labels is not None:
        lab = np.asarray(labels)
        # Voxel label consensus: min == max over the group -> agreed.
        nvox = uniq_keys.shape[0]
        big = np.iinfo(np.int64).max
        gmin = np.full(nvox, big, dtype=np.int64)
        gmax = np.full(nvox, -big, dtype=np.int64)
        np.minimum.at(gmin, inverse, lab.astype(np.int64))
        np.maximum.at(gmax, inverse, lab.astype(np.int64))
        vox_labels = np.where(gmin == gmax, gmin, ignore_label).astype(lab.dtype)
        out.append(vox_labels)
    if return_inverse:
        out.append(inverse)
    return out[0] if len(out) == 1 else tuple(out)


class _Lookup:
    """Sorted-key exact lookup table: packed int64 key -> row index."""

    __slots__ = ("sorted_keys", "sorted_rows")

    def __init__(self, keys: np.ndarray, rows: Optional[np.ndarray] = None):
        order = np.argsort(keys, kind="stable")
        self.sorted_keys = keys[order]
        self.sorted_rows = order.astype(np.int32) if rows is None else rows[order]

    def query(self, keys: np.ndarray) -> np.ndarray:
        """Return row index for each key, or -1 if absent."""
        if self.sorted_keys.size == 0:
            return np.full(keys.shape, -1, dtype=np.int32)
        pos = np.searchsorted(self.sorted_keys, keys)
        pos = np.minimum(pos, self.sorted_keys.size - 1)
        hit = self.sorted_keys[pos] == keys
        return np.where(hit, self.sorted_rows[pos], -1).astype(np.int32)


@dataclass(frozen=True)
class MapSpec:
    """Static description of one kernel map: which levels it connects and
    the conv geometry that generates it. ``companion`` names the map whose
    geometry is this map's transpose (down <-> up pairs) — the conv backward
    uses it to stay gather-based instead of scatter-based."""

    level_in: int
    level_out: int
    kind: ConvKind
    companion: Optional[str] = None
    # z-run fusion width for this map's consumers: 3 when 3*C <= 128 lane
    # elements, 2 when 2*C <= 128, else 1 (flat). Set from the model's known
    # channel widths (the gather fast path is capped at 128-element rows).
    fuse_width: int = 1
    # ship the flat (K, cap) table alongside the fused one: required when the
    # map has consumers whose channel width exceeds the fused fast path
    # (e.g. l1.k3 serves both the C=32 encoder and the C=96 decoder)
    keep_flat: bool = True


def _mirror_permutation(offs: np.ndarray) -> Optional[tuple]:
    """Permutation p with offs[p[k]] == -offs[k], or None if asymmetric."""
    table = {tuple(int(v) for v in o): i for i, o in enumerate(offs)}
    perm = []
    for o in offs:
        j = table.get(tuple(int(-v) for v in o))
        if j is None:
            return None
        perm.append(j)
    return tuple(perm)


@dataclass(frozen=True)
class GraphSpec:
    """Everything the graph builder needs to know about a model's geometry.

    num_levels: pyramid depth (Res16UNet: 5 — strides 1, 2, 4, 8, 16).
    maps: name -> MapSpec. Pointwise (k=1) convs need no map.
    """

    num_levels: int
    maps: Dict[str, MapSpec] = field(default_factory=dict)
    d: int = 3

    def union(self, other: "GraphSpec") -> "GraphSpec":
        maps = dict(self.maps)
        for k, v in other.maps.items():
            if k in maps:
                assert maps[k] == v, f"conflicting MapSpec for {k}"
            maps[k] = v
        return GraphSpec(max(self.num_levels, other.num_levels), maps, self.d)


def _pad_rows(arr: np.ndarray, capacity: int, fill) -> np.ndarray:
    n = arr.shape[0]
    if n >= capacity:
        return arr[:capacity]
    pad_shape = (capacity - n,) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, dtype=arr.dtype)], axis=0)


def default_capacities(n0_capacity: int, num_levels: int, ratios: Sequence[float] = None, multiple: int = 128) -> Tuple[int, ...]:
    """Per-level capacities derived from the level-0 capacity.

    Defaults are conservative (stride-2 in 3D indoor scenes empirically
    shrinks voxel counts ~6x; we budget 2x) so overflow truncation —
    the analog of the reference's ``limit_numpoints`` drop policy
    (lib/transforms.py:405-411) — is vanishingly rare.
    """
    if ratios is None:
        ratios = [1.0 / (2 ** l) for l in range(num_levels)]
    caps = []
    for l in range(num_levels):
        c = int(np.ceil(n0_capacity * ratios[l]))
        # big levels round to whole one-hot conv tiles (ops/onehot_conv.py)
        m = 1024 if c >= 4096 else multiple
        c = max(m, ((c + m - 1) // m) * m)
        caps.append(c)
    return tuple(caps)


def build_pyramid(
    coords0: np.ndarray, num_levels: int, d: int = 3
) -> Tuple[list, list]:
    """Coordinate pyramid: level l coords are the unique values of
    ``floor(level_{l-1} / (2 * stride)) * (2 * stride)`` — ME's stride map
    semantics for the kernel-size-2/stride-2 downsample convs of Res16UNet.

    Returns (list of (N_l, 4) coords arrays, list of packed-key arrays).
    Level order within each level is first-occurrence order of the sorted
    parent keys (deterministic).
    """
    coords0 = np.asarray(coords0, dtype=np.int32)
    levels = [coords0]
    keys = [pack_keys(coords0)]
    cur = coords0
    for l in range(1, num_levels):
        s = 1 << l  # stride of the new level
        down = cur.copy()
        # only spatial axes downsample; the temporal axis (d=4) keeps stride 1
        down[:, 1:4] = np.floor_divide(down[:, 1:4], s) * s
        uk = np.unique(pack_keys(down))  # sorted-key order: required for the
        # z-run contiguity that grouped kernel maps exploit
        nxt = unpack_keys(uk, d)
        levels.append(nxt)
        keys.append(uk)
        cur = nxt
    return levels, keys


def _kernel_map(
    out_coords: np.ndarray,
    in_lookup: _Lookup,
    kind: ConvKind,
    stride_in: int,
    stride_out: int,
    out_capacity: int,
    d: int,
) -> np.ndarray:
    """Build (K, out_capacity) gather-index table (int32, -1 = missing)."""
    if kind.transpose:
        # Upsampling: out row f pulls from coarse voxel at f - o_k, where the
        # offsets are in units of the *output* (finer) tensor stride — the
        # transpose of the matching strided conv's kernel map.
        offs = region_offsets(kind.region, kind.kernel_size, kind.dilation, stride_out, d)
        offs = -offs
    else:
        # Normal conv: out row c pulls from in voxel at c + o_k, offsets in
        # units of the *input* tensor stride.
        offs = region_offsets(kind.region, kind.kernel_size, kind.dilation, stride_in, d)

    k = offs.shape[0]
    n_out = out_coords.shape[0]
    idx = np.full((k, out_capacity), -1, dtype=np.int32)
    if n_out == 0:
        return idx
    # Vectorized join: (K * N_out) queries against the input level's table.
    targets = out_coords[None, :, 1:].astype(np.int64) + offs[:, None, :].astype(np.int64)
    b = np.broadcast_to(out_coords[None, :, :1].astype(np.int64), (k, n_out, 1))
    q = np.concatenate([b, targets], axis=2).reshape(-1, 1 + d)
    idx[:, :n_out] = in_lookup.query(pack_keys(q)).reshape(k, n_out)
    return idx


def _group_offset_runs(offs: np.ndarray, z_step: int, w_max: int = 5):
    """Group kernel offsets by their non-z prefix; split each column into
    maximal runs of consecutive z-offsets (step == the input level's tensor
    stride, which is the condition for the neighbors to occupy contiguous
    sorted rows), then chunk runs to length <= w_max (the xw window width).

    Returns a list of (dz_list, slot_list) with slots in ascending-dz order.
    """
    cols: dict = {}
    for k, o in enumerate(offs):
        cols.setdefault(tuple(int(v) for v in o[:-1]), []).append((int(o[-1]), k))
    groups = []
    for prefix in sorted(cols):
        entries = sorted(cols[prefix])
        runs, run = [], [entries[0]]
        for dz, k in entries[1:]:
            if dz == run[-1][0] + z_step:
                run.append((dz, k))
            else:
                runs.append(run)
                run = [(dz, k)]
        runs.append(run)
        for r in runs:
            for i in range(0, len(r), w_max):
                chunk = r[i : i + w_max]
                groups.append(([dz for dz, _ in chunk], [k for _, k in chunk]))
    return groups


def _try_masked_shift_map(
    idx: np.ndarray,
    offs: np.ndarray,
    z_step: int,
    width: int,
    n_in: int,
    mirror_perm=None,
    companion=None,
    leftover_ratio: float = 1.6,
) -> "Optional[MaskedShiftMap]":
    """Fuse a flat stride-1 k3 map into a MaskedShiftMap (ops/msconv.py),
    or None when the map's shape doesn't fit (non-3-z-columns, asymmetric
    region, in != out sets), the sorted z-contiguity invariant fails, or
    the leftover COO overflows leftover_ratio * cap (defensive fallbacks —
    the flat path is always correct).

    Everything derives from the flat table itself: a column's anchors are
    its dz=0 slot's rows; mp/mn come from the center column's dz=-1/+1
    slots (whose valid entries are exactly the physically-adjacent rows,
    asserted here); leftovers are the (o, c) pairs whose dz=0 entry is
    missing but a dz=+-1 entry exists.
    """
    if int(width) < 3 or mirror_perm is None:
        return None
    groups = _group_offset_runs(offs, z_step, w_max=3)
    if any(len(ks) != 3 for _, ks in groups):
        return None
    cap = idx.shape[1]
    center_col = None
    col_list = []  # (dx_sign, dy, slots)
    for dzs, ks in groups:
        col_off = offs[ks[1]][:-1]
        if not col_off.any():
            center_col = tuple(int(k) for k in ks)
        else:
            dx = int(np.sign(col_off[0])) if len(col_off) >= 1 else 0
            dy = int(col_off[1]) if len(col_off) >= 2 else 0
            col_list.append((dx, dy, tuple(int(k) for k in ks)))
    if center_col is None:
        return None
    # dx-group order for the one-hot window kernel (ops/onehot_conv.py):
    # center group (dx == 0, center first), then dx < 0, then dx > 0
    col_list.sort(key=lambda t: ({0: 0, -1: 1, 1: 2}.get(t[0], 3), t[1]))
    cols = [ks for _, _, ks in col_list]
    group_sizes = [1, 0, 0]
    for dx, _, _ in col_list:
        group_sizes[{0: 0, -1: 1, 1: 2}.get(dx, 0)] += 1
    windowable = len(cols) == 8 and tuple(group_sizes) == (3, 3, 3)

    kAc, kBc, kCc = center_col
    # center dz=0 must be the identity (in == out coordinate sets)
    vB = idx[kBc] >= 0
    rows = np.arange(cap, dtype=np.int64)
    n_valid = int(vB.sum())
    if not np.array_equal(np.nonzero(vB)[0], rows[:n_valid]):
        return None
    if np.any(idx[kBc][:n_valid] != rows[:n_valid]):
        return None
    # masks from the center column's z-neighbors; assert physical adjacency
    a = idx[kAc].astype(np.int64)
    c = idx[kCc].astype(np.int64)
    if np.any((a >= 0) & (a != rows - 1)) or np.any((c >= 0) & (c != rows + 1)):
        return None
    mp = (a >= 0).astype(np.float32)
    mn = (c >= 0).astype(np.float32)

    anchors = np.empty((len(cols), cap), np.int32)
    lo_in, lo_out, lo_slot = [], [], []

    def route_coo(out_rows, in_rows, slot):
        lo_out.append(out_rows)
        lo_in.append(in_rows)
        lo_slot.append(np.full(len(out_rows), slot, np.int32))

    for gi, (kA, kB, kC) in enumerate(cols):
        b = idx[kB].astype(np.int64)
        bv = b >= 0
        anchors[gi] = np.where(bv, b, cap).astype(np.int32)
        # anchored triples read physical neighbors; contiguity assert
        av, cv = idx[kA] >= 0, idx[kC] >= 0
        if np.any(av & bv & (idx[kA] != b - 1)) or np.any(cv & bv & (idx[kC] != b + 1)):
            return None
        # the masks must not zero a true co-valid neighbor at the anchor
        if np.any(av & bv & (mp[np.where(bv, b, 0)] == 0)):
            return None
        if np.any(cv & bv & (mn[np.where(bv, b, 0)] == 0)):
            return None
        for kk, vv in ((kA, av & ~bv), (kC, cv & ~bv)):
            o = np.nonzero(vv)[0]
            route_coo(o, idx[kk][o].astype(np.int64), kk)

    # ---- one-hot window annotation (ops/onehot_conv.py) --------------------
    from languagegroundedsemseg_tpu.ops.onehot_conv import N_GROUPS, TILE, WIN

    wstart = np.zeros(0, np.int32)
    if windowable and cap % TILE == 0 and cap >= 4 * TILE:
        n_tiles = cap // TILE
        ws = np.zeros((n_tiles, N_GROUPS), np.int32)
        group_cols = [[-1, 0, 1], [2, 3, 4], [5, 6, 7]]  # -1 = identity/center
        for t in range(n_tiles):
            sl = slice(t * TILE, (t + 1) * TILE)
            for g, members in enumerate(group_cols):
                vals = [np.arange(t * TILE, (t + 1) * TILE)[:1]] if g == 0 else []
                for ci in members:
                    if ci < 0:
                        continue
                    av_ = anchors[ci, sl]
                    vals.append(av_[av_ < cap])
                allv = np.concatenate(vals) if vals else np.zeros(0, np.int64)
                if len(allv) == 0:
                    ws[t, g] = max(0, min(t * TILE, cap))
                    continue
                med = int(np.median(allv))
                w0 = int(np.clip(med - WIN // 2, 0, cap)) & ~7
                if g == 0:
                    # must cover the identity rows [tT, (t+1)T)
                    w0 = int(np.clip(w0, (t + 1) * TILE - WIN, t * TILE)) & ~7
                    w0 = max(w0, 0)
                ws[t, g] = w0
                # route out-of-window anchors to the COO (they read zero pad
                # rows in the kernel, so no double counting)
                for ci in members:
                    if ci < 0:
                        continue
                    av_ = anchors[ci, sl].astype(np.int64)
                    bad = (av_ < cap) & ((av_ < w0) | (av_ >= w0 + WIN))
                    if bad.any():
                        o = np.nonzero(bad)[0] + t * TILE
                        bvals = av_[bad]
                        kA, kB, kC = cols[ci]
                        route_coo(o, bvals, kB)
                        has_a = mp[bvals] > 0
                        if has_a.any():
                            route_coo(o[has_a], bvals[has_a] - 1, kA)
                        has_c = mn[bvals] > 0
                        if has_c.any():
                            route_coo(o[has_c], bvals[has_c] + 1, kC)
                        anchors[ci, o] = cap
        wstart = ws.reshape(-1)

    # ---- slot-major COO layout (ops/msconv.py:_leftover_fwd) ---------------
    # segments ordered by lo_slots; any segment bounded by seg_cap (static);
    # tail padded by seg_cap guard rows so dynamic slices never clamp.
    lo_slots = tuple(sorted({int(k) for ks in cols for k in (ks[0], ks[1], ks[2])}))
    cap_l = int(leftover_ratio * cap)
    seg_cap = max(1024, -(-cap_l // 8) // 128 * 128)
    lo_out = np.concatenate(lo_out) if lo_out else np.zeros(0, np.int64)
    lo_in = np.concatenate(lo_in) if lo_in else np.zeros(0, np.int64)
    lo_slot = np.concatenate(lo_slot) if lo_slot else np.zeros(0, np.int32)
    if len(lo_out) > cap_l:
        return None  # denser than the static leftover budget: flat fallback
    slot_rank = {k: j for j, k in enumerate(lo_slots)}
    order = np.lexsort((lo_out, np.vectorize(slot_rank.get)(lo_slot)
                        if len(lo_slot) else lo_slot))
    lo_out, lo_in, lo_slot = lo_out[order], lo_in[order], lo_slot[order]
    counts = np.bincount(
        np.vectorize(slot_rank.get)(lo_slot).astype(np.int64)
        if len(lo_slot) else np.zeros(0, np.int64),
        minlength=len(lo_slots),
    )
    if counts.max(initial=0) > seg_cap:
        return None  # one slot denser than the static segment bound
    lo_off = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    pad = cap_l + seg_cap - len(lo_out)
    lo_out = np.concatenate([lo_out, np.full(pad, cap)]).astype(np.int32)
    lo_in = np.concatenate([lo_in, np.full(pad, n_in)]).astype(np.int32)
    lo_slot = np.concatenate([lo_slot, np.full(pad, -1)]).astype(np.int32)
    return MaskedShiftMap(
        mp=mp, mn=mn, anchors=anchors,
        lo_in=lo_in, lo_out=lo_out, lo_slot=lo_slot, lo_off=lo_off,
        wstart=wstart,
        cols=tuple([center_col] + cols),
        mirror_perm=tuple(int(v) for v in mirror_perm),
        lo_slots=lo_slots,
        seg_cap=int(seg_cap),
        col_groups=(3, 3, 3),
        companion=companion,
    )


def dataclasses_replace_pm(pm: ParentMap, companion) -> ParentMap:
    return ParentMap(parent=pm.parent, kslot=pm.kslot, num_slots=pm.num_slots, companion=companion)


def _try_parent_map(idx: np.ndarray) -> Optional[ParentMap]:
    """Fuse a map where every output row has <= 1 contributor (k2s2
    transpose convs: one coarse parent per fine voxel)."""
    k = idx.shape[0]
    valid = idx >= 0
    if valid.sum(axis=0).max(initial=0) > 1:
        return None
    kslot = np.where(valid.any(axis=0), valid.argmax(axis=0), k).astype(np.int32)
    parent = np.take_along_axis(idx, np.minimum(kslot, k - 1)[None, :], axis=0)[0]
    parent = np.maximum(parent, 0).astype(np.int32)
    return ParentMap(parent=parent, kslot=kslot, num_slots=k)


def build_graph(
    coords0: np.ndarray,
    spec: GraphSpec,
    capacities: Sequence[int],
    as_numpy: bool = False,
    fuse: bool = True,
    fuse_grouped: bool = True,
    drop_redundant: bool = True,
) -> ConvGraph:
    """Build the full ConvGraph for one batch.

    coords0: (N, 4) int32 batched, already-quantized stride-1 coordinates.
    capacities: per-level static capacities (len == spec.num_levels).
        Overflowing levels are truncated (drop-overflow policy).
    as_numpy: keep numpy arrays (for tests / host pipelines); otherwise the
        pytree leaves are numpy anyway and become device arrays on first use.
    """
    assert len(capacities) == spec.num_levels
    coords_levels, keys_levels = build_pyramid(coords0, spec.num_levels, spec.d)

    # Truncate overflow and build lookups over the *kept* rows only.
    nums, lookups, kept_coords = [], [], []
    for l in range(spec.num_levels):
        cap = capacities[l]
        c = coords_levels[l]
        n = min(c.shape[0], cap)
        c = c[:n]
        nums.append(n)
        kept_coords.append(c)
        lookups.append(_Lookup(keys_levels[l][:n]))

    levels = tuple(
        SparseLevel(
            coords=_pad_rows(kept_coords[l], capacities[l], 0),
            num=np.int32(nums[l]),
            stride=1 << l,
        )
        for l in range(spec.num_levels)
    )

    maps, gmaps = {}, {}

    def _ts(stride_int):
        # per-axis tensor stride: the temporal axis (d=4) always has stride 1
        return stride_int if spec.d == 3 else (stride_int,) * 3 + (1,)

    for name, ms in spec.maps.items():
        stride_in = _ts(1 << ms.level_in)
        stride_out = _ts(1 << ms.level_out)
        idx = _kernel_map(
            out_coords=kept_coords[ms.level_out],
            in_lookup=lookups[ms.level_in],
            kind=ms.kind,
            stride_in=stride_in,
            stride_out=stride_out,
            out_capacity=capacities[ms.level_out],
            d=spec.d,
        )
        # Center-slot fast path: stride-1 odd kernels map the center offset to
        # the identity — the conv op turns that slot into a gather-free matmul.
        center = -1
        mirror = None
        ks_scalar = ms.kind.kernel_size if isinstance(ms.kind.kernel_size, int) else max(ms.kind.kernel_size)
        if (
            not ms.kind.transpose
            and ms.kind.stride == 1
            and ms.level_in == ms.level_out
            and ks_scalar % 2 == 1
            and ks_scalar > 1
        ):
            offs0 = region_offsets(
                ms.kind.region, ms.kind.kernel_size, ms.kind.dilation, stride_in, spec.d
            )
            zero_rows = np.flatnonzero((offs0 == 0).all(axis=1))
            if zero_rows.size == 1:
                center = int(zero_rows[0])
            mirror = _mirror_permutation(offs0)
        maps[name] = KernelMap(
            idx=idx, center_slot=center, mirror_perm=mirror, companion=ms.companion
        )

        if fuse and ks_scalar > 1:
            if ms.kind.transpose:
                pm = _try_parent_map(idx)
                if pm is not None:
                    gmaps[name] = dataclasses_replace_pm(pm, ms.companion)
                    continue
            if not fuse_grouped or ms.fuse_width < 2:
                continue
            if ms.kind.transpose:
                offs = -region_offsets(
                    ms.kind.region, ms.kind.kernel_size, ms.kind.dilation, stride_out, spec.d
                )
            else:
                offs = region_offsets(
                    ms.kind.region, ms.kind.kernel_size, ms.kind.dilation, stride_in, spec.d
                )
            if isinstance(stride_in, int) and ms.level_in == ms.level_out:
                gm = _try_masked_shift_map(
                    idx, offs, z_step=stride_in, width=ms.fuse_width,
                    n_in=capacities[ms.level_in],
                    mirror_perm=mirror, companion=ms.companion,
                )
                if gm is not None:
                    gmaps[name] = gm

    if drop_redundant:
        droppable = {n for n, ms in spec.maps.items() if not ms.keep_flat}
        _drop_redundant_flat_maps(maps, gmaps, droppable)
    return ConvGraph(levels=levels, maps=maps, gmaps=gmaps)


def _drop_redundant_flat_maps(maps: dict, gmaps: dict, droppable=None) -> None:
    """Replace flat (K, cap) tables with 1-wide dummies wherever the device
    path is fully served by a fused map — saves ~K x cap x 4 B of host->device
    traffic per map. A fused map only replaces the flat path when its
    backward is gather-only (mirror or companion ParentMap) and the spec
    declares no wide-channel consumers (MapSpec.keep_flat)."""
    for name, gm in gmaps.items():
        if isinstance(gm, ParentMap):
            served = True
        elif isinstance(gm, MaskedShiftMap):
            # masked-shift serves fwd+bwd itself, but wide-channel consumers
            # fall back to the flat path at runtime (fast-table byte budget)
            served = droppable is not None and name in droppable
        else:
            served = False
        if served and maps[name].idx.shape[1] > 1:
            old = maps[name]
            maps[name] = KernelMap(
                idx=np.full((old.idx.shape[0], 1), -1, np.int32),
                center_slot=old.center_slot,
                mirror_perm=old.mirror_perm,
                companion=old.companion,
            )
