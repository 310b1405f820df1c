"""Coordinate pyramid + kernel-map builder correctness."""

import numpy as np

from languagegroundedsemseg_tpu.sparse import (
    GraphSpec,
    MapSpec,
    build_graph,
    quantize,
)
from languagegroundedsemseg_tpu.sparse.graph_host import build_pyramid, default_capacities
from languagegroundedsemseg_tpu.sparse.offsets import (
    ConvKind,
    KernelRegion,
    hypercross_offsets,
    hypercube_offsets,
    region_offsets,
)
from oracles import make_cloud


def test_hypercube_offsets_k3():
    offs = hypercube_offsets(3, d=3)
    assert offs.shape == (27, 3)
    assert offs.min() == -1 and offs.max() == 1
    assert len({tuple(o) for o in offs}) == 27


def test_hypercube_offsets_k2_forward_biased():
    # Even kernels span {0, ts} per axis — ME's convention for the
    # stride-2 down convs (reference models/modules/common.py semantics).
    offs = hypercube_offsets(2, tensor_stride=4, d=3)
    assert offs.shape == (8, 3)
    assert set(np.unique(offs)) == {0, 4}


def test_hypercross_offsets():
    offs = hypercross_offsets(3, d=3)
    assert offs.shape == (7, 3)
    assert tuple(offs[0]) == (0, 0, 0)
    assert (np.abs(offs).sum(axis=1) <= 1).all()


def test_quantize_dedup_and_consensus():
    coords = np.array([[0, 0, 0], [0, 0, 0], [1, 1, 1], [0, 0, 0]])
    labels = np.array([3, 5, 7, 3])
    idx, vox_labels = quantize(coords, labels=labels, ignore_label=255)
    assert len(idx) == 2
    lab_by_key = dict(zip([tuple(c) for c in coords[idx]], vox_labels))
    assert lab_by_key[(1, 1, 1)] == 7
    assert lab_by_key[(0, 0, 0)] == 255  # conflicting labels -> ignore


def test_pyramid_strides_and_uniqueness():
    rng = np.random.default_rng(0)
    coords = make_cloud(rng, n=500)
    levels, keys = build_pyramid(coords, 5)
    for l, (lv, ks) in enumerate(zip(levels, keys)):
        s = 1 << l
        assert (lv[:, 1:] % s == 0).all()
        assert len(np.unique(ks)) == len(ks)
    # each level's coords are the floor-parents of the previous level
    for l in range(1, 5):
        s = 1 << l
        parents = levels[l - 1].copy()
        parents[:, 1:] = parents[:, 1:] // s * s
        got = {tuple(c) for c in levels[l]}
        want = {tuple(c) for c in parents}
        assert got == want


def _brute_map(in_coords, out_coords, offsets, negate=False):
    table = {tuple(c): i for i, c in enumerate(in_coords)}
    sign = -1 if negate else 1
    k, n = len(offsets), len(out_coords)
    idx = np.full((k, n), -1, dtype=np.int32)
    for i, oc in enumerate(out_coords):
        for kk, off in enumerate(offsets):
            tgt = (oc[0], oc[1] + sign * off[0], oc[2] + sign * off[1], oc[3] + sign * off[2])
            idx[kk, i] = table.get(tgt, -1)
    return idx


def test_kernel_maps_match_brute_force():
    rng = np.random.default_rng(1)
    coords = make_cloud(rng, n=300)
    spec = GraphSpec(
        num_levels=3,
        maps={
            "l0.k3": MapSpec(0, 0, ConvKind(3)),
            "down0": MapSpec(0, 1, ConvKind(2, stride=2)),
            "down1": MapSpec(1, 2, ConvKind(2, stride=2)),
            "up1": MapSpec(1, 0, ConvKind(2, stride=2, transpose=True)),
            "l1.cross": MapSpec(1, 1, ConvKind(3, region=KernelRegion.HYPER_CROSS)),
        },
    )
    caps = default_capacities(512, 3, ratios=[1, 1, 1])
    g = build_graph(coords, spec, caps, drop_redundant=False)

    lv = [np.asarray(g.levels[l].coords)[: int(g.levels[l].num)] for l in range(3)]

    # stride-1 k3 @ L0
    offs = region_offsets(KernelRegion.HYPER_CUBE, 3, 1, 1)
    want = _brute_map(lv[0], lv[0], offs)
    got = np.asarray(g.maps["l0.k3"].idx)[:, : len(lv[0])]
    np.testing.assert_array_equal(got, want)

    # down conv L0 -> L1: offsets {0, 1} per axis in input-stride units
    offs = region_offsets(KernelRegion.HYPER_CUBE, 2, 1, 1)
    want = _brute_map(lv[0], lv[1], offs)
    np.testing.assert_array_equal(np.asarray(g.maps["down0"].idx)[:, : len(lv[1])], want)

    # down conv L1 -> L2: offsets {0, 2}
    offs = region_offsets(KernelRegion.HYPER_CUBE, 2, 1, 2)
    want = _brute_map(lv[1], lv[2], offs)
    np.testing.assert_array_equal(np.asarray(g.maps["down1"].idx)[:, : len(lv[2])], want)

    # transpose conv L1 -> L0: out f pulls from f - o, offsets in fine stride
    offs = region_offsets(KernelRegion.HYPER_CUBE, 2, 1, 1)
    want = _brute_map(lv[1], lv[0], offs, negate=True)
    np.testing.assert_array_equal(np.asarray(g.maps["up1"].idx)[:, : len(lv[0])], want)

    # hypercross @ L1
    offs = region_offsets(KernelRegion.HYPER_CROSS, 3, 1, 2)
    want = _brute_map(lv[1], lv[1], offs)
    np.testing.assert_array_equal(np.asarray(g.maps["l1.cross"].idx)[:, : len(lv[1])], want)


def test_transpose_map_is_transpose_of_down_map():
    """Every (k, in, out) pair of down{l} appears as (k, out, in) in up{l+1}."""
    rng = np.random.default_rng(2)
    coords = make_cloud(rng, n=400)
    spec = GraphSpec(
        num_levels=2,
        maps={
            "down0": MapSpec(0, 1, ConvKind(2, stride=2)),
            "up1": MapSpec(1, 0, ConvKind(2, stride=2, transpose=True)),
        },
    )
    g = build_graph(coords, spec, default_capacities(512, 2, ratios=[1, 1]), drop_redundant=False)
    down = np.asarray(g.maps["down0"].idx)
    up = np.asarray(g.maps["up1"].idx)
    n1 = int(g.levels[1].num)
    n0 = int(g.levels[0].num)
    pairs_down = {
        (k, int(down[k, i]), i) for k in range(8) for i in range(n1) if down[k, i] >= 0
    }
    pairs_up = {
        (k, f, int(up[k, f])) for k in range(8) for f in range(n0) if up[k, f] >= 0
    }
    assert pairs_down == pairs_up


def test_overflow_truncation():
    rng = np.random.default_rng(3)
    coords = make_cloud(rng, n=300)
    spec = GraphSpec(num_levels=2, maps={"down0": MapSpec(0, 1, ConvKind(2, stride=2))})
    g = build_graph(coords, spec, capacities=(128, 128))
    assert int(g.levels[0].num) == 128
    assert (np.asarray(g.maps["down0"].idx) < 128).all()
