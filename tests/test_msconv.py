"""Masked-shift fused conv (ops/msconv.py) vs the flat path oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from languagegroundedsemseg_tpu.ops.msconv import masked_shift_conv
from languagegroundedsemseg_tpu.ops.spconv import sparse_conv, sparse_conv_parent
from languagegroundedsemseg_tpu.sparse import GraphSpec, MapSpec, build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import default_capacities, pack_keys
from languagegroundedsemseg_tpu.sparse.offsets import ConvKind
from languagegroundedsemseg_tpu.sparse.types import MaskedShiftMap, ParentMap
from oracles import make_cloud


def _sorted_cloud(seed, n=350):
    rng = np.random.default_rng(seed)
    coords = make_cloud(rng, n=n)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    return rng, coords


def _graph(coords, **bg_kw):
    spec = GraphSpec(
        num_levels=2,
        maps={
            "k3": MapSpec(0, 0, ConvKind(3), fuse_width=3),
            "down0": MapSpec(0, 1, ConvKind(2, stride=2), companion="up1"),
            "up1": MapSpec(1, 0, ConvKind(2, stride=2, transpose=True), companion="down0"),
        },
    )
    return build_graph(
        coords, spec, default_capacities(512, 2, ratios=[1, 1]),
        drop_redundant=False, **bg_kw,
    )


def test_masked_shift_map_structure():
    _, coords = _sorted_cloud(0)
    g = _graph(coords)
    m = g.gmaps.get("k3")
    assert isinstance(m, MaskedShiftMap)
    from languagegroundedsemseg_tpu.sparse.types import ChildSumMap
    # k2s2 down now carries a selector-kernel window annotation; the up
    # conv routes through this partition too (no ParentMap gmap of its own,
    # models/layers.py + ops/onehot_conv.py:transpose_child_sum_conv)
    assert isinstance(g.gmaps.get("down0"), ChildSumMap)
    assert "up1" not in g.gmaps
    # 9 columns, center first; every slot exactly once
    assert len(m.cols) == 9
    covered = sorted(k for ks in m.cols for k in ks)
    assert covered == list(range(27))
    assert m.cols[0][1] == 13  # center slot of a 3^3 cube
    assert m.anchors.shape[0] == 8
    cap = m.out_capacity
    flat = np.asarray(g.maps["k3"].idx)
    valid = np.asarray(g.levels[0].valid)
    num = int(g.levels[0].num)
    is_sent = (valid == 0) & (np.arange(cap) < num)
    assert is_sent.any(), "test cloud should demand sentinel rows"
    # mc is exactly the real-row validity; sentinel/pad rows are zeroed
    np.testing.assert_array_equal(np.asarray(m.mc), valid)
    # on real rows, mp/mn mirror the center column's z-neighbor validity
    kA, kB, kC = m.cols[0]
    real = valid > 0
    np.testing.assert_array_equal(
        np.asarray(m.mp)[real], (flat[kA] >= 0)[real].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(m.mn)[real], (flat[kC] >= 0)[real].astype(np.float32))
    # sentinel rows expose at least one side and never the center
    assert (np.asarray(m.mp)[is_sent] + np.asarray(m.mn)[is_sent] >= 1).all()
    # every anchor is a dz=0 map entry, a sentinel row, or the guard cap
    anchors = np.asarray(m.anchors)
    for gi, (ka, kb, kc) in enumerate(m.cols[1:]):
        a = anchors[gi]
        ok_ident = a == flat[kb]
        ok_sent = (a < cap) & is_sent[np.clip(a, 0, cap - 1)]
        ok_guard = a == cap
        assert (ok_ident | ok_sent | ok_guard).all()
    # ov COO segments: ascending per-column offsets within the static bound
    ov_off = np.asarray(m.ov_off)
    assert len(ov_off) == 9
    assert (np.diff(ov_off) >= 0).all()
    assert (np.diff(ov_off) <= m.ov_seg).all()


def test_masked_shift_conv_matches_flat():
    rng, coords = _sorted_cloud(1)
    g = _graph(coords)
    m, km = g.gmaps["k3"], g.maps["k3"]
    for cin, cout in ((8, 16), (16, 8)):
        x = jnp.asarray(rng.normal(size=(m.out_capacity, cin)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32))
        flat = sparse_conv(x, w, km.idx, center_slot=km.center_slot,
                           mirror_perm=km.mirror_perm)
        fused = masked_shift_conv(x, w, m)
        n = int(g.levels[0].num)
        np.testing.assert_allclose(np.asarray(fused)[:n], np.asarray(flat)[:n],
                                   rtol=1e-4, atol=1e-4)


def test_masked_shift_grads_match_flat():
    rng, coords = _sorted_cloud(2)
    g = _graph(coords)
    m, km = g.gmaps["k3"], g.maps["k3"]
    cin, cout = 6, 5
    n = int(g.levels[0].num)
    x = np.zeros((m.out_capacity, cin), np.float32)
    x[:n] = rng.normal(size=(n, cin))
    x = jnp.asarray(x)
    w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32))
    ct = np.zeros((m.out_capacity, cout), np.float32)
    ct[:n] = rng.normal(size=(n, cout))
    ct = jnp.asarray(ct)

    def loss_flat(x, w):
        return (sparse_conv(x, w, km.idx, center_slot=km.center_slot,
                            mirror_perm=km.mirror_perm) * ct).sum()

    def loss_fused(x, w):
        return (masked_shift_conv(x, w, m) * ct).sum()

    gx1, gw1 = jax.grad(loss_flat, (0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_fused, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx2)[:n], np.asarray(gx1)[:n],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw2), np.asarray(gw1),
                               rtol=1e-3, atol=1e-3)


def test_masked_shift_windowed_over_budget_matches_flat():
    """Tables over the fast-table byte budget run the barriered
    static-window variant exactly (shrunk margins so the path engages at
    test scale); an unwindowable budget declines to None (flat fallback)."""
    import languagegroundedsemseg_tpu.ops.msconv as mod

    old_fast, old_margin, old_min = (
        mod.FAST_TABLE_BYTES, mod.GWIN_MARGIN, mod.MIN_WINDOW_ROWS)
    try:
        # Shrink the margin BEFORE the build so the host routes far anchors
        # into the ov COO consistently with the runtime windows.
        mod.GWIN_MARGIN = 64
        mod.MIN_WINDOW_ROWS = 128
        rng, coords = _sorted_cloud(3)
        g = _graph(coords)
        m, km = g.gmaps["k3"], g.maps["k3"]
        n = int(g.levels[0].num)
        x = jnp.asarray(rng.normal(size=(m.out_capacity, 8)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(27, 8, 8)) * 0.1).astype(np.float32))
        row_bytes = 3 * 8 * 4
        flat = sparse_conv(x, w, km.idx, center_slot=km.center_slot,
                           mirror_perm=km.mirror_perm)
        # budget below even a minimal window -> decline
        mod.FAST_TABLE_BYTES = 100
        assert masked_shift_conv(x, w, m) is None
        # budget for ~300 rows: table (cap+1 rows) is over budget but
        # windowable -> windowed path, exact vs flat
        mod.FAST_TABLE_BYTES = (2 * 64 + 128 + 50) * row_bytes
        out = masked_shift_conv(x, w, m)
        assert out is not None
        np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(flat)[:n],
                                   rtol=1e-4, atol=1e-4)
    finally:
        mod.FAST_TABLE_BYTES = old_fast
        mod.GWIN_MARGIN = old_margin
        mod.MIN_WINDOW_ROWS = old_min


def test_unsorted_input_falls_back_gracefully():
    """Contiguity violated (coords not sorted) -> no fused map, flat only."""
    rng = np.random.default_rng(4)
    coords = make_cloud(rng, n=300)  # NOT sorted by packed key
    g = _graph(coords)
    assert "k3" not in g.gmaps or not isinstance(g.gmaps.get("k3"), MaskedShiftMap)


def test_ov_overflow_falls_back():
    """A pathological outlier count (every anchor 'far' under a zero
    window margin) overflows the ov COO capacity -> no fused map, flat
    path only."""
    import languagegroundedsemseg_tpu.ops.msconv as mod

    _, coords = _sorted_cloud(5)
    spec = GraphSpec(num_levels=1, maps={"k3": MapSpec(0, 0, ConvKind(3), fuse_width=3)})
    old = mod.GWIN_MARGIN
    try:
        mod.GWIN_MARGIN = 0
        g = build_graph(coords, spec, default_capacities(512, 1),
                        drop_redundant=False)
    finally:
        mod.GWIN_MARGIN = old
    assert "k3" not in g.gmaps


def test_parent_conv_matches_flat():
    # up gmaps are no longer built (the companion ChildSumMap serves ups,
    # tests/test_transpose_cs.py); derive a ParentMap from the flat table
    # to keep the op itself covered
    from languagegroundedsemseg_tpu.sparse.graph_host import _try_parent_map

    rng, coords = _sorted_cloud(12)
    g = _graph(coords)
    cin, cout = 6, 4
    x = jnp.asarray(rng.normal(size=(g.levels[1].capacity, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))
    flat = sparse_conv(x, w, g.maps["up1"].idx)
    pm = _try_parent_map(np.asarray(g.maps["up1"].idx))
    fused = sparse_conv_parent(x, w, pm)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(flat), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_model_forward_same_with_and_without_fusion():
    """End-to-end: Res16UNet output identical with fused and flat maps."""
    from languagegroundedsemseg_tpu.models.res16unet import Res16UNet14A, res16unet_graph_spec
    from languagegroundedsemseg_tpu.sparse.graph_host import build_graph as bg

    rng, coords = _sorted_cloud(13, n=300)
    spec = res16unet_graph_spec()
    caps = default_capacities(384, spec.num_levels, ratios=[1, 1, 1, 1, 1])
    g_fused = bg(coords, spec, caps, fuse=True)
    g_flat = bg(coords, spec, caps, fuse=False)
    assert any(isinstance(v, MaskedShiftMap) for v in g_fused.gmaps.values())
    feats = jnp.asarray(rng.normal(size=(384, 3)).astype(np.float32))
    model = Res16UNet14A(out_channels=11)
    variables = model.init(jax.random.PRNGKey(0), feats, g_flat, train=False)
    out_flat, _ = model.apply(variables, feats, g_flat, train=False)
    out_fused, _ = model.apply(variables, feats, g_fused, train=False)
    n0 = int(g_flat.levels[0].num)
    np.testing.assert_allclose(
        np.asarray(out_fused)[:n0], np.asarray(out_flat)[:n0], rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_model_grads_same_with_and_without_fusion():
    from languagegroundedsemseg_tpu.models.res16unet import Res16UNet14A, res16unet_graph_spec
    from languagegroundedsemseg_tpu.sparse.graph_host import build_graph as bg

    rng, coords = _sorted_cloud(14, n=250)
    spec = res16unet_graph_spec()
    caps = default_capacities(256, spec.num_levels, ratios=[1, 1, 1, 1, 1])
    g_fused = bg(coords, spec, caps, fuse=True)
    g_flat = bg(coords, spec, caps, fuse=False)
    feats = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    model = Res16UNet14A(out_channels=7)
    variables = model.init(jax.random.PRNGKey(0), feats, g_flat, train=False)
    n0 = int(g_flat.levels[0].num)
    ct = np.zeros((256, 7), np.float32)
    ct[:n0] = np.random.default_rng(0).normal(size=(n0, 7))
    ct = jnp.asarray(ct)

    def loss(v, g):
        out, _ = model.apply(v, feats, g, train=False)
        return (out * ct).sum()

    g1 = jax.grad(loss)(variables, g_flat)
    g2 = jax.grad(loss)(variables, g_fused)
    flat1 = jax.tree_util.tree_leaves(g1["params"])
    flat2 = jax.tree_util.tree_leaves(g2["params"])
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3)
