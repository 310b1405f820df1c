"""Masked-shift fused conv (ops/msconv.py) vs the flat path oracle."""

import jax
import jax.numpy as jnp
import numpy as np

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
    assert isinstance(g.gmaps.get("up1"), ParentMap)
    assert "down0" not in g.gmaps  # k2s2 down stays flat
    # 9 columns, center first; every slot exactly once
    assert len(m.cols) == 9
    covered = sorted(k for ks in m.cols for k in ks)
    assert covered == list(range(27))
    assert m.cols[0][1] == 13  # center slot of a 3^3 cube
    assert m.anchors.shape[0] == 8
    assert len(m.lo_slots) == 24  # all slots of the 8 non-center columns
    n = int(g.levels[0].num)
    cap = m.out_capacity
    # masks: mp[r] set exactly when row r-1 is the true z-1 neighbor
    flat = g.maps["k3"].idx
    kA, kB, kC = m.cols[0]
    np.testing.assert_array_equal(np.asarray(m.mp), (np.asarray(flat[kA]) >= 0))
    np.testing.assert_array_equal(np.asarray(m.mn), (np.asarray(flat[kC]) >= 0))
    # leftover COO is slot-major: lo_off delimits each slot's segment and
    # segments respect the static bound; guards pad the tail
    lo_slot = np.asarray(m.lo_slot)
    lo_off = np.asarray(m.lo_off)
    assert len(lo_off) == len(m.lo_slots) + 1
    for j, k in enumerate(m.lo_slots):
        seg = lo_slot[lo_off[j]:lo_off[j + 1]]
        assert (seg == k).all()
        assert lo_off[j + 1] - lo_off[j] <= m.seg_cap
    lo = np.asarray(m.lo_out)
    assert (lo[lo_off[-1]:] == cap).all()  # tail guards
    assert len(lo) >= lo_off[-1] + m.seg_cap  # slices never clamp


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


def test_masked_shift_wide_channel_fallback():
    """Above the fast-table byte budget the op drops to a bf16 table when
    that fits, and declines entirely when even bf16 is over budget."""
    import languagegroundedsemseg_tpu.ops.msconv as mod

    rng, coords = _sorted_cloud(3)
    g = _graph(coords)
    m, km = g.gmaps["k3"], g.maps["k3"]
    n = int(g.levels[0].num)
    x = jnp.asarray(rng.normal(size=(m.out_capacity, 8)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(27, 8, 8)) * 0.1).astype(np.float32))
    f32_bytes = (m.out_capacity + 1) * 3 * 8 * 4
    old = mod.FAST_TABLE_BYTES
    old_bf16 = mod.BF16_TABLE_FALLBACK
    try:
        mod.BF16_TABLE_FALLBACK = True
        mod.FAST_TABLE_BYTES = 100  # below even the bf16 table
        assert masked_shift_conv(x, w, m) is None
        mod.FAST_TABLE_BYTES = f32_bytes // 2  # bf16 fits, f32 does not
        out = masked_shift_conv(x, w, m)
        assert out is not None and out.dtype == jnp.float32
        flat = sparse_conv(x, w, km.idx, center_slot=km.center_slot,
                           mirror_perm=km.mirror_perm)
        scale = np.abs(np.asarray(flat)[:n]).max() + 1e-9
        assert np.abs(np.asarray(out)[:n] - np.asarray(flat)[:n]).max() / scale < 2e-2
    finally:
        mod.FAST_TABLE_BYTES = old
        mod.BF16_TABLE_FALLBACK = old_bf16
    assert masked_shift_conv(x, w, m) is not None


def test_unsorted_input_falls_back_gracefully():
    """Contiguity violated (coords not sorted) -> no fused map, flat only."""
    rng = np.random.default_rng(4)
    coords = make_cloud(rng, n=300)  # NOT sorted by packed key
    g = _graph(coords)
    assert "k3" not in g.gmaps or not isinstance(g.gmaps.get("k3"), MaskedShiftMap)


def test_leftover_overflow_falls_back():
    import languagegroundedsemseg_tpu.sparse.graph_host as gh

    _, coords = _sorted_cloud(5)
    spec = GraphSpec(num_levels=1, maps={"k3": MapSpec(0, 0, ConvKind(3), fuse_width=3)})
    orig = gh._try_masked_shift_map

    def tight(idx, offs, z_step, width, n_in, mirror_perm=None, companion=None,
              leftover_ratio=1.6):
        return orig(idx, offs, z_step, width, n_in, mirror_perm, companion,
                    leftover_ratio=0.001)

    gh._try_masked_shift_map = tight
    try:
        g = build_graph(coords, spec, default_capacities(512, 1),
                        drop_redundant=False)
    finally:
        gh._try_masked_shift_map = orig
    assert "k3" not in g.gmaps


def test_parent_conv_matches_flat():
    rng, coords = _sorted_cloud(12)
    g = _graph(coords)
    cin, cout = 6, 4
    x = jnp.asarray(rng.normal(size=(g.levels[1].capacity, cin)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(8, cin, cout)).astype(np.float32))
    flat = sparse_conv(x, w, g.maps["up1"].idx)
    fused = sparse_conv_parent(x, w, g.gmaps["up1"])
    np.testing.assert_allclose(np.asarray(fused), np.asarray(flat), rtol=1e-4, atol=1e-4)


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
