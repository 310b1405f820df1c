"""Selector-kernel conv (ops/onehot_conv.py) vs flat oracle.

Runs the Pallas kernels in interpreter mode on CPU (interpret=True); bf16
projection/selection gives ~1e-2 relative tolerance vs the f32 flat path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from languagegroundedsemseg_tpu.ops.onehot_conv import onehot_window_conv
from languagegroundedsemseg_tpu.ops.spconv import sparse_conv
from languagegroundedsemseg_tpu.sparse import GraphSpec, MapSpec, build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import pack_keys
from languagegroundedsemseg_tpu.sparse.offsets import ConvKind
from languagegroundedsemseg_tpu.sparse.types import MaskedShiftMap
from oracles import make_cloud

CAP = 4096


def _graph(seed=0, n=3000, cap=CAP):
    rng = np.random.default_rng(seed)
    coords = make_cloud(rng, n=n, extent=40)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = GraphSpec(num_levels=1, maps={"k3": MapSpec(0, 0, ConvKind(3), fuse_width=3)})
    g = build_graph(coords, spec, (cap,), drop_redundant=False)
    return rng, g


def test_window_annotation_built():
    _, g = _graph()
    m = g.gmaps["k3"]
    assert isinstance(m, MaskedShiftMap)
    assert m.tile > 0 and m.win > 0 and CAP % m.tile == 0
    n_cols = m.anchors.shape[0]
    for ws_name, anch in (("wstart", m.anchors), ("inv_wstart", m.inv_anchors)):
        ws = np.asarray(getattr(m, ws_name))
        assert ws.shape == (CAP // m.tile * n_cols,)
        assert (ws % 8 == 0).all() and (ws >= 0).all()
        assert (ws <= CAP - m.win).all()
        # every remaining (non-guard) anchor lies inside its tile's window
        a2 = np.asarray(anch)
        for t in range(CAP // m.tile):
            for ci in range(n_cols):
                w0 = ws[t * n_cols + ci]
                a = a2[ci, t * m.tile:(t + 1) * m.tile]
                a = a[a < CAP]
                assert ((a >= w0) & (a < w0 + m.win)).all()


def test_inverse_anchors_partition_pairs():
    """inv_anchors + dwov must cover exactly the pairs that anchors + ov
    cover (each pair once) — the dW partition invariant."""
    _, g = _graph(5)
    m = g.gmaps["k3"]
    n_cols = m.anchors.shape[0]
    anchors = np.asarray(m.anchors)
    inv = np.asarray(m.inv_anchors)
    ov_off = np.asarray(m.ov_off)
    dwov_off = np.asarray(m.dwov_off)
    for gi in range(n_cols):
        fwd_pairs = {(int(a), int(o)) for o, a in enumerate(anchors[gi]) if a < CAP}
        s = slice(ov_off[gi], ov_off[gi + 1])
        fwd_pairs |= {(int(a), int(o)) for a, o in
                      zip(np.asarray(m.ov_in)[s], np.asarray(m.ov_out)[s])}
        inv_pairs = {(int(r), int(o)) for r, o in enumerate(inv[gi]) if o < CAP}
        s = slice(dwov_off[gi], dwov_off[gi + 1])
        inv_pairs |= {(int(r), int(o)) for r, o in
                      zip(np.asarray(m.dwov_in)[s], np.asarray(m.dwov_out)[s])}
        assert fwd_pairs == inv_pairs
        assert len(fwd_pairs) == len([a for a in anchors[gi] if a < CAP]) + (
            ov_off[gi + 1] - ov_off[gi])


def test_onehot_conv_matches_flat():
    rng, g = _graph(1)
    m, km = g.gmaps["k3"], g.maps["k3"]
    for cin, cout in ((16, 32), (96, 96)):
        x = np.zeros((CAP, cin), np.float32)
        n = int(g.levels[0].num)
        x[:n] = rng.normal(size=(n, cin))
        x = jnp.asarray(x)
        w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32))
        flat = sparse_conv(x, w, km.idx, center_slot=km.center_slot,
                           mirror_perm=km.mirror_perm)
        fused = onehot_window_conv(x, w, m, interpret=True)
        assert fused is not None
        scale = np.abs(np.asarray(flat)[:n]).max() + 1e-9
        err = np.abs(np.asarray(fused)[:n] - np.asarray(flat)[:n]).max() / scale
        assert err < 2e-2, f"cin={cin}: rel err {err}"


def test_onehot_grads_match_flat():
    rng, g = _graph(2)
    m, km = g.gmaps["k3"], g.maps["k3"]
    cin, cout = 16, 8
    n = int(g.levels[0].num)
    x = np.zeros((CAP, cin), np.float32)
    x[:n] = rng.normal(size=(n, cin))
    x = jnp.asarray(x)
    w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32))
    ct = np.zeros((CAP, cout), np.float32)
    ct[:n] = rng.normal(size=(n, cout))
    ct = jnp.asarray(ct)

    def loss_flat(x, w):
        return (sparse_conv(x, w, km.idx, center_slot=km.center_slot,
                            mirror_perm=km.mirror_perm) * ct).sum()

    def loss_fused(x, w):
        return (onehot_window_conv(x, w, m, interpret=True) * ct).sum()

    gx1, gw1 = jax.grad(loss_flat, (0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_fused, (0, 1))(x, w)
    sx = np.abs(np.asarray(gx1)[:n]).max() + 1e-9
    sw = np.abs(np.asarray(gw1)).max() + 1e-9
    assert np.abs(np.asarray(gx2)[:n] - np.asarray(gx1)[:n]).max() / sx < 3e-2
    assert np.abs(np.asarray(gw2) - np.asarray(gw1)).max() / sw < 3e-2


def test_device_inv_rebuild_matches_host():
    """Production builds ship a 0-width inv_anchors; the device rebuild
    (_inv_from_anchors) must reproduce the host-built array exactly, and
    grads through a stripped map must match the flat oracle."""
    from languagegroundedsemseg_tpu.ops.msconv import _abs_anchors
    from languagegroundedsemseg_tpu.ops.onehot_conv import _inv_from_anchors

    rng = np.random.default_rng(9)
    coords = make_cloud(rng, n=3000, extent=40)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = GraphSpec(num_levels=1, maps={"k3": MapSpec(0, 0, ConvKind(3), fuse_width=3)})
    g_dbg = build_graph(coords, spec, (CAP,), drop_redundant=False)
    g_prod = build_graph(coords, spec, (CAP,), drop_redundant=False,
                         validate=False)
    m_dbg, m = g_dbg.gmaps["k3"], g_prod.gmaps["k3"]
    assert m_dbg.inv_anchors.shape[1] == CAP
    assert m.inv_anchors.shape[1] == 0
    assert m.anchors.dtype == np.int16  # production delta encoding
    rebuilt = _inv_from_anchors(
        _abs_anchors(jnp.asarray(m.anchors)),
        jnp.asarray(m.ov_in), jnp.asarray(m.ov_out),
        jnp.asarray(m.ov_off), jnp.asarray(m.dwov_in),
        jnp.asarray(m.dwov_off))
    np.testing.assert_array_equal(np.asarray(rebuilt),
                                  np.asarray(m_dbg.inv_anchors))

    km = g_prod.maps["k3"]
    cin, cout = 12, 8
    n = int(g_prod.levels[0].num)
    x = np.zeros((CAP, cin), np.float32)
    x[:n] = rng.normal(size=(n, cin))
    x = jnp.asarray(x)
    w = jnp.asarray((rng.normal(size=(27, cin, cout)) * 0.1).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(CAP, cout)).astype(np.float32))

    def loss_flat(x, w):
        return (sparse_conv(x, w, km.idx, center_slot=km.center_slot,
                            mirror_perm=km.mirror_perm) * ct).sum()

    def loss_fused(x, w):
        return (onehot_window_conv(x, w, m, interpret=True) * ct).sum()

    gx1, gw1 = jax.grad(loss_flat, (0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_fused, (0, 1))(x, w)
    sx = np.abs(np.asarray(gx1)[:n]).max() + 1e-9
    sw = np.abs(np.asarray(gw1)).max() + 1e-9
    assert np.abs(np.asarray(gx2)[:n] - np.asarray(gx1)[:n]).max() / sx < 3e-2
    assert np.abs(np.asarray(gw2) - np.asarray(gw1)).max() / sw < 3e-2


def test_small_caps_have_no_windows():
    rng = np.random.default_rng(3)
    coords = make_cloud(rng, n=60)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = GraphSpec(num_levels=1, maps={"k3": MapSpec(0, 0, ConvKind(3), fuse_width=3)})
    g = build_graph(coords, spec, (128,), drop_redundant=False)
    m = g.gmaps.get("k3")
    if m is not None:
        assert m.tile == 0 and m.wstart.size == 0
        x = jnp.zeros((128, 8), np.float32)
        w = jnp.zeros((27, 8, 8), np.float32)
        assert onehot_window_conv(x, w, m, interpret=True) is None


def test_slot_window_down_conv_matches_flat():
    """child_sum_conv (interpret kernel) vs the flat gather path on a
    real stride-2 down map, forward and grads."""
    from languagegroundedsemseg_tpu.ops.onehot_conv import child_sum_conv
    from languagegroundedsemseg_tpu.sparse.offsets import ConvKind as CK
    from languagegroundedsemseg_tpu.sparse.types import ChildSumMap

    rng = np.random.default_rng(7)
    coords = make_cloud(rng, n=2600, extent=40)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = GraphSpec(
        num_levels=2,
        maps={
            "k3": MapSpec(0, 0, ConvKind(3), fuse_width=3),
            "down0": MapSpec(0, 1, CK(kernel_size=2, stride=2)),
        },
    )
    g = build_graph(coords, spec, (4096, 2048), drop_redundant=False)
    sw = g.gmaps.get("down0")
    assert isinstance(sw, ChildSumMap) and sw.tile > 0
    km = g.maps["down0"]
    cap_in = g.levels[0].capacity
    cin, cout = 16, 24
    x = np.zeros((cap_in, cin), np.float32)
    n0 = int(g.levels[0].num)
    x[:n0] = rng.normal(size=(n0, cin))
    # sentinel/pad rows hold zeros, as the batch builder guarantees
    x *= np.asarray(g.gmaps["k3"].mc)[:, None] if "k3" in g.gmaps else 1.0
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.2
    x = jnp.asarray(x)
    wj = jnp.asarray(w)

    from languagegroundedsemseg_tpu.ops.spconv import sparse_conv

    ref = sparse_conv(x, wj, km.idx, None, center_slot=km.center_slot)
    out = child_sum_conv(x, wj, sw, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    def loss_flat(x, w):
        return (sparse_conv(x, w, km.idx, None,
                            center_slot=km.center_slot) ** 2).sum()

    def loss_sw(x, w):
        return (child_sum_conv(x, w, sw, interpret=True) ** 2).sum()

    gx1, gw1 = jax.grad(loss_flat, (0, 1))(x, wj)
    gx2, gw2 = jax.grad(loss_sw, (0, 1))(x, wj)
    sx = np.abs(np.asarray(gx1)).max() + 1e-6
    sw_ = np.abs(np.asarray(gw1)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gx2) / sx, np.asarray(gx1) / sx,
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(gw2) / sw_, np.asarray(gw1) / sw_,
                               atol=3e-2)


def test_grouped_slot_windows_match_flat():
    """n_groups=2 child-sum windows (one per dx slot-half,
    graph_host._CS_MENU split entries) vs the flat gather path, forward
    and grads through the interpret kernel. Pins the builder at the
    (2, 128, 1024) menu entry so the split engages even though the small
    test map would normally satisfy a whole-map window."""
    from languagegroundedsemseg_tpu.ops.onehot_conv import child_sum_conv
    from languagegroundedsemseg_tpu.sparse.graph_host import (
        _try_child_sum_map,
    )
    from languagegroundedsemseg_tpu.sparse.offsets import ConvKind as CK
    from languagegroundedsemseg_tpu.sparse.types import ChildSumMap

    rng = np.random.default_rng(11)
    coords = make_cloud(rng, n=2600, extent=40)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = GraphSpec(
        num_levels=2,
        maps={
            "k3": MapSpec(0, 0, ConvKind(3), fuse_width=3),
            "down0": MapSpec(0, 1, CK(kernel_size=2, stride=2)),
        },
    )
    g = build_graph(coords, spec, (4096, 2048), drop_redundant=False)
    km = g.maps["down0"]
    cap_in = g.levels[0].capacity
    sw = _try_child_sum_map(np.asarray(km.idx), cap_in,
                            pin_tilewin=(2, 128, 1024))
    assert isinstance(sw, ChildSumMap)
    assert sw.n_groups == 2 and sw.tile == 128 and sw.win == 1024
    n_tiles = sw.out_capacity // sw.tile
    assert sw.wstart.shape == (n_tiles * 2,)

    cin, cout = 16, 24
    x = np.zeros((cap_in, cin), np.float32)
    n0 = int(g.levels[0].num)
    x[:n0] = rng.normal(size=(n0, cin))
    x *= np.asarray(g.gmaps["k3"].mc)[:, None] if "k3" in g.gmaps else 1.0
    w = rng.normal(size=(8, cin, cout)).astype(np.float32) * 0.2
    x = jnp.asarray(x)
    wj = jnp.asarray(w)

    from languagegroundedsemseg_tpu.ops.spconv import sparse_conv

    ref = sparse_conv(x, wj, km.idx, None, center_slot=km.center_slot)
    out = child_sum_conv(x, wj, sw, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)

    def loss_flat(x, w):
        return (sparse_conv(x, w, km.idx, None,
                            center_slot=km.center_slot) ** 2).sum()

    def loss_sw(x, w):
        return (child_sum_conv(x, w, sw, interpret=True) ** 2).sum()

    gx1, gw1 = jax.grad(loss_flat, (0, 1))(x, wj)
    gx2, gw2 = jax.grad(loss_sw, (0, 1))(x, wj)
    sx = np.abs(np.asarray(gx1)).max() + 1e-6
    sw_ = np.abs(np.asarray(gw1)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(gx2) / sx, np.asarray(gx1) / sx,
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(gw2) / sw_, np.asarray(gw1) / sw_,
                               atol=3e-2)
