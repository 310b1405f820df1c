"""Native fused builder (sparse/graph_fused.py + csrc/fused_builder.cpp)
vs the numpy oracle (graph_host.build_graph): array-exact equality of the
production wire format, across scene shapes that exercise sentinels,
window overflow, and multi-scene batches."""

import numpy as np
import pytest

from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec
from languagegroundedsemseg_tpu.sparse import graph_fused, graph_host
from languagegroundedsemseg_tpu.sparse.graph_host import flex_bucket, pack_keys

pytestmark = pytest.mark.skipif(
    not graph_fused.available(), reason="native toolchain unavailable"
)


def _cloud(rng, n, extent, n_scenes=1):
    parts = []
    for b in range(n_scenes):
        c = rng.integers(0, extent, size=(n, 3)).astype(np.int32)
        c = np.unique(np.concatenate(
            [np.full((n, 1), b, np.int32), c], axis=1), axis=0)
        parts.append(c)
    coords = np.concatenate(parts, axis=0)
    return coords[np.argsort(pack_keys(coords), kind="stable")]


def _build_both(coords, spec):
    caps = [flex_bucket(len(coords))] * spec.num_levels
    g_ref = graph_host.build_graph(
        coords, spec, caps, flex=True, drop_redundant=True, validate=False,
        ship_coords=False,
    )
    lay = {}
    g_fast = graph_fused.build_graph_fused(
        coords, spec, caps, layout_out=lay, ship_coords=False,
    )
    return g_ref, g_fast, lay


def _assert_graphs_equal(g_ref, g_fast):
    assert g_fast is not None
    assert set(g_ref.maps) == set(g_fast.maps)
    assert set(g_ref.gmaps) == set(g_fast.gmaps)
    for l, (lr, lf) in enumerate(zip(g_ref.levels, g_fast.levels)):
        assert int(lr.num) == int(lf.num), f"level {l} num"
        np.testing.assert_array_equal(lr.valid, lf.valid, err_msg=f"l{l}")
        np.testing.assert_array_equal(
            lr.batch_starts, lf.batch_starts, err_msg=f"l{l} starts")
    for name in g_ref.maps:
        mr, mf = g_ref.maps[name], g_fast.maps[name]
        assert mr.idx.shape == mf.idx.shape, name
        np.testing.assert_array_equal(mr.idx, mf.idx, err_msg=name)
        assert mr.center_slot == mf.center_slot, name
        assert mr.mirror_perm == mf.mirror_perm, name
    for name in g_ref.gmaps:
        gr, gf = g_ref.gmaps[name], g_fast.gmaps[name]
        assert type(gr) is type(gf), name
        for f in gr.__dataclass_fields__:
            a, b = getattr(gr, f), getattr(gf, f)
            if isinstance(a, np.ndarray):
                assert a.dtype == b.dtype, f"{name}.{f} dtype"
                np.testing.assert_array_equal(a, b, err_msg=f"{name}.{f}")
            else:
                assert a == b, f"{name}.{f}: {a} != {b}"


@pytest.mark.parametrize("n,extent,scenes", [
    (3000, 40, 1),    # dense-ish: sentinels + windows engage
    (800, 64, 2),     # sparse, multi-scene batch boundaries
    (4000, 24, 3),    # very dense, many z-runs
    (50, 100, 1),     # tiny: all-guard tiles, no window config
])
def test_fused_matches_oracle(n, extent, scenes):
    rng = np.random.default_rng(n + extent + scenes)
    coords = _cloud(rng, n, extent, scenes)
    spec = res16unet_graph_spec()
    g_ref, g_fast, lay = _build_both(coords, spec)
    _assert_graphs_equal(g_ref, g_fast)
    assert "pos0" in lay and len(lay["pos0"]) == len(coords)


def test_fused_matches_oracle_surface_cloud():
    # surface-like cloud (the ScanNet regime): a noisy height field gives
    # long z-gaps -> combined/bottom/top sentinel demands of every kind
    rng = np.random.default_rng(7)
    xs, ys = np.meshgrid(np.arange(48), np.arange(48))
    z = (8 + 4 * np.sin(xs / 5.0) + rng.integers(0, 3, xs.shape)).astype(
        np.int32)
    pts = np.stack([xs.ravel(), ys.ravel(), z.ravel()], axis=1).astype(
        np.int32)
    extra = rng.integers(0, 48, size=(500, 3)).astype(np.int32)
    coords = np.concatenate([pts, extra], axis=0)
    coords = np.unique(np.concatenate(
        [np.zeros((len(coords), 1), np.int32), coords], axis=1), axis=0)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = res16unet_graph_spec()
    g_ref, g_fast, _ = _build_both(coords, spec)
    _assert_graphs_equal(g_ref, g_fast)


def test_fused_ship_coords_mode():
    rng = np.random.default_rng(3)
    coords = _cloud(rng, 1500, 32, 2)
    spec = res16unet_graph_spec()
    caps = [flex_bucket(len(coords))] * spec.num_levels
    g_ref = graph_host.build_graph(
        coords, spec, caps, flex=True, drop_redundant=True, validate=False,
        ship_coords=True,
    )
    g_fast = graph_fused.build_graph_fused(
        coords, spec, caps, ship_coords=True)
    assert g_fast is not None
    for l, (lr, lf) in enumerate(zip(g_ref.levels, g_fast.levels)):
        assert lr.coords.dtype == lf.coords.dtype
        np.testing.assert_array_equal(lr.coords, lf.coords, err_msg=f"l{l}")
