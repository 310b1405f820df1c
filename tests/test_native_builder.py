"""Native C++ graph builder == numpy builder, exactly."""

import numpy as np
import pytest

from languagegroundedsemseg_tpu.sparse import GraphSpec, MapSpec, build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import default_capacities, pack_keys
from languagegroundedsemseg_tpu.sparse.graph_native import (
    build_graph_native,
    native_available,
    quantize_native,
)
from languagegroundedsemseg_tpu.sparse.offsets import ConvKind
from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec
from oracles import make_cloud

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ toolchain unavailable")


def test_native_graph_matches_numpy():
    rng = np.random.default_rng(0)
    coords = make_cloud(rng, n=400)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = res16unet_graph_spec()
    caps = default_capacities(512, spec.num_levels, ratios=[1, 1, 1, 1, 1])

    g_np = build_graph(coords, spec, caps)
    g_cc = build_graph_native(coords, spec, caps)

    for l in range(spec.num_levels):
        assert int(g_np.levels[l].num) == int(g_cc.levels[l].num)
        n = int(g_np.levels[l].num)
        np.testing.assert_array_equal(
            np.asarray(g_np.levels[l].coords)[:n], np.asarray(g_cc.levels[l].coords)[:n]
        )
    for name in spec.maps:
        np.testing.assert_array_equal(
            np.asarray(g_np.maps[name].idx), np.asarray(g_cc.maps[name].idx)
        )
        assert g_np.maps[name].center_slot == g_cc.maps[name].center_slot
    assert set(g_np.gmaps) == set(g_cc.gmaps)


def test_native_quantize_matches_numpy():
    rng = np.random.default_rng(1)
    coords = rng.integers(-5, 5, size=(2000, 3)).astype(np.int32)
    got = quantize_native(coords)
    c4 = np.concatenate([np.zeros((2000, 1), np.int32), coords], axis=1)
    from languagegroundedsemseg_tpu.sparse.graph_host import quantize

    want = np.sort(quantize(c4))
    np.testing.assert_array_equal(np.sort(got), want)
