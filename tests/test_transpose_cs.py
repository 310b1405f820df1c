"""Transpose (up) convs through the companion down map's ChildSumMap.

Oracle: the flat up kernel map (built with drop_redundant=False). The up
map is the exact transpose of its companion down map — offsets negate
elementwise (graph_host._map_offsets), so the down partition's
(parent, kslot) serves the up conv directly (ops/onehot_conv.py
transpose_child_sum_conv). Covers forward + both grads, the scatter
fallback of the down conv, and the build-time dummying of up/down flats.
Replaces the reference's MinkowskiConvolutionTranspose path (consumed at
models/modules/common.py:179-236).
"""

import jax
import jax.numpy as jnp
import numpy as np

from languagegroundedsemseg_tpu.ops.onehot_conv import (
    child_sum_conv,
    transpose_child_sum_conv,
)
from languagegroundedsemseg_tpu.ops.spconv import sparse_conv
from languagegroundedsemseg_tpu.sparse import GraphSpec, MapSpec, build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import pack_keys
from languagegroundedsemseg_tpu.sparse.offsets import ConvKind
from languagegroundedsemseg_tpu.sparse.types import ChildSumMap
from oracles import make_cloud

CAP0, CAP1 = 2048, 1024


def _spec():
    return GraphSpec(num_levels=2, maps={
        "down0": MapSpec(0, 1, ConvKind(kernel_size=2, stride=2),
                         companion="up1", keep_flat=False),
        "up1": MapSpec(1, 0, ConvKind(kernel_size=2, stride=2,
                                      transpose=True), companion="down0",
                       keep_flat=False),
    })


def _graph(seed=0, n=1500):
    rng = np.random.default_rng(seed)
    coords = make_cloud(rng, n=n, extent=24)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    g = build_graph(coords, _spec(), (CAP0, CAP1), drop_redundant=False)
    return rng, g


def test_childsum_always_built():
    _, g = _graph()
    assert isinstance(g.gmaps["down0"], ChildSumMap)
    # up map served through the companion: no gmap of its own
    assert "up1" not in g.gmaps


def test_transpose_cs_matches_flat_up():
    rng, g = _graph(1)
    cs = g.gmaps["down0"]
    up_idx = np.asarray(g.maps["up1"].idx)
    assert up_idx.shape[1] > 1
    n1 = int(g.levels[1].num)
    for cin, cout in ((8, 16), (24, 8)):
        x = np.zeros((CAP1, cin), np.float32)
        x[:n1] = rng.standard_normal((n1, cin))
        w = rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.3
        b = rng.standard_normal((cout,)).astype(np.float32)
        ref = sparse_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(up_idx),
                          jnp.asarray(b))
        out = transpose_child_sum_conv(jnp.asarray(x), jnp.asarray(w), cs,
                                       jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_transpose_cs_grads_match_flat_up():
    rng, g = _graph(2)
    cs = g.gmaps["down0"]
    up_idx = jnp.asarray(np.asarray(g.maps["up1"].idx))
    n1 = int(g.levels[1].num)
    cin, cout = 12, 20
    x = np.zeros((CAP1, cin), np.float32)
    x[:n1] = rng.standard_normal((n1, cin))
    w = rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.3
    r = rng.standard_normal((CAP0, cout)).astype(np.float32)

    def loss_ref(x, w):
        return jnp.sum(sparse_conv(x, w, up_idx) * r)

    def loss_new(x, w):
        return jnp.sum(transpose_child_sum_conv(x, w, cs) * r)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w))
    gx, gw = jax.grad(loss_new, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_childsum_scatter_fallback_matches_flat_down():
    """On CPU child_sum_conv takes the scatter path — must equal the flat
    gather conv in fwd and both grads."""
    rng, g = _graph(3)
    cs = g.gmaps["down0"]
    down_idx = jnp.asarray(np.asarray(g.maps["down0"].idx))
    n0 = int(g.levels[0].num)
    cin, cout = 8, 24
    x = np.zeros((CAP0, cin), np.float32)
    x[:n0] = rng.standard_normal((n0, cin))
    w = rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.3
    r = rng.standard_normal((CAP1, cout)).astype(np.float32)

    ref = sparse_conv(jnp.asarray(x), jnp.asarray(w), down_idx)
    out = child_sum_conv(jnp.asarray(x), jnp.asarray(w), cs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    def loss_ref(x, w):
        return jnp.sum(sparse_conv(x, w, down_idx) * r)

    def loss_new(x, w):
        return jnp.sum(child_sum_conv(x, w, cs) * r)

    gx_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w))
    gx, gw = jax.grad(loss_new, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_flats_dummied_in_drop_redundant_builds():
    rng = np.random.default_rng(4)
    coords = make_cloud(rng, n=1500, extent=24)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    g = build_graph(coords, _spec(), (CAP0, CAP1), drop_redundant=True)
    assert g.maps["down0"].idx.shape[1] == 1  # served by ChildSumMap
    assert g.maps["up1"].idx.shape[1] == 1  # served via the companion
    assert isinstance(g.gmaps["down0"], ChildSumMap)
