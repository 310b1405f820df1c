"""Sparse conv op vs dense numpy oracle + gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from languagegroundedsemseg_tpu.ops.spconv import (
    _gather_rows,
    pointwise_conv,
    sparse_avg_pool,
    sparse_conv,
    sparse_max_pool,
    sparse_sum_pool,
)
from languagegroundedsemseg_tpu.sparse import GraphSpec, MapSpec, build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import default_capacities
from languagegroundedsemseg_tpu.sparse.offsets import ConvKind, KernelRegion, region_offsets
from oracles import conv_oracle, make_cloud, transpose_conv_oracle


def _setup(n=250, cin=5, cout=7, seed=0):
    rng = np.random.default_rng(seed)
    coords = make_cloud(rng, n=n)
    spec = GraphSpec(
        num_levels=2,
        maps={
            "k3": MapSpec(0, 0, ConvKind(3)),
            "down0": MapSpec(0, 1, ConvKind(2, stride=2)),
            "up1": MapSpec(1, 0, ConvKind(2, stride=2, transpose=True)),
        },
    )
    g = build_graph(coords, spec, default_capacities(320, 2, ratios=[1, 1]), drop_redundant=False)
    n0, n1 = int(g.levels[0].num), int(g.levels[1].num)
    feats0 = rng.normal(size=(g.levels[0].capacity, cin)).astype(np.float32)
    feats1 = rng.normal(size=(g.levels[1].capacity, cin)).astype(np.float32)
    return rng, g, feats0, feats1, n0, n1, cin, cout


def test_stride1_conv_matches_oracle():
    rng, g, feats0, _, n0, _, cin, cout = _setup()
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    km = g.maps["k3"]
    out = sparse_conv(jnp.asarray(feats0), jnp.asarray(w), km.idx, center_slot=km.center_slot)
    lv0 = np.asarray(g.levels[0].coords)[:n0]
    offs = region_offsets(KernelRegion.HYPER_CUBE, 3, 1, 1)
    want = conv_oracle(lv0, feats0, offs, w, lv0)
    np.testing.assert_allclose(np.asarray(out)[:n0], want, rtol=2e-4, atol=2e-4)
    assert km.center_slot == 13  # the zero offset of the canonical k3 order


def test_strided_conv_matches_oracle():
    rng, g, feats0, _, n0, n1, cin, cout = _setup(seed=1)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    out = sparse_conv(jnp.asarray(feats0), jnp.asarray(w), g.maps["down0"].idx)
    lv0 = np.asarray(g.levels[0].coords)[:n0]
    lv1 = np.asarray(g.levels[1].coords)[:n1]
    offs = region_offsets(KernelRegion.HYPER_CUBE, 2, 1, 1)
    want = conv_oracle(lv0, feats0, offs, w, lv1)
    np.testing.assert_allclose(np.asarray(out)[:n1], want, rtol=2e-4, atol=2e-4)


def test_transpose_conv_matches_oracle():
    rng, g, _, feats1, n0, n1, cin, cout = _setup(seed=2)
    w = rng.normal(size=(8, cin, cout)).astype(np.float32)
    out = sparse_conv(jnp.asarray(feats1), jnp.asarray(w), g.maps["up1"].idx)
    lv0 = np.asarray(g.levels[0].coords)[:n0]
    lv1 = np.asarray(g.levels[1].coords)[:n1]
    offs = region_offsets(KernelRegion.HYPER_CUBE, 2, 1, 1)
    want = transpose_conv_oracle(lv1, feats1, offs, w, lv0)
    np.testing.assert_allclose(np.asarray(out)[:n0], want, rtol=2e-4, atol=2e-4)
    # every fine voxel has exactly one coarse parent
    valid_slots = (np.asarray(g.maps["up1"].idx)[:, :n0] >= 0).sum(axis=0)
    np.testing.assert_array_equal(valid_slots, 1)


def _plain_conv(x, w, idx):
    """Reference implementation without custom VJP, for gradient parity."""
    out = 0.0
    for k in range(w.shape[0]):
        g = _gather_rows(x, idx[k])
        out = out + g @ w[k]
    return out


def test_custom_vjp_matches_autodiff():
    rng, g, feats0, _, n0, _, cin, cout = _setup(n=120, seed=3)
    w = rng.normal(size=(27, cin, cout)).astype(np.float32)
    idx = g.maps["k3"].idx
    # Padding-row cotangents are zero in real training (losses mask them);
    # the center fast path relies on this for dW correctness.
    cotangent = rng.normal(size=(g.levels[0].capacity, cout)).astype(np.float32)
    cotangent[n0:] = 0.0

    def loss_custom(x, w):
        return (sparse_conv(x, w, idx, center_slot=g.maps["k3"].center_slot) * cotangent).sum()

    def loss_plain(x, w):
        return (_plain_conv(x, w, idx) * cotangent).sum()

    gx1, gw1 = jax.grad(loss_custom, argnums=(0, 1))(jnp.asarray(feats0), jnp.asarray(w))
    gx2, gw2 = jax.grad(loss_plain, argnums=(0, 1))(jnp.asarray(feats0), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4, atol=1e-4)


def test_pointwise_conv():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(50, 6)).astype(np.float32)
    w = rng.normal(size=(6, 9)).astype(np.float32)
    b = rng.normal(size=(9,)).astype(np.float32)
    out = pointwise_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(out), x @ w + b, rtol=1e-5, atol=1e-5)


def test_pools_match_oracle():
    rng, g, feats0, _, n0, n1, cin, _ = _setup(seed=5)
    idx = np.asarray(g.maps["down0"].idx)
    s = np.zeros((idx.shape[1], cin))
    c = np.zeros((idx.shape[1], 1))
    mx = np.full((idx.shape[1], cin), -np.inf)
    for k in range(8):
        v = idx[k] >= 0
        s[v] += feats0[idx[k][v]]
        c[v] += 1
        mx[v] = np.maximum(mx[v], feats0[idx[k][v]])
    avg = s / np.maximum(c, 1)
    mx[~np.isfinite(mx)] = 0.0

    got_sum = np.asarray(sparse_sum_pool(jnp.asarray(feats0), g.maps["down0"].idx))
    got_avg = np.asarray(sparse_avg_pool(jnp.asarray(feats0), g.maps["down0"].idx))
    got_max = np.asarray(sparse_max_pool(jnp.asarray(feats0), g.maps["down0"].idx))
    np.testing.assert_allclose(got_sum[:n1], s[:n1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_avg[:n1], avg[:n1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_max[:n1], mx[:n1], rtol=1e-5, atol=1e-5)
