"""Collectives over the CPU mesh + dual-set clustering NMS."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from languagegroundedsemseg_tpu.insseg.clustering import Clustering
from languagegroundedsemseg_tpu.parallel.collectives import (
    all_gather_features,
    all_reduce_mean,
)
from languagegroundedsemseg_tpu.parallel.mesh import make_mesh


def test_all_gather_features_roundtrip_and_grad():
    mesh = make_mesh(8)
    cap, f = 16, 4
    x = np.arange(8 * cap * f, dtype=np.float32).reshape(8 * cap, f)

    def fn(shard):
        g = all_gather_features(shard, "data")
        return jnp.sum(g * g) * jnp.ones(shard.shape[:1])  # per-shard scalar field

    smapped = shard_map(fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"), check_vma=False)
    out = np.asarray(jax.jit(smapped)(x))
    np.testing.assert_allclose(out, (x * x).sum(), rtol=1e-6)

    # differentiable: grad of sum of gathered squares = 2x on every shard
    def loss(x):
        def inner(shard):
            g = all_gather_features(shard, "data")
            return jnp.sum(g * g)[None] / 8.0  # same value on all shards
        return shard_map(inner, mesh=mesh, in_specs=P("data"), out_specs=P("data"), check_vma=False)(x).sum()

    grad = np.asarray(jax.jit(jax.grad(loss))(x))
    np.testing.assert_allclose(grad, 2 * x, rtol=1e-5)


def test_all_reduce_mean():
    mesh = make_mesh(8)
    x = np.arange(8, dtype=np.float32)[:, None]

    def fn(shard):
        return all_reduce_mean(shard, "data")

    out = np.asarray(shard_map(fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"), check_vma=False)(x))
    np.testing.assert_allclose(out, x.mean())


def test_dual_set_nms_suppresses_duplicates():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.01, (300, 3)) + [0, 0, 0]
    b = rng.normal(0, 0.01, (300, 3)) + [2, 0, 0]
    pts = np.concatenate([a, b]).astype(np.float32)
    scores = np.zeros((600, 4), np.float32)
    scores[:, 1] = 10.0  # everything class 1, confident
    scores = np.exp(scores) / np.exp(scores).sum(1, keepdims=True)

    cl = Clustering(ignored_labels=[], class_mapping=np.arange(4), thresh=0.05,
                    min_points=50, propose_points=100)
    single = cl.get_instances(pts, scores)
    dual = cl.get_instances_dual_set(pts, pts + 1e-4, scores)
    # both coordinate sets produce the same 2 blobs; NMS merges duplicates
    assert len(single) == 2
    assert len(dual) == 2
