"""Res16UNet forward: shapes, determinism, and padding invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from languagegroundedsemseg_tpu.models import load_model, available_models
from languagegroundedsemseg_tpu.models.res16unet import (
    Res16UNet14A,
    Res16UNet34C,
    res16unet_graph_spec,
)
from languagegroundedsemseg_tpu.sparse import build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import default_capacities
from oracles import make_cloud


def _make_inputs(n=300, cap0=384, cin=3, seed=0):
    rng = np.random.default_rng(seed)
    coords = make_cloud(rng, n=n)
    spec = res16unet_graph_spec()
    caps = default_capacities(cap0, spec.num_levels, ratios=[1, 1, 1, 1, 1])
    g = build_graph(coords, spec, caps)
    feats = np.zeros((cap0, cin), dtype=np.float32)
    feats[: len(coords)] = rng.normal(size=(len(coords), cin))
    return g, jnp.asarray(feats), len(coords)


def test_registry_has_variants():
    names = available_models()
    for want in ["Res16UNet34C", "Res16UNet34C200", "Res16UNet14A", "Res16UNet50"]:
        assert want in names, f"{want} missing from registry"


@pytest.mark.slow
def test_forward_shapes_and_finite():
    g, feats, n = _make_inputs()
    model = Res16UNet14A(out_channels=20)
    variables = model.init(jax.random.PRNGKey(0), feats, g, train=False)
    logits, features = model.apply(variables, feats, g, train=False)
    assert logits.shape == (feats.shape[0], 20)
    assert features.shape == (feats.shape[0], 96)  # PLANES[7]
    assert np.isfinite(np.asarray(logits)[:n]).all()


def test_representation_only_skips_classifier():
    g, feats, n = _make_inputs()
    model = Res16UNet14A(out_channels=20)
    variables = model.init(jax.random.PRNGKey(0), feats, g, train=False)
    reps, feats_out = model.apply(variables, feats, g, train=False, representation_only=True)
    assert reps.shape == feats_out.shape == (feats.shape[0], 96)


def test_train_mode_updates_batch_stats():
    g, feats, _ = _make_inputs()
    model = Res16UNet14A(out_channels=20)
    variables = model.init(jax.random.PRNGKey(0), feats, g, train=False)
    (_, _), updates = model.apply(
        variables, feats, g, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


@pytest.mark.slow
def test_padding_invariance():
    """Same cloud, two different capacities -> identical valid-row outputs.

    This is the core static-shape correctness invariant: padding rows must
    never leak into BN statistics or conv gathers.
    """
    rng = np.random.default_rng(7)
    coords = make_cloud(rng, n=200)
    feats_raw = rng.normal(size=(len(coords), 3)).astype(np.float32)
    spec = res16unet_graph_spec()
    model = Res16UNet14A(out_channels=13)

    outs = []
    for cap0 in (256, 512):
        caps = default_capacities(cap0, spec.num_levels, ratios=[1, 1, 1, 1, 1])
        g = build_graph(coords, spec, caps)
        feats = np.zeros((cap0, 3), dtype=np.float32)
        feats[: len(coords)] = feats_raw
        variables = model.init(jax.random.PRNGKey(1), jnp.asarray(feats), g, train=False)
        logits, _ = model.apply(variables, jnp.asarray(feats), g, train=True, mutable=["batch_stats"])[0]
        outs.append(np.asarray(logits)[: len(coords)])
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_bottleneck_variant_forward():
    g, feats, n = _make_inputs(n=150, cap0=256)
    model = load_model("Res16UNet50")(out_channels=10)
    variables = model.init(jax.random.PRNGKey(0), feats, g, train=False)
    logits, _ = model.apply(variables, feats, g, train=False)
    assert logits.shape == (256, 10)
    assert np.isfinite(np.asarray(logits)[:n]).all()
