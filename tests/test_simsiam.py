"""Paired-view SimSiam pretraining path."""

import jax
import numpy as np
import pytest

from languagegroundedsemseg_tpu.config import Config
from languagegroundedsemseg_tpu.data.batching import BatchBuilder
from languagegroundedsemseg_tpu.data.loader import load_dataset
from languagegroundedsemseg_tpu.models.clip_models import Res16UNet34DPaired
from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec
from languagegroundedsemseg_tpu.train.simsiam import build_paired_batch, make_simsiam_train_step
from languagegroundedsemseg_tpu.train.solvers import sgd_torch
from languagegroundedsemseg_tpu.train.state import TrainState


def test_paired_batch_correspondences_match_coords():
    cfg = Config(ignore_label=255, fixed_capacity=2048)
    ds = load_dataset("SyntheticTiny20Dataset")(cfg, phase="train", augment_data=False)
    builder = BatchBuilder(spec=res16unet_graph_spec(), ignore_index=255, fixed_capacity=2048)
    rng = np.random.default_rng(0)
    b1, b2, corrs1, corrs2 = build_paired_batch(builder, ds, [0, 1], rng, dropout_ratio=0.3)

    n1 = int(np.asarray(b1.graph.levels[0].num))
    ok = corrs1[:n1] >= 0
    assert ok.mean() > 0.4
    # same-label correspondence (augment off -> labels should agree)
    l1 = np.asarray(b1.labels)[:n1][ok]
    l2 = np.asarray(b2.labels)[np.asarray(corrs1[:n1][ok])]
    assert (l1 == l2).mean() > 0.95
    # batch column must match too (correspondences stay within a scene)
    c1 = np.asarray(b1.graph.levels[0].coords)[:n1][ok]
    c2 = np.asarray(b2.graph.levels[0].coords)[np.asarray(corrs1[:n1][ok])]
    assert (c1[:, 0] == c2[:, 0]).all()


@pytest.mark.slow
def test_simsiam_train_step_decreases_anchor_loss():
    cfg = Config(
        ignore_label=255, fixed_capacity=2048, balanced_category_sampling=False,
    )
    ds = load_dataset("SyntheticTiny20Dataset")(cfg, phase="train", augment_data=True)
    builder = BatchBuilder(spec=res16unet_graph_spec(), ignore_index=255, fixed_capacity=2048)
    rng = np.random.default_rng(1)
    model = Res16UNet34DPaired(
        out_channels=20, LAYERS=(1,) * 8, PLANES=(16, 32, 64, 128, 96, 96, 96, 96)
    )
    b1, b2, c1, c2 = build_paired_batch(builder, ds, [0], rng)
    variables = model.init(
        jax.random.PRNGKey(0), b1.feats, b1.graph, train=False,
        feats2=b2.feats, graph2=b2.graph,
    )
    tx = sgd_torch(0.5, weight_decay=0.0)
    state = TrainState.create(variables, tx)
    anchors = ds.loaded_text_features[:, 0, :][:, :96]  # match feature width
    step = jax.jit(make_simsiam_train_step(model, tx, cfg, anchors))

    import jax.numpy as jnp

    losses = []
    for i in range(5):
        state, metrics = step(state, b1, b2, jnp.asarray(c1), jnp.asarray(c2), jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
