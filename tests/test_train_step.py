"""Data-parallel train step: runs on an 8-device CPU mesh, loss decreases,
and multi-device results match single-device on the same global batch."""

import jax
import numpy as np
import pytest

from __graft_entry__ import _build_batch, dryrun_multichip
from languagegroundedsemseg_tpu.data.batching import BatchBuilder
from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss
from languagegroundedsemseg_tpu.models.res16unet import Res16UNet14A, res16unet_graph_spec
from languagegroundedsemseg_tpu.parallel.dp import shard_train_step, stack_batches
from languagegroundedsemseg_tpu.parallel.mesh import make_mesh
from languagegroundedsemseg_tpu.train.solvers import sgd_torch
from languagegroundedsemseg_tpu.train.state import TrainState
from languagegroundedsemseg_tpu.train.step import make_train_step


def _objective(logits, _feats, batch, _key, row_mask):
    return (
        cross_entropy_loss(logits, batch.labels, ignore_index=255, row_mask=row_mask),
        {},
    )


@pytest.mark.slow
def test_dryrun_multichip_smoke():
    dryrun_multichip(8)


@pytest.mark.slow
def test_single_device_loss_decreases():
    rng = np.random.default_rng(0)
    builder = BatchBuilder(spec=res16unet_graph_spec(), fixed_capacity=2048)
    batch = _build_batch(rng, builder, scenes=2, points_per_scene=1500)

    model = Res16UNet14A(out_channels=20)
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=False)
    tx = sgd_torch(0.1, weight_decay=0.0)
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx, _objective))

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(2))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_multichip_harmonization_under_divergence():
    """Cross-shard fused-map harmonization under REAL divergence
    (VERDICT r4 #6): shards build scenes of very different density at a
    pinned capacity, so per-shard fusion outcomes differ — overflow-COO
    buckets of different sizes (pad path), window annotations or fusion
    failures that differ per shard (intersect/drop path).

    Invariant pinned: harmonization is a semantic no-op — each shard's
    EVAL-mode logits through the harmonized graph equal a single-device
    forward through its own solo-built graph, bitwise-close. (Train-mode
    losses are NOT comparable shard-by-shard: the DP model syncs BN batch
    statistics across shards via psum, which legitimately differs from 8
    independent per-shard BN normalizations under divergent data.) The DP
    train step must additionally run and stay finite through the
    harmonized maps' backward paths."""
    tx = sgd_torch(0.05, weight_decay=0.0)

    def build_all():
        builder = BatchBuilder(spec=res16unet_graph_spec(), fixed_capacity=4096)
        return [
            _build_batch(np.random.default_rng(100 + i), builder, scenes=1,
                         points_per_scene=400 + 700 * i)
            for i in range(8)
        ]

    batches = build_all()

    def sig(gm):
        leaves, treedef = jax.tree_util.tree_flatten(gm)
        return (treedef, tuple(np.shape(l) for l in leaves))

    # Pre-stack: assert the shards genuinely diverge on at least one fused
    # map (otherwise this test exercises nothing beyond the identical-shard
    # one above).
    gmaps = [b.graph.gmaps for b in batches]
    common = set(gmaps[0])
    for g in gmaps[1:]:
        common &= set(g)
    diverged = [
        n for n in common if len({sig(g[n]) for g in gmaps}) > 1
    ] + [n for b in batches for n in (set(b.graph.gmaps) - common)]
    assert diverged, "scene densities failed to force fused-map divergence"

    # single-device reference: eval-mode logits per shard through its own
    # solo-built graph (fresh builds — stack_batches harmonizes in place)
    ref_batches = build_all()
    model_1 = Res16UNet14A(out_channels=10)
    b0 = ref_batches[0]
    variables = model_1.init(jax.random.PRNGKey(0), b0.feats, b0.graph, train=False)
    fwd_1 = jax.jit(lambda v, f, g: model_1.apply(v, f, g, train=False)[0])
    ref_logits = [np.asarray(fwd_1(variables, b.feats, b.graph))
                  for b in ref_batches]

    # 8-device DP over the harmonized divergent shards
    mesh = make_mesh(8)
    model_8 = Res16UNet14A(out_channels=10, axis_name="data")
    stacked = stack_batches(batches)

    from languagegroundedsemseg_tpu.parallel.dp import shard_eval_step

    p_fwd = shard_eval_step(
        lambda st, b: model_8.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            b.feats, b.graph, train=False)[0],
        mesh,
    )
    state_8 = TrainState.create(variables, tx)
    dp_logits = np.asarray(p_fwd(state_8, stacked))
    for i in range(8):
        valid = np.asarray(batches[i].graph.levels[0].valid).astype(bool)
        np.testing.assert_allclose(
            dp_logits[i][valid], ref_logits[i][valid], rtol=1e-5, atol=1e-5,
            err_msg=f"shard {i}: harmonized logits != solo-build logits",
        )

    # backward through the harmonized maps: one DP train step, finite loss
    step_8 = make_train_step(model_8, tx, _objective, axis_name="data")
    p_step = shard_train_step(step_8, mesh)
    new_8, m8 = p_step(state_8, stacked, jax.random.PRNGKey(3))
    assert np.isfinite(float(m8["loss"]))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(new_8.params))


@pytest.mark.slow
def test_multichip_grads_match_single_chip():
    """psum-mean over 8 shards == mean grad over the concatenated batch.

    We use per-device *identical* batches so the DP average must equal the
    single-device result exactly (up to fp reduction order)."""
    rng = np.random.default_rng(1)
    builder = BatchBuilder(spec=res16unet_graph_spec(), fixed_capacity=1024)
    batch = _build_batch(rng, builder, scenes=1, points_per_scene=800)

    tx = sgd_torch(0.05, weight_decay=0.0)

    # single device
    model_1 = Res16UNet14A(out_channels=10)
    variables = model_1.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=False)
    state_1 = TrainState.create(variables, tx)
    step_1 = jax.jit(make_train_step(model_1, tx, _objective))
    new_1, m1 = step_1(state_1, batch, jax.random.PRNGKey(3))

    # 8 devices, identical shard on each
    mesh = make_mesh(8)
    model_8 = Res16UNet14A(out_channels=10, axis_name="data")
    state_8 = TrainState.create(variables, tx)
    step_8 = make_train_step(model_8, tx, _objective, axis_name="data")
    p_step = shard_train_step(step_8, mesh)
    stacked = stack_batches([batch] * 8)
    new_8, m8 = p_step(state_8, stacked, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(new_1.params)
    l8 = jax.tree_util.tree_leaves(new_8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    # BN running stats nearly match: the unbiased-variance factor is
    # cnt/(cnt-1) with the *global* count (8x larger under sync BN), so a
    # systematic relative gap of up to ~7/(8*cnt_min) is expected — exactly
    # like torch SyncBN. The deepest level of this tiny scene has ~100
    # valid voxels -> allow ~1.5e-2.
    s1 = jax.tree_util.tree_leaves(new_1.batch_stats)
    s8 = jax.tree_util.tree_leaves(new_8.batch_stats)
    for a, b in zip(s1, s8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1.5e-2, atol=1e-4)
