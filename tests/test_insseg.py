"""Instance segmentation subsystem: ops, clustering, evaluator, trainer."""

import numpy as np
import pytest

from languagegroundedsemseg_tpu.config import Config
from languagegroundedsemseg_tpu.insseg.evaluation import InstanceEvaluator
from languagegroundedsemseg_tpu.ops.cluster import cluster_points, connected_components
from languagegroundedsemseg_tpu.ops.points import (
    ball_query,
    furthest_point_sample,
    three_interpolate,
    three_nn,
)
import jax.numpy as jnp


def test_fps_spreads_points():
    rng = np.random.default_rng(0)
    pts = rng.random((500, 3)).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(pts), 32))
    assert len(np.unique(idx)) == 32
    # FPS min pairwise distance should beat random sampling's
    sel = pts[idx]
    d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    rnd = pts[rng.choice(500, 32, replace=False)]
    dr = np.linalg.norm(rnd[:, None] - rnd[None, :], axis=-1)
    np.fill_diagonal(dr, np.inf)
    assert d.min() > dr.min()


def test_three_nn_interpolate_matches_brute():
    rng = np.random.default_rng(1)
    ref = rng.random((200, 3)).astype(np.float32)
    query = rng.random((50, 3)).astype(np.float32)
    feats = rng.random((200, 8)).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(query), jnp.asarray(ref))
    d_brute = np.linalg.norm(query[:, None] - ref[None], axis=-1)
    idx_brute = np.argsort(d_brute, axis=1)[:, :3]
    assert set(map(tuple, np.sort(np.asarray(idx), 1))) == set(
        map(tuple, np.sort(idx_brute, 1))
    )
    out = np.asarray(three_interpolate(jnp.asarray(feats), idx, dist))
    w = 1.0 / np.maximum(np.sort(d_brute, 1)[:, :3], 1e-8) ** 2
    w = w / w.sum(1, keepdims=True)
    want = (feats[idx_brute] * w[..., None]).sum(1)
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-4)


def test_ball_query_radius():
    rng = np.random.default_rng(2)
    ref = rng.random((300, 3)).astype(np.float32)
    q = ref[:10]
    idx = np.asarray(ball_query(jnp.asarray(q), jnp.asarray(ref), 0.2, 16))
    for i in range(10):
        for j in idx[i]:
            if j >= 0:
                assert np.linalg.norm(q[i] - ref[j]) <= 0.2 + 1e-5


def test_connected_components_two_blobs():
    # two chains + isolated point
    nbrs = np.full((7, 2), -1, dtype=np.int32)
    nbrs[0, 0] = 1; nbrs[1] = [0, 2]; nbrs[2, 0] = 1          # component {0,1,2}
    nbrs[3, 0] = 4; nbrs[4] = [3, 5]; nbrs[5, 0] = 4          # component {3,4,5}
    valid = np.ones(7, np.int32)
    comp = np.asarray(connected_components(jnp.asarray(nbrs), jnp.asarray(valid)))
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4] == comp[5]
    assert comp[0] != comp[3]
    assert comp[6] not in (comp[0], comp[3])


def test_cluster_points_separates_instances():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.01, (200, 3)) + [0, 0, 0]
    b = rng.normal(0, 0.01, (200, 3)) + [1, 0, 0]
    pts = np.concatenate([a, b]).astype(np.float32)
    labels = np.zeros(400, dtype=np.int64)
    comp, n = cluster_points(pts, labels, radius=0.05, min_points=50)
    assert n == 2
    assert len(np.unique(comp[:200])) == 1
    assert len(np.unique(comp[200:])) == 1
    assert comp[0] != comp[200]
    # different semantic labels split a spatial blob
    labels2 = np.concatenate([np.zeros(100), np.ones(100), np.zeros(200)]).astype(int)
    comp2, n2 = cluster_points(pts, labels2, radius=0.05, min_points=50)
    assert n2 == 3


def test_cluster_points_dense_hub_not_split_by_neighbor_cap():
    """A hub point whose >48 lowest-index neighbors all sit on one side used
    to saturate the capped neighbor table and drop the only edge to the
    other side, splitting one dense component in two. The exact pair-set
    path (the converged state of the reference's adaptive meanActive ball
    query, bfs.py:32-39) must keep it whole."""
    rng = np.random.default_rng(7)
    # 120 satellites jammed within radius of the hub (degree 120 > any cap),
    # then a 60-point chain attached through the hub's far side.
    hub = np.zeros((1, 3))
    satellites = rng.normal(0, 0.005, (120, 3))
    chain = np.stack(
        [0.025 + 0.02 * np.arange(60), np.zeros(60), np.zeros(60)], axis=1
    )
    pts = np.concatenate([satellites, hub, chain]).astype(np.float32)
    labels = np.zeros(len(pts), dtype=np.int64)
    comp, n = cluster_points(pts, labels, radius=0.03, min_points=50)
    assert n == 1, f"dense hub split into {n} components"
    assert len(np.unique(comp)) == 1 and comp[0] >= 0


def test_radius_graph_host_matches_edges():
    from languagegroundedsemseg_tpu.ops.cluster import (
        radius_edges_host,
        radius_graph_host,
    )

    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 0.2, (80, 3)).astype(np.float32)
    labels = rng.integers(0, 2, 80)
    edges = radius_edges_host(pts, 0.05, labels)
    table = radius_graph_host(pts, 0.05, 16, labels)
    # every edge present in both directions in the padded table
    pair_set = {(int(u), int(v)) for u, v in edges} | {
        (int(v), int(u)) for u, v in edges
    }
    table_set = {
        (i, int(j)) for i in range(80) for j in table[i] if j >= 0
    }
    assert table_set <= pair_set
    # no truncation at this density -> sets equal
    assert table_set == pair_set


def test_pointnet2_sa_fp_modules():
    """SA downsamples with FPS+ball-query+maxpool; FP interpolates back —
    the module layer over the N2-N5 ops (reference pointnet2_modules.py)."""
    import jax

    from languagegroundedsemseg_tpu.models.pointnet2 import (
        FeaturePropagation,
        SetAbstraction,
    )

    rng = np.random.default_rng(0)
    n = 256
    xyz = jnp.asarray(rng.random((n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.random((n, 8)).astype(np.float32))
    mask = np.ones(n, bool); mask[-16:] = False
    mask = jnp.asarray(mask)

    sa = SetAbstraction(npoint=64, radius=0.3, nsample=16, mlp=(16, 32))
    v = sa.init(jax.random.PRNGKey(0), xyz, feats, mask)
    new_xyz, new_feats, new_mask = sa.apply(v, xyz, feats, mask)
    assert new_xyz.shape == (64, 3) and new_feats.shape == (64, 32)
    assert np.isfinite(np.asarray(new_feats)).all()
    assert np.asarray(new_mask).any()

    fp = FeaturePropagation(mlp=(24, 8))
    v2 = fp.init(jax.random.PRNGKey(1), xyz, feats, new_xyz, new_feats, new_mask)
    out = fp.apply(v2, xyz, feats, new_xyz, new_feats, new_mask)
    assert out.shape == (n, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_instance_evaluator_perfect_predictions():
    ev = InstanceEvaluator([1, 2], ["a", "b"])
    n = 500
    sem = np.concatenate([np.full(250, 1), np.full(250, 2)])
    inst = np.concatenate([np.full(125, 0), np.full(125, 1), np.full(125, 2), np.full(125, 3)])
    ev.add_gt("scene0", sem, inst)
    preds = {}
    for i in range(4):
        mask = np.zeros(n, bool)
        mask[i * 125:(i + 1) * 125] = True
        preds[i] = {"conf": 0.9, "label_id": 1 if i < 2 else 2, "pred_mask": mask}
    ev.add_prediction("scene0", preds)
    m = ev.evaluate()
    assert m["all_ap"] == 1.0 and m["ap_50"] == 1.0 and m["ap_25"] == 1.0


def test_instance_evaluator_penalizes_bad_masks():
    ev = InstanceEvaluator([1], ["a"])
    sem = np.full(400, 1)
    inst = np.concatenate([np.full(200, 0), np.full(200, 1)])
    ev.add_gt("s", sem, inst)
    # one pred covering half of each GT -> IoU ~1/3 < 0.5
    mask = np.zeros(400, bool)
    mask[100:300] = True
    ev.add_prediction("s", {0: {"conf": 0.9, "label_id": 1, "pred_mask": mask}})
    m = ev.evaluate()
    assert m["ap_50"] == 0.0
    assert m["ap_25"] > 0.0  # IoU 1/3 passes the 0.25 threshold


@pytest.mark.slow
def test_insseg_trainer_end_to_end(tmp_path):
    from languagegroundedsemseg_tpu.insseg.trainer import InssegTrainer

    cfg = Config(
        ignore_label=255, fixed_capacity=2048, batch_size=2, val_batch_size=1,
        log_dir=str(tmp_path / "insseg"), model="InstanceRes16UNet14A", lr=0.05,
    )
    tr = InssegTrainer(cfg)
    tr.fit(max_steps=3, log_every=10)
    m = tr.validate(max_scenes=1)
    assert 0.0 <= m["val_miou"] <= 1.0
    assert np.isfinite(m["val_map25"]) or np.isnan(m["val_map25"])


def test_cli_insseg_mode_dispatch(tmp_path):
    """Instance datasets route the CLI into the insseg trainer (reference
    ddp_main.py entry; VERDICT L6: no shell-heredoc launcher needed)."""
    from languagegroundedsemseg_tpu.cli.main import main

    m = main([
        "--dataset", "SyntheticInstanceDataset",
        "--model", "InstanceRes16UNet14A",
        "--fixed_capacity", "2048", "--batch_size", "2", "--val_batch_size", "1",
        "--max_iter", "2", "--ignore_label", "255",
        "--log_dir", str(tmp_path / "cli_insseg"),
    ])
    assert 0.0 <= m["val_miou"] <= 1.0


def test_instance_evaluator_duplicate_match_becomes_fp():
    """Official protocol: a second prediction matching an already-matched GT
    is a false positive with the lower confidence
    (reference evaluate_semantic_instance.py:126-141). Hand-computed AP via
    the benchmark PR integration: preds (0.9 TP), (0.8 dup FP), (0.7 TP on a
    second GT) -> AP@all overlaps = 0.25 * (2/3 + 0.5 + 1 + 1) = 19/24."""
    ev = InstanceEvaluator([1], ["a"])
    sem = np.full(300, 1)
    inst = np.concatenate([np.full(150, 0), np.full(150, 1)])
    ev.add_gt("s", sem, inst)
    m_gt0 = np.zeros(300, bool); m_gt0[:150] = True
    m_gt1 = np.zeros(300, bool); m_gt1[150:] = True
    ev.add_prediction("s", {
        0: {"conf": 0.9, "label_id": 1, "pred_mask": m_gt0},
        1: {"conf": 0.8, "label_id": 1, "pred_mask": m_gt0},  # duplicate
        2: {"conf": 0.7, "label_id": 1, "pred_mask": m_gt1},
    })
    m = ev.evaluate()
    np.testing.assert_allclose(m["ap_50"], 19.0 / 24.0, atol=1e-9)
    np.testing.assert_allclose(m["all_ap"], 19.0 / 24.0, atol=1e-9)


def test_instance_evaluator_void_protocol():
    """A prediction spilling mostly onto void (invalid-class) vertices is
    ignored, not a false positive, when proportion_ignore > overlap_th
    (reference :156-166); a pred on valid-class background IS an FP."""
    ev = InstanceEvaluator([1], ["a"])
    sem = np.concatenate([np.full(100, 1), np.zeros(100, int)])  # 100 void
    inst = np.concatenate([np.full(100, 0), np.full(100, -1)])
    ev.add_gt("s", sem, inst)
    gt_mask = np.zeros(200, bool); gt_mask[:100] = True
    void_pred = np.zeros(200, bool); void_pred[100:160] = True  # all void
    ev.add_prediction("s", {
        0: {"conf": 0.9, "label_id": 1, "pred_mask": gt_mask},
        1: {"conf": 0.95, "label_id": 1, "pred_mask": void_pred},
    })
    assert ev.evaluate()["all_ap"] == 1.0  # void pred ignored at every overlap

    # an extra pred overlapping the GT below threshold (not void) IS an FP;
    # scored higher than the TP it costs precision at full recall
    ev2 = InstanceEvaluator([1], ["a"])
    ev2.add_gt("s", sem, inst)
    low_iou = np.zeros(200, bool); low_iou[:30] = True  # IoU 0.3 vs gt0
    ev2.add_prediction("s", {
        0: {"conf": 0.9, "label_id": 1, "pred_mask": gt_mask},
        1: {"conf": 0.95, "label_id": 1, "pred_mask": low_iou},
    })
    # higher-scored FP before the TP: uninterpolated benchmark curve
    # (r=1,p=.5) -> (r=0,p=0) -> trapezoid area = 0.25
    np.testing.assert_allclose(ev2.evaluate()["ap_50"], 0.25, atol=1e-9)


def test_instance_evaluator_small_gt_filtered_and_ignored():
    """GTs below min_region_size don't participate in matching AND absorb
    prediction overlap into the ignore pool (reference :105, :160-163)."""
    ev = InstanceEvaluator([1], ["a"])
    sem = np.full(200, 1)
    # gt0: 195 verts; gt1: 5 verts (< 10 -> filtered)
    inst = np.concatenate([np.full(195, 0), np.full(5, 1)])
    ev.add_gt("s", sem, inst)
    big = np.zeros(200, bool); big[:195] = True
    small = np.zeros(200, bool); small[180:200] = True  # 15 on gt0, 5 on gt1
    ev.add_prediction("s", {
        0: {"conf": 0.9, "label_id": 1, "pred_mask": big},
        1: {"conf": 0.8, "label_id": 1, "pred_mask": small},
    })
    # small pred: IoU vs gt0 = 15/200 (no match); ignore = 5 (small gt) of 20
    # verts = 0.25 <= 0.5 -> FP at overlap .5; at overlap .25 it's 0.25 <= .25
    # -> still FP; AP@50: TP(.9) + FP(.8): p/r as in the dup test's tail
    m = ev.evaluate()
    assert m["ap_50"] == 1.0  # FP at lower score than the full-recall TP
    # with the small pred scored HIGHER the FP hurts
    ev2 = InstanceEvaluator([1], ["a"])
    ev2.add_gt("s", sem, inst)
    ev2.add_prediction("s", {
        0: {"conf": 0.9, "label_id": 1, "pred_mask": big},
        1: {"conf": 0.95, "label_id": 1, "pred_mask": small},
    })
    np.testing.assert_allclose(ev2.evaluate()["ap_50"], 0.25, atol=1e-9)


def test_instance_evaluator_hard_false_negative():
    ev = InstanceEvaluator([1], ["a"])
    sem = np.full(300, 1)
    inst = np.concatenate([np.full(150, 0), np.full(150, 1)])
    ev.add_gt("s", sem, inst)
    m0 = np.zeros(300, bool); m0[:150] = True
    ev.add_prediction("s", {0: {"conf": 0.9, "label_id": 1, "pred_mask": m0}})
    # 1 TP, 1 unmatched GT -> recall caps at 0.5 -> benchmark AP = 0.5
    np.testing.assert_allclose(ev.evaluate()["ap_50"], 0.5, atol=1e-9)


@pytest.mark.slow
def test_insseg_trainer_validates_and_checkpoints(tmp_path):
    """fit() now validates periodically and writes dual-monitor checkpoints
    (reference ddp_main.py:75-78) and supports resume."""
    import glob as g

    from languagegroundedsemseg_tpu.insseg.trainer import InssegTrainer

    cfg = Config(
        ignore_label=255, fixed_capacity=2048, batch_size=1, val_batch_size=1,
        log_dir=str(tmp_path / "i1"), model="InstanceRes16UNet14A", lr=0.05,
    )
    tr = InssegTrainer(cfg)
    tr.fit(max_steps=2, log_every=1, val_every=2, max_val_scenes=1)
    assert g.glob(str(tmp_path / "i1" / "best_val_map05*.ckpt"))
    assert g.glob(str(tmp_path / "i1" / "best_val_miou*.ckpt"))
    assert (tmp_path / "i1" / "metrics.jsonl").exists()

    cfg2 = Config(
        ignore_label=255, fixed_capacity=2048, batch_size=1, val_batch_size=1,
        log_dir=str(tmp_path / "i2"), model="InstanceRes16UNet14A", lr=0.05,
        resume=str(tmp_path / "i1"),
    )
    tr2 = InssegTrainer(cfg2)
    tr2.fit(max_steps=3, log_every=10)
    assert int(tr2.state.step) == 3  # resumed at 2, +1


@pytest.mark.slow
def test_insseg_trainer_multidevice(tmp_path):
    """Data-parallel insseg training over the 8 virtual CPU devices
    (reference trains insseg on 8 GPUs, config/default.yaml:101-111)."""
    import jax as _jax

    from languagegroundedsemseg_tpu.insseg.trainer import InssegTrainer

    n_dev = min(8, len(_jax.devices()))
    cfg = Config(
        ignore_label=255, fixed_capacity=1024, batch_size=1, val_batch_size=1,
        log_dir=str(tmp_path / "mdev"), model="InstanceRes16UNet14A", lr=0.05,
        num_devices=n_dev,
    )
    tr = InssegTrainer(cfg)
    assert tr.mesh is not None and tr.n_dev == n_dev
    tr.fit(max_steps=1, log_every=1)
    assert int(tr.state.step) == 1
