"""PLY IO roundtrips, visualization outputs, preprocessing helpers."""

import json
import os

import numpy as np

from languagegroundedsemseg_tpu.data.preprocessing.scannet import (
    limited_annotation_mask,
    point_indices_from_group,
    process_scene_insseg,
)
from languagegroundedsemseg_tpu.utils.ply import read_ply, read_ply_cloud, write_ply
from languagegroundedsemseg_tpu.utils.visualization import colorize_labels, visualize_results


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (100, 3)).astype(np.float32)
    labels = rng.integers(0, 20, 100).astype(np.int32)
    for binary in (True, False):
        p = str(tmp_path / f"t_{binary}.ply")
        write_ply(p, xyz, rgb, labels, binary=binary)
        x2, c2, l2, inst = read_ply_cloud(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-4)
        np.testing.assert_array_equal(c2, rgb.astype(np.uint8))
        np.testing.assert_array_equal(l2, labels)
        assert inst is None


def test_visualize_results_outputs(tmp_path):
    rng = np.random.default_rng(1)
    n = 50
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    pred = rng.integers(0, 3, n)
    target = rng.integers(0, 3, n)
    cmap = {0: (255, 0, 0), 1: (0, 255, 0), 2: (0, 0, 255)}
    visualize_results(str(tmp_path), "scene0", xyz, None, pred, target, cmap, 3, iteration=7)
    assert os.path.isfile(tmp_path / "scene0_pred.ply")
    assert os.path.isfile(tmp_path / "scene0_gt.ply")
    assert os.path.isfile(tmp_path / "scene0_pred_0007.npy")
    assert os.path.isfile(tmp_path / "scene0_confusion.pkl")
    saved = np.load(tmp_path / "scene0_pred_0007.npy")
    np.testing.assert_array_equal(saved[:, 3].astype(int), pred)


def test_point_indices_from_group():
    seg = np.array([5, 5, 7, 9, 7])
    inds = point_indices_from_group(seg, {"segments": [5, 9]})
    np.testing.assert_array_equal(inds, [0, 1, 3])


def test_limited_annotation_mask_ratio():
    rng = np.random.default_rng(2)
    xyz = rng.normal(size=(400, 3)).astype(np.float32)
    inst = np.concatenate([np.full(200, 0), np.full(150, 1), np.full(50, -1)])
    keep = limited_annotation_mask(xyz, inst, 0.1, rng)
    assert keep[:200].sum() == 20
    assert keep[200:350].sum() == 15
    assert keep[350:].sum() == 0  # unassigned points never annotated


def test_process_scene_insseg_writes_pth(tmp_path):
    # build a minimal fake scene dir
    scene = tmp_path / "scene0000_00"
    scene.mkdir()
    rng = np.random.default_rng(3)
    n = 60
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (n, 3)).astype(np.float32)
    write_ply(str(scene / "scene0000_00_vh_clean_2.ply"), xyz, rgb)
    with open(scene / "scene0000_00_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": [i // 10 for i in range(n)]}, f)
    with open(scene / "scene0000_00.aggregation.json", "w") as f:
        json.dump(
            {"segGroups": [{"id": 0, "label": "chair", "segments": [0, 1]},
                           {"id": 1, "label": "table", "segments": [2, 3]}]}, f
        )
    out = tmp_path / "out"
    process_scene_insseg(str(scene), str(out), lambda raw: {"chair": 5, "table": 7}[raw])
    import torch

    pts, cols, sem, inst = torch.load(str(out / "scene0000_00.pth"), weights_only=False)
    assert len(pts) == n
    assert set(np.unique(sem[:40]).astype(int)) == {5, 7}
    assert set(np.unique(inst[:40]).astype(int)) == {0, 1}
