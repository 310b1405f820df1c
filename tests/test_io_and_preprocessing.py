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


def test_stanford_preprocessing_rooms_and_splits(tmp_path):
    from languagegroundedsemseg_tpu.data.preprocessing.stanford import main as pp_main
    from languagegroundedsemseg_tpu.data.stanford import CLASSES
    from languagegroundedsemseg_tpu.utils.ply import read_ply_cloud

    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    for area, room in (("Area_1", "office_1"), ("Area_5", "hallway_2")):
        ann = raw / area / room / "Annotations"
        ann.mkdir(parents=True)
        for inst, cls in (("chair_1", "chair"), ("wall_3", "wall")):
            pts = np.c_[rng.normal(size=(20, 3)), rng.integers(0, 256, (20, 3))]
            np.savetxt(str(ann / f"{inst}.txt"), pts, fmt="%.3f")
    # a malformed line must be dropped, not crash (Area_5/hallway_6 quirk)
    with open(raw / "Area_1" / "office_1" / "Annotations" / "board_1.txt", "w") as f:
        f.write("1.0 2.0 3.0 10 20 30\n1.0 2.0 \x1b3.0 10 20 30\n")

    out = tmp_path / "out"
    pp_main(["--input", str(raw), "--output", str(out)])

    xyz, rgb, labels, _ = read_ply_cloud(str(out / "Area_1" / "office_1.ply"))
    assert len(xyz) == 41  # 20 chair + 20 wall + 1 good board line
    ids = set(np.unique(labels).tolist())
    assert ids == {CLASSES.index("chair"), CLASSES.index("wall"), CLASSES.index("board")}
    train = (out / "area1245.txt").read_text().split()
    val = (out / "area5.txt").read_text().split()
    assert train == ["Area_1/office_1.ply"]
    assert val == ["Area_5/hallway_2.ply"]


def test_camera_project_backproject_roundtrip():
    from languagegroundedsemseg_tpu.utils.camera import Camera

    cam = Camera({"focal_length": 500.0, "pp_x": 32.0, "pp_y": 24.0})
    depth = np.zeros((48, 64), np.float32)
    depth[10, 20] = 200.0
    depth[30, 40] = 350.0
    pts = cam.backproject(depth)
    assert pts.shape == (2, 6)
    # projecting the backprojected points lands on the source pixels
    uvz = cam.project(pts[:, :3])
    np.testing.assert_allclose(uvz[:, 0], [20, 40], atol=1e-4)
    np.testing.assert_allclose(uvz[:, 1], [10, 30], atol=1e-4)
    np.testing.assert_allclose(uvz[:, 2], [200, 350], atol=1e-3)
    # pruning: max_depth drops the far point
    assert cam.backproject(depth, max_depth=250.0).shape[0] == 1


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
