"""Prediction visualization + confusion dumps.

Mirror of reference lib/utils.py:340-435 visualize_results and
lib/pc_utils.py colorize helpers: write colored pred/gt/rgb .ply per scene
and pickle per-scene confusion matrices.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from languagegroundedsemseg_tpu.eval.miou import fast_hist
from languagegroundedsemseg_tpu.utils.ply import write_ply


def colorize_labels(labels: np.ndarray, color_map: Dict[int, tuple]) -> np.ndarray:
    out = np.zeros((len(labels), 3), dtype=np.float32)
    for lab, color in color_map.items():
        out[labels == lab] = color
    return out


def visualize_results(
    out_dir: str,
    scene_name: str,
    coords_xyz: np.ndarray,
    colors: Optional[np.ndarray],
    pred: np.ndarray,
    target: np.ndarray,
    color_map: Dict[int, tuple],
    num_labels: int,
    iteration: int = 0,
    save_confusion: bool = True,
):
    """Write {scene}_pred/gt/rgb.ply + confusion pickle + raw pred npy (the
    *pred*NNNN.npy files test_pointcloud consumes)."""
    os.makedirs(out_dir, exist_ok=True)
    write_ply(
        os.path.join(out_dir, f"{scene_name}_pred.ply"),
        coords_xyz, colorize_labels(pred, color_map),
        labels=pred,
    )
    write_ply(
        os.path.join(out_dir, f"{scene_name}_gt.ply"),
        coords_xyz, colorize_labels(target, color_map),
        labels=target,
    )
    if colors is not None:
        write_ply(os.path.join(out_dir, f"{scene_name}_rgb.ply"), coords_xyz, colors)

    np.save(
        os.path.join(out_dir, f"{scene_name}_pred_{iteration:04d}.npy"),
        np.hstack([coords_xyz, pred[:, None]]).astype(np.float32),
    )
    if save_confusion:
        hist = fast_hist(pred, target, num_labels)
        with open(os.path.join(out_dir, f"{scene_name}_confusion.pkl"), "wb") as f:
            pickle.dump(hist, f)
