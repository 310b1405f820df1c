"""ScanNet-benchmark instance segmentation AP evaluator.

Functional mirror of reference downstream/insseg/datasets/evaluation/
evaluate_semantic_instance.py:50-390: per-class greedy matching of
confidence-ranked predictions to GT instances at IoU overlaps
0.5:0.95:0.05 plus 0.25; void/ignored points are subtracted from false
positives; reports (AP, AP@50, AP@25) overall and per class. Benchmark-format
export (:363-374) writes the txt mask files the official server expects.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

OVERLAPS = np.append(np.arange(0.5, 0.95, 0.05), 0.25)
MIN_REGION_SIZE = 100


class _GtInstance:
    __slots__ = ("mask", "size")

    def __init__(self, mask):
        self.mask = mask
        self.size = int(mask.sum())


class InstanceEvaluator:
    """add_gt / add_prediction per scene, then evaluate()."""

    def __init__(self, class_ids: Sequence[int], class_names: Optional[Sequence[str]] = None):
        self.class_ids = [int(c) for c in class_ids]
        self.class_names = list(class_names) if class_names else [str(c) for c in class_ids]
        # scene -> class -> list of instances
        self.gt: Dict[str, Dict[int, List[_GtInstance]]] = {}
        self.pred: Dict[str, Dict[int, List[dict]]] = {}
        self.void: Dict[str, np.ndarray] = {}

    def add_gt(self, scene: str, semantic: np.ndarray, instance_ids: np.ndarray):
        """semantic: per-point raw benchmark class ids; instance_ids: per
        point instance id (-1 = none)."""
        per_class: Dict[int, List[_GtInstance]] = defaultdict(list)
        valid_classes = set(self.class_ids)
        for iid in np.unique(instance_ids):
            if iid < 0:
                continue
            mask = instance_ids == iid
            cls = int(np.bincount(semantic[mask].astype(int)).argmax())
            if cls in valid_classes and mask.sum() >= MIN_REGION_SIZE:
                per_class[cls].append(_GtInstance(mask))
        self.gt[scene] = per_class
        # void: points whose semantic class is outside the evaluated set
        self.void[scene] = ~np.isin(semantic, self.class_ids)

    def add_prediction(self, scene: str, instances: Dict[int, dict]):
        """instances: {id: {conf, label_id (raw benchmark id), pred_mask}}."""
        per_class: Dict[int, List[dict]] = defaultdict(list)
        for inst in instances.values():
            cls = int(inst["label_id"])
            if cls in self.class_ids:
                per_class[cls].append(
                    {"conf": float(inst["conf"]), "mask": np.asarray(inst["pred_mask"], bool)}
                )
        self.pred[scene] = per_class

    def _ap_for_overlap(self, cls: int, overlap: float) -> float:
        """Greedy confidence-ranked matching across all scenes."""
        confs, tps = [], []
        n_gt = 0
        for scene, gt_classes in self.gt.items():
            gts = gt_classes.get(cls, [])
            n_gt += len(gts)
            preds = self.pred.get(scene, {}).get(cls, [])
            preds = sorted(preds, key=lambda p: -p["conf"])
            matched = np.zeros(len(gts), dtype=bool)
            void = self.void.get(scene)
            for p in preds:
                pm = p["mask"]
                psize = pm.sum()
                if psize == 0:
                    continue
                best_iou, best_j = 0.0, -1
                for j, g in enumerate(gts):
                    if matched[j]:
                        continue
                    inter = np.logical_and(pm, g.mask).sum()
                    union = psize + g.size - inter
                    iou = inter / max(union, 1)
                    if iou > best_iou:
                        best_iou, best_j = iou, j
                if best_iou > overlap and best_j >= 0:
                    matched[best_j] = True
                    confs.append(p["conf"])
                    tps.append(1)
                else:
                    # void protocol: a prediction mostly covering unlabeled
                    # points is not a false positive
                    if void is not None and psize > 0:
                        void_frac = np.logical_and(pm, void).sum() / psize
                        if void_frac > 0.5:
                            continue
                    confs.append(p["conf"])
                    tps.append(0)
        if n_gt == 0:
            return float("nan")
        if not confs:
            return 0.0
        order = np.argsort(-np.asarray(confs))
        tp = np.asarray(tps)[order]
        fp = 1 - tp
        tp_cum = tp.cumsum()
        fp_cum = fp.cumsum()
        recall = tp_cum / n_gt
        precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
        # all-point interpolated AP
        for i in range(len(precision) - 2, -1, -1):
            precision[i] = max(precision[i], precision[i + 1])
        r_prev = np.concatenate([[0.0], recall[:-1]])
        return float(np.sum((recall - r_prev) * precision))

    def evaluate(self) -> Dict[str, object]:
        """-> {'all_ap', 'ap_50', 'ap_25', 'classes': {name: {...}}}."""
        per_class = {}
        for cls, name in zip(self.class_ids, self.class_names):
            aps = np.array([self._ap_for_overlap(cls, o) for o in OVERLAPS])
            ap_range = aps[:-1]  # 0.5:0.95
            per_class[name] = {
                "ap": float(np.nanmean(ap_range)) if not np.isnan(ap_range).all() else float("nan"),
                "ap_50": float(aps[0]),
                "ap_25": float(aps[-1]),
            }
        def _mean(key):
            vals = [v[key] for v in per_class.values() if not np.isnan(v[key])]
            return float(np.mean(vals)) if vals else float("nan")

        return {
            "all_ap": _mean("ap"),
            "ap_50": _mean("ap_50"),
            "ap_25": _mean("ap_25"),
            "classes": per_class,
        }

    # -- official benchmark export (reference :363-374) ----------------------

    def export_benchmark(self, out_dir: str, scene: str, instances: Dict[int, dict]):
        os.makedirs(os.path.join(out_dir, "predicted_masks"), exist_ok=True)
        lines = []
        for i, inst in instances.items():
            rel = f"predicted_masks/{scene}_{i:03d}.txt"
            mask = np.asarray(inst["pred_mask"], dtype=np.int32)
            np.savetxt(os.path.join(out_dir, rel), mask, fmt="%d")
            lines.append(f"{rel} {inst['label_id']} {inst['conf']:.4f}")
        with open(os.path.join(out_dir, f"{scene}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
