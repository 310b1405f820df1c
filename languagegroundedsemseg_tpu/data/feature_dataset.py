"""Per-epoch class-balanced feature dataset for classifier fine-tuning.

The reference's ClassifierTrainer calls
``self.train_dataset.resample_features()`` at every epoch start
(reference lib/train_test/pl_ClassifierTrainer.py:120) but the feature
dataset class itself is ABSENT from the reference repo — a known gap.
This module implements the documented contract deliberately:

- pools of precomputed frozen-backbone features grouped by label,
- a per-epoch redraw of ``samples_per_class`` features per class
  (without replacement while the pool lasts, with replacement for tail
  classes whose pool is smaller than the quota — the long-tail balancing
  that motivates the classifier stage, reference
  scripts/fine_tune_classifier.sh),
- fixed-size shuffled batches for the jit-compiled classifier step.

``extract_features`` builds the pools by running the frozen backbone
(representation head) over a voxel loader once — the TPU-native analog of
the reference's offline feature dump.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import numpy as np


class ResampledFeatureDataset:
    """Class-balanced, per-epoch-resampled (feature, label) dataset."""

    def __init__(
        self,
        feats: np.ndarray,
        labels: np.ndarray,
        samples_per_class: int = 256,
        num_classes: Optional[int] = None,
        seed: int = 0,
    ):
        assert feats.ndim == 2 and labels.ndim == 1
        assert len(feats) == len(labels)
        self.feats = np.asarray(feats, np.float32)
        self.labels = np.asarray(labels, np.int64)
        self.num_classes = (
            int(num_classes) if num_classes is not None
            else int(self.labels.max(initial=0)) + 1
        )
        self.samples_per_class = int(samples_per_class)
        self._pools = [
            np.flatnonzero(self.labels == c) for c in range(self.num_classes)
        ]
        self._rng = np.random.default_rng(seed)
        self._epoch_idx: np.ndarray = np.zeros(0, np.int64)
        self.resample_features()

    @property
    def feature_dim(self) -> int:
        return self.feats.shape[1]

    def resample_features(self) -> None:
        """Redraw the epoch's balanced subset (the reference's per-epoch
        hook). Classes with an empty pool contribute nothing; classes
        smaller than the quota draw with replacement."""
        picks = []
        for pool in self._pools:
            if len(pool) == 0:
                continue
            if len(pool) >= self.samples_per_class:
                picks.append(self._rng.choice(
                    pool, self.samples_per_class, replace=False))
            else:
                picks.append(self._rng.choice(
                    pool, self.samples_per_class, replace=True))
        idx = (np.concatenate(picks) if picks else np.zeros(0, np.int64))
        self._rng.shuffle(idx)
        self._epoch_idx = idx

    def __len__(self) -> int:
        return len(self._epoch_idx)

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Fixed-size shuffled batches over the epoch's subset; the tail
        batch wraps around so every batch has a static shape (jit cache)."""
        n = len(self._epoch_idx)
        if n == 0:
            return
        for start in range(0, n, batch_size):
            sel = self._epoch_idx[start:start + batch_size]
            if len(sel) < batch_size:
                sel = np.concatenate(
                    [sel, self._epoch_idx[: batch_size - len(sel)]])
            yield self.feats[sel], self.labels[sel].astype(np.int32)


def extract_features(
    eval_fn: Callable,
    loader,
    max_batches: Optional[int] = None,
    ignore_index: int = 255,
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the frozen backbone over ``loader`` once and pool per-voxel
    representation features with their labels (valid rows only).

    eval_fn(batch) -> (logits_or_repr, features): the trainer's eval step
    with representation_only semantics — features are out_b (the last
    block's output, reference pl_BaselineTrainer.py model forward)."""
    feats_l, labels_l = [], []
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        _, features = eval_fn(batch)
        m = np.asarray(batch.graph.levels[0].bool_mask())
        labels = np.asarray(batch.labels)[m]
        keep = labels != ignore_index
        feats_l.append(np.asarray(features)[m][keep])
        labels_l.append(labels[keep].astype(np.int64))
    if not feats_l:
        return np.zeros((0, 1), np.float32), np.zeros(0, np.int64)
    return np.concatenate(feats_l), np.concatenate(labels_l)
