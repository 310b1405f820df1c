"""Classifier fine-tuning stage: per-epoch resampled feature dataset +
linear-classifier loop (data/feature_dataset.py, train/classifier.py).

The reference calls train_dataset.resample_features() per epoch
(lib/train_test/pl_ClassifierTrainer.py:120) but ships no dataset class;
these tests pin OUR implementation of the documented contract."""

import numpy as np

from languagegroundedsemseg_tpu.data.feature_dataset import (
    ResampledFeatureDataset,
    extract_features,
)
from languagegroundedsemseg_tpu.train.classifier import (
    train_classifier_on_features,
)


def _toy_features(rng, n_per_class, num_classes=5, dim=16, spread=0.3):
    centers = rng.normal(size=(num_classes, dim)).astype(np.float32) * 3
    feats, labels = [], []
    for c, n in enumerate(n_per_class):
        feats.append(centers[c] + spread * rng.normal(size=(n, dim)))
        labels.append(np.full(n, c))
    return (np.concatenate(feats).astype(np.float32),
            np.concatenate(labels).astype(np.int64))


def test_resampling_balances_the_long_tail():
    rng = np.random.default_rng(0)
    # long tail: class 4 has only 3 samples, class 0 has 1000
    feats, labels = _toy_features(rng, [1000, 400, 100, 20, 3])
    ds = ResampledFeatureDataset(feats, labels, samples_per_class=64, seed=1)
    drawn = labels[ds._epoch_idx]
    counts = np.bincount(drawn, minlength=5)
    # every class contributes exactly the quota (tail draws with replacement)
    assert (counts == 64).all(), counts
    # the tail class's draw uses only its 3 distinct pool rows
    tail_rows = set(ds._epoch_idx[drawn == 4])
    assert tail_rows <= set(np.flatnonzero(labels == 4))


def test_resample_changes_epoch_subset():
    rng = np.random.default_rng(1)
    feats, labels = _toy_features(rng, [500, 500, 500, 500, 500])
    ds = ResampledFeatureDataset(feats, labels, samples_per_class=32, seed=2)
    e0 = ds._epoch_idx.copy()
    ds.resample_features()
    e1 = ds._epoch_idx.copy()
    assert len(e0) == len(e1) == 5 * 32
    assert not np.array_equal(np.sort(e0), np.sort(e1))


def test_batches_are_static_shape():
    rng = np.random.default_rng(2)
    feats, labels = _toy_features(rng, [40, 40, 40, 40, 40])
    ds = ResampledFeatureDataset(feats, labels, samples_per_class=30, seed=0)
    sizes = {f.shape[0] for f, _ in ds.batches(64)}
    assert sizes == {64}  # tail batch wraps to the static size


def test_classifier_learns_on_separable_features():
    rng = np.random.default_rng(3)
    feats, labels = _toy_features(rng, [300, 300, 300, 40, 10])
    ds = ResampledFeatureDataset(feats, labels, samples_per_class=64, seed=0)
    val = ResampledFeatureDataset(feats, labels, samples_per_class=16, seed=9)
    _, hist = train_classifier_on_features(
        ds, num_classes=5, epochs=4, batch_size=64, lr=0.2, val=val)
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert hist[-1]["val_acc"] > 0.9


def test_extract_features_pools_valid_rows():
    import jax.numpy as jnp

    class _Lvl:
        def __init__(self, m):
            self._m = m

        def bool_mask(self):
            return jnp.asarray(self._m)

    class _Graph:
        def __init__(self, m):
            self.levels = [_Lvl(m)]

    class _Batch:
        def __init__(self, feats, labels, m):
            self.labels = jnp.asarray(labels)
            self.graph = _Graph(m)
            self._f = feats

    rng = np.random.default_rng(4)
    batches = []
    for _ in range(3):
        f = rng.normal(size=(32, 8)).astype(np.float32)
        l = rng.integers(0, 5, size=32).astype(np.int32)
        m = np.ones(32, bool)
        m[-4:] = False          # padding rows
        l[0] = 255              # ignore row
        batches.append(_Batch(f, l, m))

    def eval_fn(b):
        return None, jnp.asarray(b._f)

    feats, labels = extract_features(eval_fn, batches)
    assert feats.shape == (3 * 27, 8)
    assert (labels != 255).all() and labels.max() < 5
