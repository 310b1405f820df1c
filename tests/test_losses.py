"""Loss semantics vs torch-style oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from languagegroundedsemseg_tpu.losses.balancing import balanced_loss_masking, split_masks_from_sets
from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss, focal_loss
from languagegroundedsemseg_tpu.losses.contrastive import (
    contrastive_language_loss,
    feature_sim,
    l2_anchor_loss,
    sample_negatives,
)
from languagegroundedsemseg_tpu.losses.simsiam import (
    point_simsiam_loss,
    recall_cross_entropy,
    soft_iou_loss,
)
from languagegroundedsemseg_tpu.losses.supcon import point_supcon_loss


def _torch_ce(logits, labels, ignore):
    import torch
    import torch.nn.functional as F

    return F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels).long(), ignore_index=ignore
    ).item()


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(100, 7)).astype(np.float32)
    labels = rng.integers(0, 7, 100).astype(np.int32)
    labels[:10] = 255
    ours = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), 255))
    theirs = _torch_ce(logits, labels, 255)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_weighted_ce_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(80, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 80).astype(np.int32)
    w = rng.random(5).astype(np.float32) + 0.5
    ours = float(
        cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), 255, jnp.asarray(w))
    )
    theirs = F.cross_entropy(
        torch.tensor(logits), torch.tensor(labels).long(), weight=torch.tensor(w)
    ).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_focal_reduces_to_ce_at_gamma0():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(60, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 60).astype(np.int32)
    f = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=0.0, ignore_index=255))
    c = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), 255))
    np.testing.assert_allclose(f, c, rtol=1e-5)


def test_focal_downweights_easy():
    logits = np.zeros((2, 2), np.float32)
    logits[0] = [5.0, -5.0]   # easy correct
    logits[1] = [0.1, -0.1]   # hard
    labels = np.zeros(2, np.int32)
    f = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0, ignore_index=255, reduction="none")
    c = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels), 255, reduction="none")
    ratio = np.asarray(f) / np.maximum(np.asarray(c), 1e-12)
    assert ratio[0] < ratio[1]  # easy example suppressed more


def test_negative_sampling_excludes_self():
    labels = jnp.asarray(np.arange(50) % 7)
    neg = np.asarray(sample_negatives(jax.random.PRNGKey(0), labels, 7, 16))
    assert (neg != np.asarray(labels)[:, None]).all()
    assert neg.min() >= 0 and neg.max() < 7


def test_contrastive_language_loss_pulls_and_pushes():
    rng = np.random.default_rng(3)
    anchors = rng.normal(size=(5, 16)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=1, keepdims=True)
    labels = rng.integers(0, 5, 200).astype(np.int32)
    aligned = anchors[labels] + rng.normal(0, 0.01, (200, 16)).astype(np.float32)
    random_f = rng.normal(size=(200, 16)).astype(np.float32)
    la, _, _ = contrastive_language_loss(
        jax.random.PRNGKey(0), jnp.asarray(aligned), jnp.asarray(labels), jnp.asarray(anchors)
    )
    lr_, _, _ = contrastive_language_loss(
        jax.random.PRNGKey(0), jnp.asarray(random_f), jnp.asarray(labels), jnp.asarray(anchors)
    )
    assert float(la) < float(lr_)


def test_latent_attribute_augmentation_semantics():
    """Reference math (ContrastiveLanguageLoss.py:61-69,161-166): eligible
    categories' features rotate through one attribute head; pos_slot points
    at the attributed anchor (a+1); non-eligible points untouched."""
    from languagegroundedsemseg_tpu.losses.contrastive import latent_attribute_augmentation

    rng = np.random.default_rng(0)
    d, a, c = 8, 3, 4
    feats = rng.normal(size=(40, d)).astype(np.float32)
    labels = (np.arange(40) % c).astype(np.int32)
    labels[-2:] = 255  # ignored rows never augment
    proj = rng.normal(size=(a, d, d)).astype(np.float32)
    tail = np.array([False, False, True, True])
    out, slot = latent_attribute_augmentation(
        jax.random.PRNGKey(1), jnp.asarray(feats), jnp.asarray(labels),
        jnp.asarray(proj), jnp.asarray(tail), aug_prob=1.0,
    )
    out, slot = np.asarray(out), np.asarray(slot)
    valid = labels != 255
    for i in np.nonzero(valid)[0]:
        if tail[labels[i]]:
            assert 1 <= slot[i] <= a
            np.testing.assert_allclose(
                out[i], feats[i] @ proj[slot[i] - 1], rtol=1e-4, atol=1e-5
            )
        else:
            assert slot[i] == 0
            np.testing.assert_array_equal(out[i], feats[i])
    # same category -> same attribute draw (the reference augments per group)
    for cat in (2, 3):
        s = slot[valid & (labels == cat)]
        assert (s == s[0]).all()
    assert (slot[~valid] == 0).all()
    # prob 0 -> identity
    out0, slot0 = latent_attribute_augmentation(
        jax.random.PRNGKey(1), jnp.asarray(feats), jnp.asarray(labels),
        jnp.asarray(proj), jnp.asarray(tail), aug_prob=0.0,
    )
    np.testing.assert_array_equal(np.asarray(out0), feats)
    assert (np.asarray(slot0) == 0).all()


def test_contrastive_loss_uses_attributed_anchor_slot():
    """pos_slot routes positives to anchors[:, slot]; features sitting on the
    attributed anchor then give ~zero positive loss while slot-0 positives
    would not."""
    rng = np.random.default_rng(5)
    c, a, d = 4, 3, 16
    anchors = rng.normal(size=(c, a, d)).astype(np.float32)
    anchors /= np.linalg.norm(anchors, axis=-1, keepdims=True)
    labels = np.array([0, 1, 2, 3] * 10, np.int32)
    slot = np.full(40, 2, np.int32)  # all points use attributed slot 2
    feats = anchors[labels, 2]  # exactly on the attributed anchors
    _, pos_att, _ = contrastive_language_loss(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(labels),
        jnp.asarray(anchors), pos_slot=jnp.asarray(slot),
    )
    _, pos_raw, _ = contrastive_language_loss(
        jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(labels),
        jnp.asarray(anchors),
    )
    assert float(np.asarray(pos_att).max()) < 1e-5
    assert float(np.asarray(pos_raw).mean()) > 0.1


def test_representation_objective_latent_path():
    """config.instance_augmentation == 'latent' alters the loss exactly when
    attributed anchors + projection weights are supplied (VERDICT #8)."""
    from languagegroundedsemseg_tpu.config import Config
    from languagegroundedsemseg_tpu.train.objectives import make_representation_objective
    from languagegroundedsemseg_tpu.train.step import TrainBatch

    rng = np.random.default_rng(7)
    c, a, d, n = 6, 9, 16, 64
    anchors = rng.normal(size=(c, a, d)).astype(np.float32)
    proj = rng.normal(size=(a - 1, d, d)).astype(np.float32)
    split = np.zeros((c, 3), bool)
    split[4:, 2] = True  # two tail categories
    feats = rng.normal(size=(n, d)).astype(np.float32)
    labels = (np.arange(n) % c).astype(np.int32)

    class B:  # minimal TrainBatch stand-in (objective touches .labels only)
        pass

    batch = B()
    batch.labels = jnp.asarray(labels)
    row_mask = jnp.ones(n, np.float32)
    key = jax.random.PRNGKey(0)

    cfg_lat = Config(instance_augmentation="latent",
                     instance_augmentation_color_aug_prob=1.0)
    cfg_raw = Config()
    obj_lat = make_representation_objective(cfg_lat, anchors, split, projection_w=proj)
    obj_raw = make_representation_objective(cfg_raw, anchors, split)
    l_lat, _ = obj_lat(jnp.asarray(feats), None, batch, key, row_mask)
    l_raw, _ = obj_raw(jnp.asarray(feats), None, batch, key, row_mask)
    assert np.isfinite(float(l_lat)) and np.isfinite(float(l_raw))
    assert abs(float(l_lat) - float(l_raw)) > 1e-6


def test_feature_sim_classifies_aligned_features():
    rng = np.random.default_rng(4)
    anchors = rng.normal(size=(10, 32)).astype(np.float32)
    labels = rng.integers(0, 10, 100)
    feats = anchors[labels] * 3.0
    sims = np.asarray(feature_sim(jnp.asarray(feats), jnp.asarray(anchors), "cos"))
    assert (sims.argmax(1) == labels).mean() > 0.95


def test_l2_anchor_loss_zero_on_match():
    anchors = np.eye(4, dtype=np.float32)
    labels = np.array([0, 1, 2, 3], np.int32)
    out = l2_anchor_loss(jnp.asarray(anchors), jnp.asarray(labels), jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_balanced_masking_keeps_tail():
    split = split_masks_from_sets(6, [0, 1], [2, 3], [4, 5])
    labels = np.repeat(np.arange(6), 100).astype(np.int32)
    loss = np.ones(600, np.float32)
    bl = balanced_loss_masking(
        jax.random.PRNGKey(0), jnp.asarray(loss), jnp.asarray(labels), jnp.asarray(split),
        head_ratio=0.1, common_ratio=0.5, ignore_index=255,
    )
    # split means are plain means over their groups
    np.testing.assert_allclose(np.asarray(bl.split_loss), 1.0)
    np.testing.assert_allclose(np.asarray(bl.split_count), 200.0)
    # masked mean < unmasked mean since head/common were subsampled
    assert float(bl.loss) < 1.0
    # tail fully kept: with ratios 0 nothing subsampled
    bl_all = balanced_loss_masking(
        jax.random.PRNGKey(0), jnp.asarray(loss), jnp.asarray(labels), jnp.asarray(split),
        ignore_index=255,
    )
    np.testing.assert_allclose(float(bl_all.loss), 1.0)


def test_supcon_loss_runs_and_prefers_clustered():
    rng = np.random.default_rng(5)
    c = 6
    labels = rng.integers(0, c, 300).astype(np.int32)
    centers = rng.normal(size=(c, 24)).astype(np.float32) * 4
    clustered = centers[labels] + rng.normal(0, 0.05, (300, 24)).astype(np.float32)
    scattered = rng.normal(size=(300, 24)).astype(np.float32)
    hist = np.ones((c, c), np.int64)
    l1, _, _ = point_supcon_loss(
        jax.random.PRNGKey(0), jnp.asarray(clustered), jnp.asarray(labels), jnp.asarray(hist)
    )
    l2, _, _ = point_supcon_loss(
        jax.random.PRNGKey(0), jnp.asarray(scattered), jnp.asarray(labels), jnp.asarray(hist)
    )
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) < float(l2)


def test_simsiam_and_misc_losses():
    rng = np.random.default_rng(6)
    z1 = rng.normal(size=(50, 8)).astype(np.float32)
    corrs = np.arange(50, dtype=np.int32)
    # identical partner -> zero loss
    out = float(point_simsiam_loss(jnp.asarray(z1), jnp.asarray(z1), jnp.asarray(corrs)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)

    logits = rng.normal(size=(100, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 100).astype(np.int32)
    s = float(soft_iou_loss(jnp.asarray(logits), jnp.asarray(labels), 5))
    r = float(recall_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 5))
    assert 0 <= s <= 1 and np.isfinite(r)
