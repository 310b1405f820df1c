"""CRF wrapper, sparse MM, wrapper registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from languagegroundedsemseg_tpu.models import load_model, load_wrapper
from languagegroundedsemseg_tpu.models.crf import MeanFieldCRF
from languagegroundedsemseg_tpu.ops.sparse_mm import sparse_mm_bcoo, sparse_mm_padded
from languagegroundedsemseg_tpu.sparse import build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import default_capacities, pack_keys
from oracles import make_cloud


def test_sparse_mm_padded_matches_dense():
    rng = np.random.default_rng(0)
    m, k, f, nnz = 12, 9, 5, 30
    rows = rng.integers(0, m, nnz).astype(np.int32)
    cols = rng.integers(0, k, nnz).astype(np.int32)
    vals = rng.normal(size=nnz).astype(np.float32)
    rows[-5:] = -1  # padding
    dense = rng.normal(size=(k, f)).astype(np.float32)
    out = np.asarray(
        sparse_mm_padded(jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), m, jnp.asarray(dense))
    )
    want = np.zeros((m, f))
    for r, c, v in zip(rows, cols, vals):
        if r >= 0:
            want[r] += v * dense[c]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

    out2 = np.asarray(
        sparse_mm_bcoo(
            jnp.asarray(vals[rows >= 0]),
            jnp.asarray(np.stack([rows[rows >= 0], cols[rows >= 0]], 1)),
            (m, k),
            jnp.asarray(dense),
        )
    )
    np.testing.assert_allclose(out2, want, rtol=1e-5, atol=1e-5)


def test_crf_sharpens_consistent_regions():
    """Mean-field filtering should clean isolated label noise inside a
    spatially+chromatically uniform cluster."""
    rng = np.random.default_rng(1)
    n, c = 200, 4
    coords = rng.integers(0, 6, (n, 3)).astype(np.float32)  # one tight blob
    colors = np.full((n, 3), 100.0, np.float32)
    unaries = np.zeros((n, c), np.float32)
    unaries[:, 1] = 2.0       # majority class 1
    unaries[:10, 1] = 0.0
    unaries[:10, 2] = 2.0     # 10 noisy points prefer class 2
    mask = np.ones(n, np.float32)

    crf = MeanFieldCRF(num_classes=c, iterations=5, num_neighbors=8)
    variables = crf.init(
        jax.random.PRNGKey(0), jnp.asarray(unaries), jnp.asarray(coords),
        jnp.asarray(colors), jnp.asarray(mask),
    )
    refined = np.asarray(
        crf.apply(variables, jnp.asarray(unaries), jnp.asarray(coords),
                  jnp.asarray(colors), jnp.asarray(mask))
    )
    assert (refined.argmax(1) == 1).mean() > (unaries.argmax(1) == 1).mean()


def test_trilateral_time_separates_frames():
    """With the temporal coordinate in the kNN space (TrilateralCRF 7D),
    spatially coincident points from different frames stop smoothing each
    other once temporal_sigma is small."""
    rng = np.random.default_rng(3)
    n, c = 100, 3
    coords = np.tile(rng.integers(0, 4, (n // 2, 3)), (2, 1)).astype(np.float32)
    colors = np.full((n, 3), 50.0, np.float32)
    time = np.repeat(np.array([0.0, 40.0], np.float32), n // 2)
    unaries = np.zeros((n, c), np.float32)
    unaries[: n // 2, 1] = 2.0  # frame 0 -> class 1
    unaries[n // 2:, 2] = 2.0   # frame 1 -> class 2
    mask = np.ones(n, np.float32)

    crf = MeanFieldCRF(num_classes=c, iterations=5, num_neighbors=8,
                       temporal_sigma=0.5)
    args = (jnp.asarray(unaries), jnp.asarray(coords), jnp.asarray(colors),
            jnp.asarray(mask))
    v = crf.init(jax.random.PRNGKey(0), *args, time=jnp.asarray(time))
    with_t = np.asarray(crf.apply(v, *args, time=jnp.asarray(time)))
    no_t = np.asarray(crf.apply(v, *args))
    # temporal separation keeps each frame's labels intact
    acc_t = ((with_t[: n // 2].argmax(1) == 1).mean()
             + (with_t[n // 2:].argmax(1) == 2).mean()) / 2
    acc_n = ((no_t[: n // 2].argmax(1) == 1).mean()
             + (no_t[n // 2:].argmax(1) == 2).mean()) / 2
    assert acc_t >= acc_n
    assert acc_t == 1.0


@pytest.mark.slow
def test_wrapper_registry_and_forward():
    rng = np.random.default_rng(2)
    coords = make_cloud(rng, n=150)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    base_cls = load_model("Res16UNet14A")
    g = build_graph(coords, base_cls.graph_spec(3), default_capacities(256, 5, ratios=[1] * 5))
    feats = np.zeros((256, 3), np.float32)
    feats[: len(coords)] = rng.normal(size=(len(coords), 3))

    wrapper_cls = load_wrapper("BilateralCRF")
    model = wrapper_cls(base=base_cls(out_channels=6), num_classes=6, iterations=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), g, train=False)
    logits, features = model.apply(variables, jnp.asarray(feats), g, train=False)
    assert logits.shape == (256, 6)
    assert np.isfinite(np.asarray(logits)[: len(coords)]).all()


def test_yaml_overlay_and_dot_overrides(tmp_path):
    """Reference-style nested YAML + Hydra-style dot overrides map onto the
    flat Config (reference downstream/insseg/config/default.yaml,
    scripts/train_scannet_slurm.sh optimizer.lr=... overrides)."""
    from languagegroundedsemseg_tpu.config import get_config

    y = tmp_path / "overlay.yaml"
    y.write_text(
        "net:\n"
        "  model: Res16UNet14A\n"
        "  conv1_kernel_size: 5\n"
        "optimizer:\n"
        "  lr: 0.25\n"
        "  multi_step_milestones: [10, 20]\n"
        "data:\n"
        "  dataset: SyntheticTiny20Dataset\n"
        "  nonexistent_key: 1\n"  # ignored with a warning
    )
    cfg = get_config([
        "--config", str(y),
        "optimizer.lr=0.5",       # dot override beats yaml
        "misc.seed=7",
        "--batch_size", "3",      # explicit flag beats everything
    ])
    assert cfg.model == "Res16UNet14A"
    assert cfg.conv1_kernel_size == 5
    assert cfg.lr == 0.5
    assert cfg.multi_step_milestones == (10, 20)
    assert cfg.seed == 7
    assert cfg.batch_size == 3


def test_dead_flags_fail_loudly():
    import pytest

    from languagegroundedsemseg_tpu.config import Config

    with pytest.raises(ValueError, match="point_lim"):
        Config(point_lim=100)
    with pytest.raises(ValueError, match="eval_upsample"):
        Config(eval_upsample=True)


def test_streaming_ap_matches_exact():
    """2048-bin histogram AP vs exact sort-based AP (the torchmetrics
    semantics at reference pl_BaselineTrainer.py:54-70): binning only
    reorders ties within one 1/2048 probability step."""
    import numpy as np
    from languagegroundedsemseg_tpu.eval.miou import (
        ap_from_histograms,
        ap_histograms_jax,
    )

    rng = np.random.default_rng(0)
    n, c = 5000, 5
    labels = rng.integers(0, c, size=n)
    # correlated scores so AP is far from both 0 and 1
    probs = rng.uniform(size=(n, c)) * 0.7
    probs[np.arange(n), labels] += 0.3 * rng.uniform(size=n)

    tp, fp = ap_histograms_jax(probs, labels, c)
    got = ap_from_histograms(np.asarray(tp), np.asarray(fp))

    for k in range(c):
        y = (labels == k).astype(np.float64)
        order = np.argsort(-probs[:, k], kind="stable")
        ys = y[order]
        tps = np.cumsum(ys)
        precision = tps / np.arange(1, n + 1)
        recall = tps / y.sum()
        r_prev = np.concatenate([[0.0], recall[:-1]])
        want = ((recall - r_prev) * precision).sum()
        assert abs(got[k] - want) < 2e-3, (k, got[k], want)
