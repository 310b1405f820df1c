"""4D spatio-temporal graph + ST model forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from languagegroundedsemseg_tpu.models import load_model
from languagegroundedsemseg_tpu.models.res16unet import STRes16UNet14A
from languagegroundedsemseg_tpu.sparse import build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import (
    default_capacities,
    pack_keys,
    quantize,
)
from languagegroundedsemseg_tpu.sparse.offsets import (
    KernelRegion,
    region_offsets,
)

pytestmark = pytest.mark.slow


def _cloud_4d(rng, n=300, extent=10, frames=3, batch=2):
    pts = rng.integers(-extent, extent, size=(n * 2, 3))
    t = rng.integers(0, frames, size=(n * 2, 1))
    b = rng.integers(0, batch, size=(n * 2, 1))
    coords = np.concatenate([b, pts, t], axis=1).astype(np.int32)
    coords = np.unique(coords, axis=0)[:n]
    return coords[np.argsort(pack_keys(coords), kind="stable")]


def test_st_region_offsets():
    offs = region_offsets(KernelRegion.SPATIAL_CUBE_TEMPORAL_CROSS, 3, 1, (1, 1, 1, 1), 4)
    assert offs.shape == (27 + 2, 4)  # spatial cube + 2 temporal arms
    assert (offs[:27, 3] == 0).all()
    assert set(offs[27:, 3].tolist()) == {-1, 1}


def test_4d_graph_and_st_forward():
    rng = np.random.default_rng(0)
    coords = _cloud_4d(rng)
    spec = STRes16UNet14A.graph_spec(3)
    assert spec.d == 4
    caps = default_capacities(384, spec.num_levels, ratios=[1] * 5)
    g = build_graph(coords, spec, caps)
    # temporal axis never downsampled
    for l, lvl in enumerate(g.levels):
        n = int(lvl.num)
        c = np.asarray(lvl.coords)[:n]
        assert (c[:, 1:4] % (1 << l) == 0).all()
        assert c[:, 4].min() >= 0 and c[:, 4].max() <= 2

    # brute-force check one ST map
    offs = region_offsets(KernelRegion.SPATIAL_CUBE_TEMPORAL_CROSS, 3, 1, (1, 1, 1, 1), 4)
    lv0 = np.asarray(g.levels[0].coords)[: int(g.levels[0].num)]
    table = {tuple(r): i for i, r in enumerate(lv0)}
    idx = np.asarray(g.maps["l0.k3"].idx)
    for i in range(0, len(lv0), 37):
        for k in range(len(offs)):
            tgt = (lv0[i, 0], *(lv0[i, 1:] + offs[k]))
            assert idx[k, i] == table.get(tgt, -1)

    feats = np.zeros((384, 3), np.float32)
    feats[: len(coords)] = rng.normal(size=(len(coords), 3))
    model = STRes16UNet14A(out_channels=7)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats), g, train=False)
    logits, _ = model.apply(variables, jnp.asarray(feats), g, train=False)
    assert logits.shape == (384, 7)
    assert np.isfinite(np.asarray(logits)[: len(coords)]).all()


def test_st_registry():
    for name in ["STRes16UNet14", "STRes16UNet18", "STRes16UNet34",
                 "STRes16UNet18A", "STResTesseract16UNet18A"]:
        load_model(name)


def test_4d_quantize():
    c = np.array([[0, 1, 2, 3, 0], [0, 1, 2, 3, 0], [0, 1, 2, 3, 1]], np.int32)
    keep = quantize(c)
    assert len(keep) == 2  # same voxel different frame stays distinct
