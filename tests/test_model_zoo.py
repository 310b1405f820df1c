"""Model zoo coverage: every registered family constructs and runs forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from languagegroundedsemseg_tpu.models import available_models, load_model
from languagegroundedsemseg_tpu.sparse import build_graph
from languagegroundedsemseg_tpu.sparse.graph_host import default_capacities, pack_keys
from oracles import make_cloud


def _graph_and_feats(model_cls, cap0=384, cin=3, seed=0):
    rng = np.random.default_rng(seed)
    coords = make_cloud(rng, n=250)
    coords = coords[np.argsort(pack_keys(coords), kind="stable")]
    spec = model_cls.graph_spec(3)
    caps = default_capacities(cap0, spec.num_levels, ratios=[1.0] * spec.num_levels)
    g = build_graph(coords, spec, caps)
    feats = np.zeros((cap0, cin), np.float32)
    feats[: len(coords)] = rng.normal(size=(len(coords), cin))
    return g, jnp.asarray(feats), len(coords)


@pytest.mark.parametrize(
    "name",
    [
        "ResNet14",
        "Res16UNet14D",  # 512-wide CLIP final head, shallow (fast tier)
        pytest.param("Res16UNet34D", marks=pytest.mark.slow),
        pytest.param("ResNet50", marks=pytest.mark.slow),
        pytest.param("ResUNet14", marks=pytest.mark.slow),
        pytest.param("MinkUNetHyper14INBN", marks=pytest.mark.slow),
        pytest.param("Res16UNet34Dv2", marks=pytest.mark.slow),
    ],
)
def test_zoo_forward(name):
    cls = load_model(name)
    g, feats, n = _graph_and_feats(cls)
    model = cls(out_channels=9)
    variables = model.init(jax.random.PRNGKey(0), feats, g, train=False)
    logits, features = model.apply(variables, feats, g, train=False)
    expected_rows = g.levels[-1].capacity if name.startswith("ResNet") else feats.shape[0]
    assert logits.shape == (expected_rows, 9)
    valid = int(g.levels[-1].num) if name.startswith("ResNet") else n
    assert np.isfinite(np.asarray(logits)[:valid]).all()


def test_registry_covers_reference_families():
    names = set(available_models())
    for want in [
        "ResNet14", "ResNet18", "ResNet34", "ResNet50", "ResNet101",
        "ResUNet14", "ResUNet18", "ResUNet34", "ResUNet50", "ResUNet101",
        "ResUNet14D", "ResUNet18D", "ResUNet18INBN", "MinkUNetHyper",
        "Res16UNet14", "Res16UNet18", "Res16UNet34", "Res16UNet50", "Res16UNet101",
        "Res16UNet14A", "Res16UNet14B", "Res16UNet14C", "Res16UNet14D",
        "Res16UNet18A", "Res16UNet18B", "Res16UNet18D",
        "Res16UNet34A", "Res16UNet34B", "Res16UNet34C", "Res16UNet34C200",
        "Res16UNet34CR", "Res16UNet34CR_Proj", "Res16UNet34D",
        "Res16UNet34DPaired", "Res16UNet34Dv2", "Res16UNet34Dv3",
        "Res16UNet34GloVe", "ClassifierNet",
    ]:
        assert want in names, f"{want} missing"


@pytest.mark.slow
def test_paired_model_shares_backbone():
    from languagegroundedsemseg_tpu.models.clip_models import Res16UNet34DPaired

    cls = load_model("Res16UNet34DPaired")
    g, feats, n = _graph_and_feats(cls, cap0=256)
    model = Res16UNet34DPaired(out_channels=5, LAYERS=(1,) * 8)
    variables = model.init(jax.random.PRNGKey(0), feats, g, train=False)
    z1, z2 = model.apply(variables, feats, g, train=False, feats2=feats, graph2=g)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5)
    assert z1.shape == (256, 512)
