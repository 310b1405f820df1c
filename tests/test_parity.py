"""Real-checkpoint logits-parity harness (BASELINE.md parity checks #1/#2).

Runs only when a reference Model Zoo checkpoint is provided:

    LGS_TORCH_CKPT=/path/to/Res16UNet34C.pth \
    [LGS_REF_ACTS=/path/to/ref_acts.npz] pytest tests/test_parity.py

The Model Zoo weights (reference README.md:144-149) cannot ship in this
repo; with zero egress in CI these tests skip. Given the checkpoint they
assert (a) every backbone tensor maps onto the flax tree and (b) per-voxel
logits match recorded reference activations (npz with coords/feats/logits
produced by scripts/dump_reference_acts.py run in a torch+ME environment).
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("LGS_TORCH_CKPT")
REF_ACTS = os.environ.get("LGS_REF_ACTS")

pytestmark = pytest.mark.skipif(
    not CKPT or not os.path.isfile(CKPT or ""),
    reason="set LGS_TORCH_CKPT to a reference Model Zoo .pth to run parity",
)


def _model_for(sd_keys):
    from languagegroundedsemseg_tpu.models import load_model

    # 34D heads are 512-wide finals; 34C finals are num_labels-wide
    name = "Res16UNet34D" if any("final" in k and "512" in k for k in sd_keys) else "Res16UNet34C"
    return load_model(name)


def test_all_backbone_tensors_map():
    import jax
    import jax.numpy as jnp

    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import Res16UNet34C, res16unet_graph_spec
    from languagegroundedsemseg_tpu.train.checkpoints import (
        load_torch_state_dict,
        torch_to_flax_params,
    )

    sd = load_torch_state_dict(CKPT)
    rng = np.random.default_rng(0)
    from tests.oracles import make_cloud

    coords = make_cloud(rng, n=500)
    builder = BatchBuilder(spec=res16unet_graph_spec(), fixed_capacity=1024)
    feats = rng.normal(size=(500, 3)).astype(np.float32)
    batch = builder.build([(coords, feats, None)])
    model = Res16UNet34C(out_channels=200)
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=False)
    params, stats, skipped = torch_to_flax_params(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    backbone_skipped = [
        k for k in skipped
        if not any(t in k for t in ("anchor", "text", "projection", "optimizer"))
    ]
    assert not backbone_skipped, f"unmapped backbone tensors: {backbone_skipped[:10]}"


@pytest.mark.skipif(
    not REF_ACTS or not os.path.isfile(REF_ACTS or ""),
    reason="set LGS_REF_ACTS to an npz of recorded reference activations",
)
def test_per_voxel_logits_parity():
    """npz fields: coords (N,4) batched voxel coords as fed to ME,
    feats (N,C_in), logits (N,num_labels) from the reference forward."""
    import jax
    import jax.numpy as jnp

    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import Res16UNet34C, res16unet_graph_spec
    from languagegroundedsemseg_tpu.sparse.graph_host import pack_keys
    from languagegroundedsemseg_tpu.train.checkpoints import (
        load_torch_state_dict,
        torch_to_flax_params,
    )

    ref = np.load(REF_ACTS)
    coords, feats, ref_logits = ref["coords"], ref["feats"], ref["logits"]
    n = len(coords)
    cap = 1 << int(np.ceil(np.log2(max(n, 1024))))
    builder = BatchBuilder(spec=res16unet_graph_spec(), fixed_capacity=cap)
    batch = builder.build([(coords[:, 1:4].astype(np.int32), feats.astype(np.float32), None)])

    model = Res16UNet34C(out_channels=ref_logits.shape[1])
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph, train=False)
    sd = load_torch_state_dict(CKPT)
    params, stats, _ = torch_to_flax_params(
        sd, variables["params"], variables.get("batch_stats", {})
    )
    logits, _ = model.apply(
        {"params": params, "batch_stats": stats}, batch.feats, batch.graph, train=False
    )
    # builder sorts rows by packed key; realign reference rows the same way
    order = np.argsort(pack_keys(
        np.concatenate([np.zeros((n, 1), np.int32), coords[:, 1:4].astype(np.int32)], 1)
    ), kind="stable")
    got = np.asarray(logits)[:n]
    want = ref_logits[order]
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 1e-3, f"logits relative error {err}"
