"""Checkpoint-parity harness (BASELINE.md parity checks #1/#2).

Two tiers:

1. **Committed-fixture tier (always runs).** The released Model Zoo
   weights (reference README.md:144-149) cannot ship here (zero egress),
   so the committed stand-in is `tests/fixtures/parity_scene_34c.npz`:
   one scene of recorded activations from the float64 dense-torch oracle
   (tests/test_parity_dense_torch.py — an independent implementation of
   the MinkowskiEngine semantics), plus a deterministic reference-format
   state_dict regenerated from the recorded seed. These pin (a) the
   torch->flax->torch round trip byte-stable (converter + ME kernel-slot
   permutation inverse) and (b) per-voxel logits through the full import
   path against the committed recording. Regenerate with
   `python scripts/make_parity_fixture.py`.

2. **Real-checkpoint tier (env-gated).** With a Model Zoo .pth:

       LGS_TORCH_CKPT=/path/to/Res16UNet34C.pth \
       [LGS_REF_ACTS=/path/to/ref_acts.npz] pytest tests/test_parity.py

   asserts full backbone tensor coverage and logits parity vs activations
   recorded by scripts/dump_reference_acts.py in a torch+ME environment.
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("LGS_TORCH_CKPT")
REF_ACTS = os.environ.get("LGS_REF_ACTS")
FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "parity_scene_34c.npz")

needs_ckpt = pytest.mark.skipif(
    not CKPT or not os.path.isfile(CKPT or ""),
    reason="set LGS_TORCH_CKPT to a reference Model Zoo .pth to run",
)


# ---- tier 1: committed fixture ----------------------------------------------


def _fixture_state_dict():
    from tests.test_parity_dense_torch import make_state_dict

    fx = np.load(FIXTURE)
    rng = np.random.default_rng(int(fx["seed"]))
    # the generator draws coords + feats from the same stream before sd
    from tests.test_parity_dense_torch import C_IN, G

    coords = np.unique(
        rng.integers(0, G, size=(int(fx["n_points"]), 3)).astype(np.int32),
        axis=0)
    feats = rng.normal(size=(len(coords), C_IN)).astype(np.float32)
    np.testing.assert_array_equal(coords, fx["coords"])
    np.testing.assert_array_equal(feats, fx["feats"])
    return make_state_dict(rng), fx


def test_fixture_round_trip_and_logits_parity(tmp_path):
    """One full-width 34C setup serving both tier-1 assertions:

    (a) torch.save -> load_torch_state_dict -> torch_to_flax_params ->
        flax_to_torch_state_dict reproduces every tensor bit-exactly;
    (b) the converted model's per-voxel logits match the committed
        dense-torch oracle recording."""
    import jax
    import torch

    from languagegroundedsemseg_tpu.data.batching import BatchBuilder
    from languagegroundedsemseg_tpu.models.res16unet import (
        Res16UNet34C,
        res16unet_graph_spec,
    )
    from languagegroundedsemseg_tpu.train.checkpoints import (
        flax_to_torch_state_dict,
        load_torch_state_dict,
        torch_to_flax_params,
    )
    from tests.test_parity_dense_torch import C_OUT

    sd0, fx = _fixture_state_dict()
    coords, feats, want = fx["coords"], fx["feats"], fx["logits"]
    path = tmp_path / "fixture_34c.pth"
    torch.save({k: torch.as_tensor(v) for k, v in sd0.items()}, path)
    sd = load_torch_state_dict(str(path))

    builder = BatchBuilder(spec=res16unet_graph_spec(), fixed_capacity=1024)
    batch, layout = builder.build(
        [(coords, feats, np.zeros(len(coords), np.int32))],
        return_layout=True)
    model = Res16UNet34C(out_channels=C_OUT)
    variables = model.init(jax.random.PRNGKey(0), batch.feats, batch.graph,
                           train=False)
    params, stats, skipped = torch_to_flax_params(
        sd, variables["params"], variables.get("batch_stats", {}))
    assert not skipped, skipped[:8]

    # (a) byte-stable round trip
    sd2, missing = flax_to_torch_state_dict(params, stats, sd)
    assert not missing, missing[:8]
    assert set(sd2) == set(sd0)
    for k in sd0:
        np.testing.assert_array_equal(sd2[k], sd0[k], err_msg=k)

    # (b) per-voxel logits vs the committed recording
    logits, _ = model.apply({"params": params, "batch_stats": stats},
                            batch.feats, batch.graph, train=False)
    got = np.asarray(logits)[layout["pos0"]]
    want_kept = want[layout["order"]]
    err = np.abs(got - want_kept).max() / (np.abs(want_kept).max() + 1e-9)
    assert err < 1e-3, f"logits relative error {err}"


# ---- tier 2: real Model Zoo checkpoint (env-gated) ---------------------------


@pytest.mark.slow
@needs_ckpt
def test_all_backbone_tensors_map():
    import jax

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


@pytest.mark.slow
@needs_ckpt
@pytest.mark.skipif(
    not REF_ACTS or not os.path.isfile(REF_ACTS or ""),
    reason="set LGS_REF_ACTS to an npz of recorded reference activations",
)
def test_per_voxel_logits_parity():
    """npz fields: coords (N,4) batched voxel coords as fed to ME,
    feats (N,C_in), logits (N,num_labels) from the reference forward."""
    import jax

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
