"""Jit-signature stabilization (data/batching.py BatchBuilder.stabilize).

Without it, flex capacities / window-menu picks / pow-2 overflow buckets
track each batch's density, so a stream of similar-but-not-identical scenes
produces many distinct jit signatures — each one a full XLA recompile
(minutes under a remote compile service). With it, the builder's running
contract makes signatures converge after a warmup prefix, and the padding
applied is a semantic no-op (guard rows, as cross-shard harmonization).
"""

import jax
import numpy as np

from __graft_entry__ import _voxelize_scene
from languagegroundedsemseg_tpu.data.batching import BatchBuilder
from languagegroundedsemseg_tpu.models.res16unet import (
    Res16UNet14A,
    res16unet_graph_spec,
)


def _signature(batch):
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    return (
        str(treedef),
        tuple((np.shape(l), np.asarray(l).dtype.str) for l in leaves),
    )


def _scene_cycle(i, rng):
    # alternating densities force flex-bucket / window / overflow variance
    pts = (1500, 6000, 3200)[i % 3]
    return [_voxelize_scene(rng, pts, raw_color=True) for _ in range(2)]


def test_signatures_converge_across_density_cycle():
    rng = np.random.default_rng(0)
    builder = BatchBuilder(spec=res16unet_graph_spec(), stabilize=True,
                           ship_coords=False, compact_feats=True)
    sigs = []
    for i in range(9):
        sigs.append(_signature(builder.build(_scene_cycle(i, rng))))
    # after one full density cycle the contract has seen every regime:
    # builds 3..8 must share ONE signature
    tail = set(sigs[3:])
    assert len(tail) == 1, (
        f"signatures did not converge: {len(set(sigs))} distinct over 9 "
        f"builds, {len(tail)} distinct over the last 6"
    )
    # and an unstabilized builder over the same stream must show >1
    # signature (otherwise this test exercises nothing)
    rng = np.random.default_rng(0)
    plain = BatchBuilder(spec=res16unet_graph_spec(), stabilize=False,
                         ship_coords=False, compact_feats=True)
    plain_sigs = {(_signature(plain.build(_scene_cycle(i, rng))))
                  for i in range(3)}
    assert len(plain_sigs) > 1


def test_stabilized_batch_preserves_forward_semantics():
    rng = np.random.default_rng(1)
    scenes = [_voxelize_scene(rng, 2500, raw_color=True) for _ in range(2)]

    stab = BatchBuilder(spec=res16unet_graph_spec(), stabilize=True,
                        ship_coords=False, compact_feats=True)
    # seed the contract with a DENSER stream so the stabilized build of
    # `scenes` is actually padded/floored (otherwise this is a no-op test)
    big = [_voxelize_scene(np.random.default_rng(2), 8000, raw_color=True)
           for _ in range(2)]
    stab.build(big)
    b_stab = stab.build(scenes)

    plain = BatchBuilder(spec=res16unet_graph_spec(), ship_coords=False,
                         compact_feats=True)
    b_ref = plain.build(scenes)
    cap_ref = b_ref.graph.levels[0].valid.shape[0]
    cap_stab = b_stab.graph.levels[0].valid.shape[0]
    assert cap_stab >= cap_ref  # the floor engaged (or equal bucket)

    model = Res16UNet14A(out_channels=13)
    vref = model.init(jax.random.PRNGKey(0), b_ref.feats.astype(np.float32),
                      b_ref.graph, train=False)
    fwd = jax.jit(lambda v, f, g: model.apply(v, f, g, train=False)[0])
    out_ref = np.asarray(fwd(vref, b_ref.feats.astype(np.float32),
                             b_ref.graph))
    out_stab = np.asarray(fwd(vref, b_stab.feats.astype(np.float32),
                              b_stab.graph))
    # padded/floored build must produce identical logits on the real rows
    # (rows are key-sorted, so valid prefixes align row-for-row per level)
    vr = np.asarray(b_ref.graph.levels[0].valid).astype(bool)
    vs = np.asarray(b_stab.graph.levels[0].valid).astype(bool)
    assert vr.sum() == vs.sum()
    np.testing.assert_allclose(
        out_stab[vs], out_ref[vr], rtol=1e-5, atol=1e-5)
