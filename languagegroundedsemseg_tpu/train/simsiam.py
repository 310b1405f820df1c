"""SimSiam-style paired-view pretraining.

The paired pipeline of the reference (paired_cfl collate
lib/transforms.py:453, Res16UNet34DPaired, SupervisedSimSiam loss): each
scene is voxelized twice with independent augmentations
(Voxelizer.voxelize_pair), per-category nearest-neighbor correspondences
link the views, and the shared-backbone model is trained with paired cosine
+ CLIP-anchor losses.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from languagegroundedsemseg_tpu.data.batching import BatchBuilder
from languagegroundedsemseg_tpu.losses.simsiam import supervised_simsiam_loss
from languagegroundedsemseg_tpu.train.state import TrainState
from languagegroundedsemseg_tpu.train.step import TrainBatch


def build_paired_batch(
    builder: BatchBuilder,
    dataset,
    indices: List[int],
    rng: np.random.Generator,
    normalize_color: bool = True,
    dropout_ratio: float = 0.35,
) -> Tuple[TrainBatch, TrainBatch, np.ndarray, np.ndarray]:
    """-> (batch1, batch2, corrs1, corrs2); corrs index padded rows of the
    other batch (-1 = no partner)."""
    views1, views2, corr_parts = [], [], []
    for idx in indices:
        xyz, rgb, labels, _inst, _name = (
            dataset.load_cloud(idx)
            if hasattr(dataset, "load_cloud")
            else dataset.load_instance_cloud(idx)
        )
        (c0, f0, l0, _, corr0), (c1, f1, l1, _, corr1) = dataset.voxelizer.voxelize_pair(
            rng, xyz.astype(np.float64), rgb, labels, dropout_ratio=dropout_ratio
        )
        l0 = dataset.map_labels(l0)
        l1 = dataset.map_labels(l1)
        if normalize_color:
            f0 = f0.copy(); f0[:, :3] = f0[:, :3] / 255.0 - 0.5
            f1 = f1.copy(); f1[:, :3] = f1[:, :3] / 255.0 - 0.5
        views1.append((c0, f0, l0))
        views2.append((c1, f1, l1))
        corr_parts.append((corr0, corr1))

    b1, lay1 = builder.build(views1, return_layout=True)
    b2, lay2 = builder.build(views2, return_layout=True)

    def remap(corrs_scene, lay_self, lay_other, cap_self, n_other):
        """Scene-local corr -> concatenated row of other view -> padded
        device row (both views' layouts may have sentinel rows interleaved,
        so kept row i of a view sits at its layout's pos0[i])."""
        inv_other = np.full(n_other, -1, dtype=np.int64)
        inv_other[lay_other["order"]] = lay_other["pos0"]
        cat = np.concatenate(
            [np.where(c >= 0, c + off, -1) for c, off in corrs_scene]
        )
        ordered = cat[lay_self["order"]]
        mapped = np.where(
            (ordered >= 0) & (ordered < n_other),
            inv_other[np.clip(ordered, 0, n_other - 1)],
            -1,
        )
        out = np.full(cap_self, -1, dtype=np.int32)
        out[lay_self["pos0"]] = mapped
        return out

    n1 = sum(len(v[0]) for v in views1)
    n2 = sum(len(v[0]) for v in views2)
    corrs1 = remap(
        [(cp[0], lay2["scene_offsets"][i]) for i, cp in enumerate(corr_parts)],
        lay1, lay2, b1.feats.shape[0], n2,
    )
    corrs2 = remap(
        [(cp[1], lay1["scene_offsets"][i]) for i, cp in enumerate(corr_parts)],
        lay2, lay1, b2.feats.shape[0], n1,
    )
    return b1, b2, corrs1, corrs2


def make_simsiam_train_step(model, tx, config, anchors, split_matrix=None):
    anchors_j = jnp.asarray(anchors)

    def step(state: TrainState, b1: TrainBatch, b2: TrainBatch, corrs1, corrs2, key):
        b1, b2 = b1.decompact(), b2.decompact()

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (z1, z2), mut = model.apply(
                variables, b1.feats, b1.graph, train=True,
                feats2=b2.feats, graph2=b2.graph, mutable=["batch_stats"],
            )
            loss, metrics = supervised_simsiam_loss(
                key, config, z1, z2, z1, z2, corrs1, corrs2,
                b1.labels, b2.labels, anchors_j, split_matrix,
                b1.graph.levels[0].mask(), b2.graph.levels[0].mask(),
            )
            return loss, (metrics, mut["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return (
            state.replace(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt, step=state.step + 1),
            metrics,
        )

    return step
