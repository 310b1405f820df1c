"""Jitted train/eval step functions.

The hot loop of reference lib/train_test/pl_BaselineTrainer.py:157-358,
re-expressed as pure functions: forward + loss + grad + optimizer update in
one compiled program. Data parallelism is explicit shard_map over a device
mesh (see parallel/dp.py); gradients and BN statistics cross the mesh via
psum — the XLA-collective replacement for DDP's NCCL all-reduce
(reference main.py:192-195).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from languagegroundedsemseg_tpu.sparse.types import ConvGraph
from languagegroundedsemseg_tpu.train.state import TrainState

# objective(logits, features, batch, key, row_mask) -> (loss, metrics)
Objective = Callable[..., Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]


@struct.dataclass
class TrainBatch:
    """One device's worth of data. ``labels`` are contiguous train ids with
    ignore_index marking unlabeled/padded rows; ``extras`` carries
    trainer-specific arrays (e.g. CLIP anchors, instance offsets)."""

    feats: jnp.ndarray
    labels: jnp.ndarray
    graph: ConvGraph
    extras: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)

    def decompact(self) -> "TrainBatch":
        """Undo the wire compaction (data/batching.py compact_feats /
        compact_labels): f16 feats -> f32, uint8 feats -> normalized f32
        colors (the reference normalizes on-device too,
        pl_BaselineTrainer.py:299), uint8 labels -> int32. Free inside jit
        (XLA fuses the casts into the first consumers); every step
        function calls it at entry so downstream code sees the canonical
        dtypes."""
        b = self
        if b.feats.dtype == jnp.uint8:
            b = b.replace(feats=b.feats.astype(jnp.float32) / 255.0 - 0.5)
        elif b.feats.dtype == jnp.float16:
            b = b.replace(feats=b.feats.astype(jnp.float32))
        if b.labels.dtype != jnp.int32:
            b = b.replace(labels=b.labels.astype(jnp.int32))
        return b


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    objective: Objective,
    axis_name: Optional[str] = None,
    representation_only: bool = False,
) -> Callable:
    """Build step(state, batch, key) -> (state, metrics)."""

    def step(state: TrainState, batch: TrainBatch, key: jax.Array):
        batch = batch.decompact()
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        key = jax.random.fold_in(key, state.step)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (out_a, out_b), mut = model.apply(
                variables,
                batch.feats,
                batch.graph,
                train=True,
                representation_only=representation_only,
                mutable=["batch_stats"],
                # 'crf' drives the CRF wrapper's stochastic p=0.5 coin
                # (models/crf.py); unused collections are ignored by flax.
                rngs={"crf": jax.random.fold_in(key, 1)},
            )
            row_mask = batch.graph.levels[0].mask()
            loss, metrics = objective(out_a, out_b, batch, key, row_mask)
            return loss, (mut["batch_stats"], metrics)

        (loss, (new_stats, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def make_eval_step(
    model,
    axis_name: Optional[str] = None,
    representation_only: bool = False,
) -> Callable:
    """Build eval(state, batch) -> (logits_or_features, features)."""

    def step(state: TrainState, batch: TrainBatch):
        batch = batch.decompact()
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(
            variables,
            batch.feats,
            batch.graph,
            train=False,
            representation_only=representation_only,
        )

    return step
