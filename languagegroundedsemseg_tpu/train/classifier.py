"""Classifier fine-tuning on precomputed features with per-epoch
class-balanced resampling.

The reference stage (lib/train_test/pl_ClassifierTrainer.py) trains a
plain linear ClassifierNet over frozen-backbone features and calls
``train_dataset.resample_features()`` at every epoch start (:120); the
feature dataset class is missing from the reference repo — this module
completes the stage deliberately (see data/feature_dataset.py).

Flow: extract features once with the frozen backbone (the trainer's eval
step), build ResampledFeatureDataset pools, then run a jit-compiled
linear-classifier loop that redraws the balanced subset every epoch.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from languagegroundedsemseg_tpu.data.feature_dataset import (
    ResampledFeatureDataset,
)
from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss
from languagegroundedsemseg_tpu.models.classifier import ClassifierNet


def train_classifier_on_features(
    dataset: ResampledFeatureDataset,
    num_classes: int,
    epochs: int = 10,
    batch_size: int = 4096,
    lr: float = 0.1,
    momentum: float = 0.9,
    seed: int = 0,
    val: Optional[ResampledFeatureDataset] = None,
    log_fn: Optional[Callable[[Dict], None]] = None,
):
    """Train ClassifierNet on a ResampledFeatureDataset; returns
    (variables, history). One jit-compiled step serves every epoch (batch
    shapes are static by construction)."""
    model = ClassifierNet(out_channels=num_classes)
    x0 = jnp.zeros((batch_size, dataset.feature_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x0)
    tx = optax.sgd(lr, momentum=momentum)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, feats, labels):
        def loss_fn(p):
            logits, _ = model.apply({"params": p}, feats)
            return cross_entropy_loss(logits, labels, ignore_index=255)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, feats):
        logits, _ = model.apply({"params": params}, feats)
        return jnp.argmax(logits, axis=-1)

    params = variables["params"]
    history = []
    for epoch in range(epochs):
        dataset.resample_features()  # the reference's per-epoch hook
        losses = []
        for feats, labels in dataset.batches(batch_size):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(feats), jnp.asarray(labels))
            losses.append(loss)
        rec = {"epoch": epoch,
               "loss": float(np.mean([np.asarray(l) for l in losses]))
               if losses else float("nan")}
        if val is not None and len(val.feats):
            # full-pool accuracy, chunked at the train batch size (pad the
            # tail so the jit cache stays one entry)
            preds = []
            vf = val.feats
            for s in range(0, len(vf), batch_size):
                chunk = vf[s:s + batch_size]
                pad = batch_size - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad, chunk.shape[1]), np.float32)])
                preds.append(np.asarray(
                    predict(params, jnp.asarray(chunk)))[: batch_size - pad
                                                         or None])
            pred = np.concatenate(preds)[: len(vf)]
            rec["val_acc"] = float((pred == val.labels).mean())
        history.append(rec)
        if log_fn:
            log_fn(rec)
    return {"params": params}, history
