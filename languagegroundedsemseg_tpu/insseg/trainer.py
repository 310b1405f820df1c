"""Instance-segmentation trainer.

Mirror of reference downstream/insseg/lib/pl_Trainer.py:245-387: semantic
CE/focal + offset norm/direction losses during training; validation shifts
coords by predicted offsets, clusters, and feeds the ScanNet instance
evaluator (dual checkpoints on val_miou and val_map05 like ddp_main.py:75-78).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import spatial

from languagegroundedsemseg_tpu.config import Config
from languagegroundedsemseg_tpu.data.batching import BatchBuilder
from languagegroundedsemseg_tpu.data.dataset import build_input_transforms
from languagegroundedsemseg_tpu.eval.miou import IoUEvaluator, fast_hist_jax
from languagegroundedsemseg_tpu.insseg.clustering import Clustering
from languagegroundedsemseg_tpu.insseg.evaluation import InstanceEvaluator
from languagegroundedsemseg_tpu.insseg.losses import offset_losses
from languagegroundedsemseg_tpu.insseg.model import InstanceRes16UNet, InstanceRes16UNet14A
from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss, focal_loss
from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec
from languagegroundedsemseg_tpu.train.checkpoints import CheckpointManager
from languagegroundedsemseg_tpu.train.solvers import initialize_optimizer, make_lr_schedule
from languagegroundedsemseg_tpu.train.state import TrainState
from languagegroundedsemseg_tpu.train.step import TrainBatch

INSSEG_MODELS = {
    "InstanceRes16UNet": InstanceRes16UNet,
    "InstanceRes16UNet14A": InstanceRes16UNet14A,
}


class InssegTrainer:
    def __init__(self, config: Config, dataset_cls=None, model_cls=None):
        self.config = config
        os.makedirs(config.log_dir, exist_ok=True)

        from languagegroundedsemseg_tpu.insseg.dataset import SyntheticInstanceDataset

        dataset_cls = dataset_cls or SyntheticInstanceDataset
        prevoxel, input_t = build_input_transforms(config, dataset_cls, config.train_augmentation)
        self.dataset = dataset_cls(
            config, phase=config.train_phase, augment_data=config.train_augmentation,
            prevoxel_transform=prevoxel, input_transform=input_t,
        )
        self.val_dataset = dataset_cls(config, phase=config.val_phase, augment_data=False)
        self.num_labels = self.dataset.num_train_labels
        self.voxel_size = self.dataset.VOXEL_SIZE

        self.builder = BatchBuilder(
            spec=res16unet_graph_spec(config.conv1_kernel_size),
            ignore_index=config.ignore_label,
            limit_numpoints=config.train_limit_numpoints,
            fixed_capacity=config.fixed_capacity or None,
            level_ratios=config.level_capacity_ratios,
        )

        def _insseg_extras(item):
            return {
                "centers": item["centers"].astype(np.float32),
                "instance_valid": (item["instances"] >= 0).astype(np.float32),
                "instance_ids": item["instances"].astype(np.int32),
                "xyz": item["coords"].astype(np.float32),
            }

        self._insseg_extras = _insseg_extras

        # Multi-device data parallelism: grads + BN stats psum over the mesh
        # (the reference trains insseg on 8 GPUs via DDP,
        # config/default.yaml:101-111, scripts/train_scannet_slurm.sh).
        n_dev = config.num_devices or 1
        self.n_dev = max(1, min(n_dev, len(jax.devices())))
        self.mesh = None
        self.axis = None
        if self.n_dev > 1:
            from languagegroundedsemseg_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(self.n_dev)
            self.axis = "data"

        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        model_cls = model_cls or INSSEG_MODELS.get(config.model, InstanceRes16UNet)

        def _mk(axis_name):
            return model_cls(
                out_channels=self.num_labels,
                conv1_kernel_size=config.conv1_kernel_size,
                bn_momentum=config.bn_momentum,
                max_batch=max(config.batch_size, config.val_batch_size) + 1,
                dtype=dtype,
                axis_name=axis_name,
            )

        self.model = _mk(self.axis)
        self.eval_model = self.model if self.axis is None else _mk(None)

        batch = self._make_batch([0])
        from languagegroundedsemseg_tpu.train.trainer import init_on_cpu

        variables = init_on_cpu(
            self.eval_model.init,
            jax.random.PRNGKey(config.seed), batch.feats, batch.graph,
            train=False,
        )
        if jax.default_backend() != "cpu":
            variables = jax.device_put(variables, jax.devices()[0])
        sched = make_lr_schedule(config.scheduler, config.lr, step_gamma=config.step_gamma,
                                 multi_step_milestones=config.multi_step_milestones,
                                 max_steps=config.max_iter)
        self.tx = initialize_optimizer(config, sched)
        self.state = TrainState.create(variables, self.tx)
        if self.mesh is not None:
            from languagegroundedsemseg_tpu.parallel.dp import shard_train_step

            self.p_train_step = shard_train_step(self._train_step, self.mesh)
        else:
            self.p_train_step = jax.jit(self._train_step)
        self.p_eval = jax.jit(self._eval_fn)
        self._log_f = open(os.path.join(config.log_dir, "metrics.jsonl"), "a")

        self.clusterer = Clustering(
            ignored_labels=[],  # train-id space; benchmark mapping applied after
            class_mapping=np.asarray(self.dataset.VALID_CLASS_IDS),
            thresh=0.03, min_points=50, propose_points=100,
        )
        self.ckpt = CheckpointManager(config.log_dir, {"val_miou": "max", "val_map05": "max"})

    # ------------------------------------------------------------------

    def _make_batch(self, indices, seed=0) -> TrainBatch:
        scenes, extras = [], []
        for j, i in enumerate(indices):
            rng = np.random.default_rng((seed, j))
            item = self.dataset.get_item(int(i), rng)
            feats = item["feats"].copy()
            if self.config.normalize_color:
                feats[:, :3] = feats[:, :3] / 255.0 - 0.5
            scenes.append((item["coords"], feats, item["labels"]))
            extras.append(
                {
                    "centers": item["centers"].astype(np.float32),
                    "instance_valid": (item["instances"] >= 0).astype(np.float32),
                    "instance_ids": item["instances"].astype(np.int32),
                    "xyz": item["coords"].astype(np.float32),
                }
            )
        return self.builder.build(scenes, extras)

    def _losses(self, variables, batch: TrainBatch, train: bool):
        batch = batch.decompact()
        apply = lambda v: self.model.apply(
            v, batch.feats, batch.graph, train=train,
            mutable=["batch_stats"] if train else [],
        )
        if train:
            (offsets, logits, feats), mut = apply(variables)
        else:
            offsets, logits, feats = apply(variables)
            mut = None
        row_mask = batch.graph.levels[0].mask()
        if self.config.loss_type == "focal":
            sem = focal_loss(logits, batch.labels, gamma=self.config.focal_gamma,
                             ignore_index=self.config.ignore_label, row_mask=row_mask)
        else:
            sem = cross_entropy_loss(logits, batch.labels,
                                     ignore_index=self.config.ignore_label, row_mask=row_mask)
        norm_l, dir_l = offset_losses(
            offsets, batch.extras["xyz"], batch.extras["centers"],
            batch.extras["instance_valid"], self.voxel_size, row_mask,
        )
        total = sem + norm_l + dir_l
        return total, dict(semantic_loss=sem, offset_norm_loss=norm_l,
                           offset_dir_loss=dir_l), (offsets, logits), mut

    def _train_step(self, state: TrainState, batch: TrainBatch, key=None):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            total, parts, _, mut = self._losses(variables, batch, train=True)
            return total, (parts, mut["batch_stats"])

        (loss, (parts, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if self.axis is not None:
            grads = jax.lax.pmean(grads, self.axis)
            loss = jax.lax.pmean(loss, self.axis)
            parts = jax.lax.pmean(parts, self.axis)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt, step=state.step + 1
        )
        parts["loss"] = loss
        return new_state, parts

    def _eval_fn(self, state: TrainState, batch: TrainBatch):
        batch = batch.decompact()
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        offsets, logits, _ = self.eval_model.apply(
            variables, batch.feats, batch.graph, train=False
        )
        row_mask = batch.graph.levels[0].mask()
        pred = jnp.argmax(logits, axis=-1)
        hist = fast_hist_jax(pred, batch.labels, self.num_labels, row_mask)
        probs = jax.nn.softmax(logits, axis=-1)
        return offsets, probs, hist

    # ------------------------------------------------------------------

    def _log(self, rec: Dict):
        self._log_f.write(json.dumps({k: (float(v) if hasattr(v, "item") else v)
                                      for k, v in rec.items()}) + "\n")
        self._log_f.flush()

    def fit(
        self,
        max_steps: int = 100,
        log_every: int = 10,
        val_every: int = 0,
        max_val_scenes: Optional[int] = None,
    ):
        """Train loop with periodic validation + dual-monitor checkpointing
        (reference ddp_main.py:75-78 checkpoints on val_miou AND val_map05)
        and max-step resume (ddp_main.py:83-105)."""
        cfg = self.config
        if cfg.resume:
            from languagegroundedsemseg_tpu.train.checkpoints import (
                find_resume_checkpoint,
                restore_checkpoint,
            )

            path = cfg.resume if os.path.isfile(cfg.resume) else find_resume_checkpoint(cfg.resume)
            if path:
                self.state = restore_checkpoint(path, self.state)
                print(f"resumed from {path} at step {int(self.state.step)}")

        # Parallel prefetching loader with epoch semantics (fresh shuffled
        # order per epoch, wrap-around padding, device_put overlap, overflow
        # counters) — the host graph build (~240 ms/scene) runs in worker
        # threads while the device steps (reference trains through torch
        # DataLoader workers, downstream/insseg/lib/ddp_trainer.py).
        from languagegroundedsemseg_tpu.data.loader import DataLoader

        loader = DataLoader(
            self.dataset, self.builder,
            batch_size=min(cfg.batch_size, len(self.dataset)),
            shuffle=True, repeat=True, seed=cfg.seed,
            num_workers=cfg.num_workers, num_devices=self.n_dev,
            ignore_index=cfg.ignore_label, extras_fn=self._insseg_extras,
        )
        self.train_loader = loader
        batch_iter = iter(loader)
        key = jax.random.PRNGKey(cfg.seed)
        start = int(self.state.step)
        for step in range(start, max_steps):
            batch = next(batch_iter)
            self.state, parts = self.p_train_step(self.state, batch, key)
            if (step + 1) % log_every == 0:
                rec = {k: float(v) for k, v in parts.items()} | {"step": step + 1}
                print(json.dumps(rec))
                self._log(rec | {"phase": "train"})
            if val_every and (step + 1) % val_every == 0:
                metrics = self.validate(max_scenes=max_val_scenes)
                self._log(metrics | {"phase": "val", "step": step + 1})
                self.ckpt.save(self.state, metrics, step + 1)
        if not val_every:
            self.ckpt.save(self.state, {}, int(self.state.step))
        return self.state

    def validate(self, max_scenes: Optional[int] = None) -> Dict[str, float]:
        ev_sem = IoUEvaluator(self.num_labels)
        ev_inst = InstanceEvaluator(
            [int(i) for i in self.dataset.VALID_CLASS_IDS], self.dataset.CLASS_LABELS
        )
        ds = self.val_dataset
        n = len(ds) if max_scenes is None else min(len(ds), max_scenes)
        for i in range(n):
            rng = np.random.default_rng((999, i))
            item = ds.get_item(i, rng)
            feats = item["feats"].copy()
            if self.config.normalize_color:
                feats[:, :3] = feats[:, :3] / 255.0 - 0.5
            batch = self.builder.build(
                [(item["coords"], feats, item["labels"])],
                [{
                    "centers": item["centers"].astype(np.float32),
                    "instance_valid": (item["instances"] >= 0).astype(np.float32),
                    "instance_ids": item["instances"].astype(np.int32),
                    "xyz": item["coords"].astype(np.float32),
                }],
            )
            offsets, probs, hist = self.p_eval(self.state, batch)
            ev_sem.update_hist(np.asarray(hist))

            m_valid = np.asarray(batch.graph.levels[0].bool_mask())
            offsets = np.asarray(offsets)[m_valid]
            probs = np.asarray(probs)[m_valid]
            coords = np.asarray(batch.graph.levels[0].coords)[m_valid, 1:]
            # vote shift (reference pl_Trainer.py:356)
            vertices = coords * self.voxel_size + offsets
            instances = self.clusterer.get_instances(vertices, probs)
            scene = item["scene_name"]
            original = item.get("original")
            if original is not None:
                # full-resolution instance eval: back-project voxel masks to
                # the original points via nearest-voxel query (the reference
                # uses a pykeops KNN, datasets/scannet.py:149-170; a host
                # KD-tree is our analog). GT comes from the raw cloud.
                m_v, m_r = item["transform"]
                rigid = m_v  # val path voxelizes without augmentation
                homo = np.hstack([
                    original["xyz"], np.ones((len(original["xyz"]), 1), np.float32)
                ])
                xyz_vox = homo @ rigid.T[:, :3]
                tree = spatial.cKDTree(coords.astype(np.float32) + 0.5)
                _, nearest = tree.query(xyz_vox)
                full_instances = {
                    k: {
                        "label_id": v["label_id"],
                        "conf": v["conf"],
                        "pred_mask": np.asarray(v["pred_mask"])[nearest],
                    }
                    for k, v in instances.items()
                }
                ev_inst.add_gt(scene, original["semantic"], original["instance"])
                ev_inst.add_prediction(scene, full_instances)
                if self.config.save_prediction:
                    # ScanNet benchmark submission files (reference
                    # evaluate_semantic_instance.py:363-374 writes them
                    # during eval when exporting is on)
                    ev_inst.export_benchmark(
                        self.config.save_pred_dir, scene, full_instances
                    )
            else:
                # voxel-space fallback (no original cloud available)
                inv = np.asarray(
                    [ds.inverse_label_map.get(t, -1) for t in range(self.num_labels)]
                )
                sem_raw = np.where(
                    np.asarray(batch.labels)[m_valid] == self.config.ignore_label,
                    -1,
                    inv[np.clip(np.asarray(batch.labels)[m_valid], 0, self.num_labels - 1)],
                )
                inst_ids = np.asarray(batch.extras["instance_ids"])[m_valid]
                ev_inst.add_gt(scene, sem_raw, inst_ids)
                ev_inst.add_prediction(scene, instances)
                if self.config.save_prediction:
                    ev_inst.export_benchmark(
                        self.config.save_pred_dir, scene, instances
                    )

        sem = ev_sem.compute()
        inst = ev_inst.evaluate()
        return {
            "val_miou": sem["miou"],
            "val_map": inst["all_ap"],
            "val_map05": inst["ap_50"],
            "val_map25": inst["ap_25"],
        }
