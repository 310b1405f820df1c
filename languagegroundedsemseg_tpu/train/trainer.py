"""Training orchestration: the replacement for main.py + the PL trainer
modules (reference main.py:55-201, lib/train_test/pl_*Trainer.py).

Mode selection mirrors main.py:160-175:
- ``use_embedding_loss`` set and != 'both'  -> representation pretraining
- 'Classifier' in model name               -> classifier fine-tuning
- otherwise                                -> baseline supervised training

One Trainer drives: data loaders (prefetching, fixed-capacity), jitted
train/eval steps (optionally shard_map'ed over the device mesh), metric
accumulation (device-side confusion psum), LR scheduling incl
ReduceLROnPlateau, best-checkpoint tracking, and resume.
"""

from __future__ import annotations

import json
import os
import time
from contextlib import nullcontext as _nullcontext
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from languagegroundedsemseg_tpu.config import Config
from languagegroundedsemseg_tpu.data.batching import BatchBuilder
from languagegroundedsemseg_tpu.data.loader import initialize_data_loader, load_dataset
from languagegroundedsemseg_tpu.eval.miou import IoUEvaluator, fast_hist_jax
from languagegroundedsemseg_tpu.losses.contrastive import feature_sim
from languagegroundedsemseg_tpu.models import load_model
from languagegroundedsemseg_tpu.parallel.dp import (
    shard_eval_step,
    shard_train_step,
    stack_batches,
)
from languagegroundedsemseg_tpu.parallel.mesh import make_mesh
from languagegroundedsemseg_tpu.train.checkpoints import (
    CheckpointManager,
    find_resume_checkpoint,
    restore_checkpoint,
)
from languagegroundedsemseg_tpu.train.objectives import (
    make_baseline_objective,
    make_representation_objective,
)
from languagegroundedsemseg_tpu.train.solvers import initialize_optimizer, make_lr_schedule
from languagegroundedsemseg_tpu.train.state import TrainState
from languagegroundedsemseg_tpu.train.step import make_train_step


def init_on_cpu(init_fn, *args, **kwargs):
    """Run a flax init on the host CPU backend and return the pytree.
    Eager init on a remote/tunneled accelerator pays an op-by-op
    remote-compile storm (minutes for the 34C tree); callers device_put
    the finished pytree once instead."""
    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        cpu0 = None
    ctx = jax.default_device(cpu0) if cpu0 is not None else _nullcontext()
    with ctx:
        out = init_fn(*args, **kwargs)
    return out


def select_mode(config: Config) -> str:
    if "Instance" in config.dataset:
        return "insseg"
    if config.use_embedding_loss and config.use_embedding_loss != "both":
        return "representation"
    if "Classifier" in config.model:
        return "classifier"
    return "baseline"


class Trainer:
    def __init__(self, config: Config, mode: Optional[str] = None):
        self.config = config
        self.mode = mode or select_mode(config)
        self.log_dir = config.log_dir
        os.makedirs(self.log_dir, exist_ok=True)

        n_dev = config.num_devices or len(jax.devices())
        self.n_dev = max(1, min(n_dev, len(jax.devices())))
        self.mesh = make_mesh(self.n_dev) if self.n_dev > 1 else None
        axis = "data" if self.mesh is not None else None

        # Data. Training batches ship compact (no device-side spatial
        # coords) unless a consumer needs them: the CRF wrapper reads
        # lvl0.coords on device (models/crf.py) and the visualization /
        # prediction dumps read them back (_dump_batch_predictions).
        needs_coords = bool(
            config.wrapper_type and config.wrapper_type.lower() not in ("", "none")
        )
        self.DatasetClass = load_dataset(config.dataset)
        self.train_loader = initialize_data_loader(
            self.DatasetClass, config, config.train_phase,
            num_workers=config.num_workers, shuffle=True, repeat=False,
            augment_data=config.train_augmentation, batch_size=config.batch_size,
            limit_numpoints=config.train_limit_numpoints, num_devices=self.n_dev,
            ship_coords=needs_coords,
        )
        self.val_loader = initialize_data_loader(
            self.DatasetClass, config, config.val_phase,
            num_workers=config.num_val_workers, shuffle=False, repeat=False,
            augment_data=False, batch_size=config.val_batch_size,
            limit_numpoints=config.train_limit_numpoints, num_devices=self.n_dev,
            # every config that can trigger _dump_batch_predictions (see
            # test(): save_prediction | visualize | test_original_pointcloud)
            # needs device-side coords on the val batches
            ship_coords=needs_coords or bool(config.visualize)
            or bool(config.save_prediction)
            or bool(config.test_original_pointcloud),
        )
        self.dataset = self.train_loader.dataset
        self.num_labels = self.dataset.num_train_labels

        # Model
        import dataclasses as _dc

        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
        model_cls = load_model(config.model)
        field_names = {f.name for f in _dc.fields(model_cls)}

        def _mk(axis_name):
            kw = dict(
                out_channels=self.num_labels,
                conv1_kernel_size=config.conv1_kernel_size,
                bn_momentum=config.bn_momentum,
                axis_name=axis_name,
                max_batch=max(config.batch_size, config.val_batch_size) + 1,
                dtype=dtype,
                remat=config.remat,
            )
            return model_cls(**{k: v for k, v in kw.items() if k in field_names})

        self.model = _mk(axis)
        self.eval_model = self.model if axis is None else _mk(None)
        # CRF wrapper (reference main.py load_wrapper wiring +
        # models/wrapper.py:20-30): stochastic p=0.5 filter application in
        # training, always-on at eval; compatibility matrix trains at
        # wrapper_lr (see the masked lr scale below).
        self.wrapped = bool(config.wrapper_type and config.wrapper_type != "None")
        if self.wrapped:
            from languagegroundedsemseg_tpu.models import load_wrapper

            W = load_wrapper(config.wrapper_type)

            def _wrap(base):
                return W(
                    base=base,
                    num_classes=self.num_labels,
                    spatial_sigma=float(config.crf_spatial_sigma),
                    chromatic_sigma=float(config.crf_chromatic_sigma),
                    iterations=config.meanfield_iterations,
                    dtype=dtype,
                )

            self.model = _wrap(self.model)
            self.eval_model = (
                self.model if axis is None else _wrap(self.eval_model)
            )
        self.representation_only = self.mode == "representation"

        # Objective
        anchors = getattr(self.dataset, "loaded_text_features", None)
        anchors_full = None if anchors is None else np.asarray(anchors)
        self.anchors = None if anchors_full is None else anchors_full[:, 0, :]
        split = getattr(self.dataset, "frequency_organized_cats", None)
        weights = getattr(self.dataset, "category_weights", None)
        if self.mode == "representation":
            assert self.anchors is not None, "representation mode needs text anchors"
            proj_w = (
                self._load_projection_weights(anchors_full.shape[-1])
                if config.instance_augmentation == "latent"
                else None
            )
            objective = make_representation_objective(
                config, anchors_full, split, projection_w=proj_w
            )
        else:
            objective = make_baseline_objective(config, weights, split, self.anchors)
        self._objective = objective

        # Optimizer / schedule: the reference steps ALL schedulers once per
        # epoch (PL default interval='epoch', lib/solvers.py via
        # configure_optimizers), so every schedule consumes
        # floor(step / steps_per_epoch).
        steps_per_epoch = max(len(self.train_loader), 1)
        epoch_sched = make_lr_schedule(
            config.scheduler, config.lr,
            step_size=config.step_size, step_gamma=config.step_gamma,
            multi_step_milestones=config.multi_step_milestones,
            poly_power=config.poly_power,
            max_steps=config.max_epoch if config.scheduler == "PolyLR" else config.max_iter,
            exp_gamma=config.exp_gamma, exp_step_size=config.exp_step_size,
        )
        sched = lambda s: epoch_sched(jnp.floor(s / steps_per_epoch))  # noqa: E731
        self.tx = initialize_optimizer(config, sched)
        if self.wrapped and config.lr > 0:
            # Scale the wrapper's (CRF compatibility) updates so their
            # effective lr is wrapper_lr (reference trains the filter with
            # its own lr, config/config.py wrapper_lr).
            import optax as _optax

            ratio = config.wrapper_lr / config.lr

            def _crf_mask(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: any(
                        "MeanFieldCRF" in str(getattr(p, "key", ""))
                        for p in path
                    ),
                    params,
                )

            self.tx = _optax.chain(
                self.tx, _optax.masked(_optax.scale(ratio), _crf_mask)
            )
        if config.classifier_only:
            # Freeze everything but the model-declared classifier head
            # (reference set_classifier_mode, pl_BaselineTrainer.py:411 and
            # --classifier_only, scripts/fine_tune_classifier.sh). Models
            # declare their head via classifier_trainable_prefixes so deeper
            # heads (Dv2/Dv3, clip_models.py) stay fully trainable.
            import optax as _optax

            prefixes = tuple(
                getattr(self.model, "classifier_trainable_prefixes", ("final",))
            )

            def _label(params):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "train"
                    if any(
                        str(getattr(p, "key", "")).startswith(pfx)
                        for p in path
                        for pfx in prefixes
                    )
                    else "freeze",
                    params,
                )

            self.tx = _optax.multi_transform(
                {"train": self.tx, "freeze": _optax.set_to_zero()}, _label
            )

        # Init state. Eager init on a remote/tunneled accelerator pays an
        # op-by-op remote-compile storm (minutes for the 34C tree); run the
        # init on the host CPU backend and ship the finished pytree once.
        init_batch = self._first_batch()
        variables = init_on_cpu(
            self.eval_model.init,
            jax.random.PRNGKey(config.seed), init_batch.feats,
            init_batch.graph, train=False,
        )
        variables = self._maybe_load_weights(variables)
        if jax.default_backend() != "cpu":
            variables = jax.device_put(variables, jax.devices()[0])
        self.state = TrainState.create(variables, self.tx)

        # Steps
        step = make_train_step(
            self.model, self.tx, objective, axis_name=axis,
            representation_only=self.representation_only,
        )
        self.p_train_step = (
            jax.jit(step) if self.mesh is None else shard_train_step(step, self.mesh)
        )
        # Validation runs sharded over the same mesh as training (reference
        # DDP validates on all ranks; see parallel/dp.py:shard_eval_step) —
        # outputs come back stacked on a leading device axis.
        self.p_eval_metrics = (
            jax.jit(self._eval_metrics_fn)
            if self.mesh is None
            else shard_eval_step(self._eval_metrics_fn, self.mesh)
        )

        monitors = {"val_miou": "max"}
        if self.mode == "representation":
            monitors["val_loss"] = "min"
        self.ckpt = CheckpointManager(self.log_dir, monitors)
        self.plateau_best = None
        self.plateau_wait = 0
        self._log_f = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        with open(os.path.join(self.log_dir, "config.json"), "w") as f:
            f.write(config.to_json())

        # Observability: TensorBoard scalars (reference main.py:178) and
        # jax.profiler trace capture behind config.profile (SURVEY §5)
        from languagegroundedsemseg_tpu.utils.observability import (
            ProfilerHook,
            TensorBoardLogger,
        )

        self.tb = TensorBoardLogger(self.log_dir, enabled=config.tensorboard)
        self.profiler = ProfilerHook(
            self.log_dir, enabled=config.profile,
            start_step=config.profile_start_step,
            num_steps=config.profile_num_steps,
        )

    # ------------------------------------------------------------------

    def _first_batch(self):
        cfg = self.config
        from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec

        spec_fn = getattr(self.model, "graph_spec", None)
        builder = BatchBuilder(
            spec=spec_fn(cfg.conv1_kernel_size) if spec_fn else res16unet_graph_spec(cfg.conv1_kernel_size),
            ignore_index=cfg.ignore_label,
            limit_numpoints=cfg.train_limit_numpoints,
            fixed_capacity=cfg.fixed_capacity or None,
            level_ratios=cfg.level_capacity_ratios,
        )
        item = self.dataset.get_item(0, np.random.default_rng(0))
        feats = item["feats"]
        if cfg.normalize_color:
            feats = feats.copy()
            feats[:, :3] = feats[:, :3] / 255.0 - 0.5
        labels = item["labels"]
        if labels is not None and labels.ndim == 2:
            labels = labels[:, 0]
        return builder.build([(item["coords"], feats, labels)])

    def _load_projection_weights(self, feature_dim: int) -> np.ndarray:
        """(A, D, D) attribute-rotation weights for latent augmentation.

        Loads the pretrained AttributeFittingModel from
        config.projection_model_path when present (reference
        ContrastiveLanguageLoss.py:53-57 does the same torch.load); falls
        back to near-identity random maps so the path stays runnable —
        matching the reference, which also proceeds unloaded when the file
        is absent.
        """
        cfg = self.config
        num_attributes = 8  # reference's fixed attribute prompt set
        path = os.path.join(cfg.scannet_path or cfg.data_dir or "", cfg.projection_model_path)
        if os.path.isfile(path):
            from languagegroundedsemseg_tpu.train.checkpoints import load_torch_state_dict

            sd = load_torch_state_dict(path)
            mats = []
            for a in range(num_attributes):
                for k in (f"maps.{a}.weight", f"projections.{a}.weight", f"{a}.weight"):
                    if k in sd and sd[k].shape == (feature_dim, feature_dim):
                        mats.append(np.asarray(sd[k]).T)  # torch Linear: y = x W^T
                        break
            if len(mats) == num_attributes:
                print(f"loaded attribute projection model from {path}")
                return np.stack(mats)
            print(f"projection model at {path} had unexpected keys; using random init")
        rng = np.random.default_rng(cfg.seed)
        eye = np.eye(feature_dim, dtype=np.float32)
        return np.stack([
            eye + 0.02 * rng.normal(size=(feature_dim, feature_dim)).astype(np.float32)
            for _ in range(num_attributes)
        ])

    def _maybe_load_weights(self, variables):
        cfg = self.config
        if cfg.weights and cfg.weights not in ("None", ""):
            from languagegroundedsemseg_tpu.train.checkpoints import (
                load_torch_state_dict,
                torch_to_flax_params,
            )

            if cfg.weights.endswith((".pth", ".tar")) or "torch" in cfg.weights:
                sd = load_torch_state_dict(cfg.weights)
                # --weights_for_inner_model: the checkpoint holds the bare
                # model while self.model is CRF-wrapped; target the 'base'
                # subtree (reference main.py:125-130 semantics).
                inner = self.wrapped and cfg.weights_for_inner_model
                p_tgt = variables["params"]["base"] if inner else variables["params"]
                s_all = variables.get("batch_stats", {})
                s_tgt = s_all.get("base", {}) if inner else s_all
                params, stats, skipped = torch_to_flax_params(sd, p_tgt, s_tgt)
                print(f"loaded torch weights; skipped {len(skipped)} tensors")
                if inner:
                    params = {**variables["params"], "base": params}
                    stats = {**s_all, "base": stats}
                return {"params": params, "batch_stats": stats}
        return variables

    def _eval_metrics_fn(self, state: TrainState, batch):
        batch = batch.decompact()
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out_a, out_b = self.eval_model.apply(
            variables, batch.feats, batch.graph, train=False,
            representation_only=self.representation_only,
        )
        row_mask = batch.graph.levels[0].mask()
        if self.representation_only:
            sims = feature_sim(out_a, jnp.asarray(self.anchors), self.config.representation_distance_type)
            pred = jnp.argmax(sims, axis=-1)
            logits = sims
        else:
            logits = out_a
            pred = jnp.argmax(out_a, axis=-1)
        hist = fast_hist_jax(pred, batch.labels, self.num_labels, row_mask)
        from languagegroundedsemseg_tpu.eval.miou import ap_histograms_jax
        from languagegroundedsemseg_tpu.losses.classification import cross_entropy_loss

        if self.representation_only:
            # val_loss must be the same contrastive objective used in
            # training (the reference RepresentationTrainer monitors it for
            # best-checkpoint selection); a fixed key makes negative
            # sampling deterministic across validation runs.
            loss, _ = self._objective(
                out_a, out_b, batch, jax.random.PRNGKey(0), row_mask
            )
        else:
            loss = cross_entropy_loss(
                logits, batch.labels, ignore_index=self.config.ignore_label, row_mask=row_mask
            )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        tp_hist, fp_hist = ap_histograms_jax(probs, batch.labels, self.num_labels, row_mask=row_mask)
        return hist, loss, pred, tp_hist, fp_hist

    # ------------------------------------------------------------------

    def log(self, record: Dict):
        record = {k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float)) else v)
                  for k, v in record.items()}
        self._log_f.write(json.dumps(record) + "\n")
        self._log_f.flush()
        step = int(record.get("step", 0))
        phase = record.get("phase", "train")
        self.tb.log_scalars(
            step,
            {k: v for k, v in record.items()
             if isinstance(v, float) and k not in ("epoch", "step")},
            prefix=f"{phase}/",
        )

    def _dump_batch_predictions(self, batch, pred, out_dir: str, scene_base: int):
        """Per-scene prediction dumps (reference eval_step -> visualize_results,
        lib/utils.py:340-435): writes the *pred*NNNN.npy files that
        test_pointcloud consumes plus colored pred/gt/rgb .ply."""
        from languagegroundedsemseg_tpu.utils.visualization import visualize_results

        ds = self.val_loader.dataset
        lvl0 = batch.graph.levels[0]
        if lvl0.coords is None:
            raise RuntimeError(
                "prediction dumps need device-side coords: run with "
                "--visualize/--save_prediction set at trainer construction "
                "so the val loader builds with ship_coords=True"
            )
        m = np.asarray(lvl0.bool_mask())  # sentinel rows are not voxels
        coords = np.asarray(lvl0.coords)[m]
        labels = np.asarray(batch.labels)[m]
        feats = np.asarray(batch.feats)[m]
        pred = np.asarray(pred)[m]
        inv_map = getattr(ds, "inverse_label_map", None)
        inv_arr = None
        if inv_map:
            inv_arr = np.zeros(self.num_labels, dtype=np.int64)
            for t, r in inv_map.items():
                if 0 <= t < self.num_labels:
                    inv_arr[t] = r
        cmap = getattr(ds, "SCANNET_COLOR_MAP", {})
        # Scene identity comes from the loader's per-voxel dataset-index
        # stream when present — immune to limit_numpoints scene drops; the
        # positional scene_base+b fallback serves directly-built batches.
        scene_idx = batch.extras.get("scene_idx")
        scene_idx = None if scene_idx is None else np.asarray(scene_idx)[m]
        transforms = batch.extras.get("transform")
        transforms = None if transforms is None else np.asarray(transforms)[m]
        for b in np.unique(coords[:, 0]):
            rows = coords[:, 0] == b
            if scene_idx is not None:
                idx = int(scene_idx[rows][0])
            else:
                idx = scene_base + int(b)
            if transforms is not None and self.config.save_prediction:
                # Original-scale prediction (reference save_predictions,
                # lib/utils.py:292-337): undo the voxelizer transform and
                # the train-id label mapping.
                tr = transforms[rows][0].reshape(4, 4)
                homo = np.hstack([
                    coords[rows, 1:4].astype(np.float64) + 0.5,
                    np.ones((int(rows.sum()), 1)),
                ])
                orig_xyz = (np.linalg.inv(tr) @ homo.T).T[:, :3]
                p = pred[rows]
                if inv_arr is not None:
                    p = inv_arr[np.clip(p, 0, self.num_labels - 1)]
                os.makedirs(self.config.save_pred_dir, exist_ok=True)
                np.save(
                    os.path.join(
                        self.config.save_pred_dir,
                        "pred_%04d_%02d.npy" % (idx, int(b)),
                    ),
                    np.hstack([orig_xyz, p[:, None].astype(np.float64)]),
                )
            name = (
                ds.get_output_id(idx)
                if hasattr(ds, "get_output_id")
                else f"scene_{idx:04d}"
            )
            colors = None
            if feats.shape[1] >= 3:
                colors = (feats[rows, :3] + 0.5) * 255.0 if self.config.normalize_color else feats[rows, :3]
            visualize_results(
                out_dir, name, coords[rows, 1:4].astype(np.float32), colors,
                pred[rows], labels[rows], cmap, self.num_labels,
                iteration=idx, inverse_map=inv_arr,
            )

    def validate(
        self,
        max_batches: Optional[int] = None,
        save_predictions_dir: Optional[str] = None,
        batches=None,
    ) -> Dict[str, float]:
        from languagegroundedsemseg_tpu.eval.miou import ap_from_histograms

        split = getattr(self.dataset, "frequency_organized_cats", None)
        ev = IoUEvaluator(self.num_labels, split, getattr(self.dataset, "CLASS_LABELS", None))
        losses, count = 0.0, 0
        # AP histogram accumulators are sized from the first batch's output
        # (ap_histograms_jax owns the bin count; a hardcoded width here
        # broke when the device histograms moved to 2048 bins).
        tp_acc = fp_acc = None
        viz_freq = self.config.visualize_freq
        for i, batch in enumerate(self.val_loader if batches is None else batches):
            if max_batches is not None and i >= max_batches:
                break
            hist, loss, pred, tp, fp = self.p_eval_metrics(self.state, batch)
            hist, loss, pred, tp, fp = (
                np.asarray(hist), np.asarray(loss), np.asarray(pred),
                np.asarray(tp), np.asarray(fp),
            )
            if self.mesh is not None:  # stacked (n_dev, ...) outputs
                hist, tp, fp = hist.sum(0), tp.sum(0), fp.sum(0)
                loss = float(loss.mean())
            ev.update_hist(hist)
            if tp_acc is None:
                tp_acc = np.zeros_like(tp, dtype=np.float64)
                fp_acc = np.zeros_like(fp, dtype=np.float64)
            tp_acc += tp
            fp_acc += fp
            losses += float(loss)
            count += 1
            # visualize_freq gates how often a val batch is dumped (0 =
            # every batch; reference pl_BaselineTrainer.py:176 semantics)
            if save_predictions_dir and (
                viz_freq == 0 or (i % viz_freq == 0 and i > 0)
            ):
                bs = self.val_loader.batch_size
                if self.mesh is None:
                    self._dump_batch_predictions(
                        batch, pred, save_predictions_dir,
                        scene_base=i * bs,
                    )
                else:
                    for k in range(self.n_dev):
                        dev_batch = jax.tree_util.tree_map(lambda x: x[k], batch)
                        self._dump_batch_predictions(
                            dev_batch, pred[k], save_predictions_dir,
                            scene_base=(i * self.n_dev + k) * bs,
                        )
        m = ev.compute()
        aps = ap_from_histograms(tp_acc, fp_acc)
        out = {
            "val_miou": m["miou"], "val_macc": m["macc"],
            "val_loss": losses / max(count, 1),
            "val_map": float(np.nanmean(aps)) if not np.isnan(aps).all() else float("nan"),
        }
        for k in ("head_miou", "common_miou", "tail_miou"):
            if k in m:
                out["val_" + k] = m[k]
        if split is not None:
            for i, name in enumerate(["head", "common", "tail"]):
                sel = np.asarray(split)[:, i]
                if sel.any() and not np.isnan(aps[sel]).all():
                    out[f"val_{name}_map"] = float(np.nanmean(aps[sel]))
        return out

    def fit_classifier_features(self, max_epochs: Optional[int] = None):
        """Classifier stage on precomputed features (reference
        pl_ClassifierTrainer semantics): extract frozen-backbone features
        over the train/val loaders once, then train the linear classifier
        with per-epoch class-balanced resampling
        (data/feature_dataset.py + train/classifier.py)."""
        from languagegroundedsemseg_tpu.data.feature_dataset import (
            ResampledFeatureDataset,
            extract_features,
        )
        from languagegroundedsemseg_tpu.train.classifier import (
            train_classifier_on_features,
        )

        cfg = self.config
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}

        def eval_fn(batch):
            b = batch.decompact()
            return self.eval_model.apply(
                variables, b.feats, b.graph, train=False)

        feats, labels = extract_features(
            eval_fn, self.train_loader, ignore_index=cfg.ignore_label)
        vfeats, vlabels = extract_features(
            eval_fn, self.val_loader, ignore_index=cfg.ignore_label)
        ds = ResampledFeatureDataset(
            feats, labels, num_classes=self.num_labels,
            samples_per_class=cfg.classifier_samples_per_class, seed=cfg.seed)
        val = (ResampledFeatureDataset(
            vfeats, vlabels, num_classes=self.num_labels,
            samples_per_class=cfg.classifier_samples_per_class,
            seed=cfg.seed + 1) if len(vfeats) else None)
        clf_vars, history = train_classifier_on_features(
            ds, num_classes=self.num_labels,
            epochs=max_epochs if max_epochs is not None else cfg.max_epoch,
            lr=cfg.lr, momentum=cfg.sgd_momentum, seed=cfg.seed, val=val,
            log_fn=lambda rec: self.log({"phase": "classifier", **rec}),
        )
        return clf_vars, history

    def fit(self, max_epochs: Optional[int] = None, val_every: int = 1,
            max_steps_per_epoch: Optional[int] = None):
        cfg = self.config
        epochs = max_epochs if max_epochs is not None else cfg.max_epoch
        if self.mode == "classifier" and cfg.classifier_resample_features:
            # Persist the stage's output (ADVICE r4): keep the trained
            # classifier params on the trainer and write them next to the
            # backbone checkpoints so a CLI run of the resample stage
            # produces a usable artifact, not just log records.
            clf_vars, history = self.fit_classifier_features(max_epochs)
            self.classifier_vars = clf_vars
            from flax import serialization

            path = os.path.join(self.log_dir, "classifier_features.ckpt")
            with open(path, "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(clf_vars)))
            with open(path + ".json", "w") as f:
                json.dump({"history": history}, f, indent=2, default=str)
            return self.state

        if cfg.resume:
            path = cfg.resume if os.path.isfile(cfg.resume) else find_resume_checkpoint(cfg.resume)
            if path:
                self.state = restore_checkpoint(path, self.state)
                print(f"resumed from {path} at step {int(self.state.step)}")

        key = jax.random.PRNGKey(cfg.seed)
        # overfit_batches (reference config/config.py:265): cache the first
        # N train batches (fraction of an epoch if < 1) and train AND
        # validate on exactly those — the standard sanity-check loop.
        overfit: Optional[list] = None
        if cfg.overfit_batches:
            n_ov = (
                int(cfg.overfit_batches)
                if cfg.overfit_batches >= 1
                else max(1, round(cfg.overfit_batches * len(self.train_loader)))
            )
            overfit = []
            for batch in self.train_loader:
                overfit.append(jax.device_get(batch))
                if len(overfit) >= n_ov:
                    break
        for epoch in range(epochs):
            t0 = time.time()
            # The hot loop never forces a per-step D2H sync: metrics stay
            # device arrays (fetched at stat_freq / epoch end) and the step
            # counter is tracked host-side — jax's async dispatch then
            # pipelines the next batch's H2D under the current step's
            # execution (PERF.md round 4: per-step float() fetches were
            # serializing the loader against the device).
            n_steps = 0
            losses: list = []
            step0 = int(self.state.step)
            for batch in (overfit if overfit is not None else self.train_loader):
                self.profiler.maybe_start(step0 + n_steps)
                self.state, metrics = self.p_train_step(self.state, batch, key)
                self.profiler.maybe_stop(step0 + n_steps + 1)
                n_steps += 1
                losses.append(metrics["loss"])
                if n_steps % cfg.stat_freq == 0:
                    self.log({"phase": "train", "epoch": epoch,
                              "step": step0 + n_steps,
                              **{k: float(v) for k, v in metrics.items()}})
                if max_steps_per_epoch and n_steps >= max_steps_per_epoch:
                    break
            train_loss = (
                float(np.mean(np.asarray(jax.device_get(losses), np.float64)))
                if losses else 0.0
            )

            val_metrics = {}
            if (epoch + 1) % val_every == 0:
                val_metrics = self.validate(batches=overfit)
                self._plateau_update(val_metrics)
            rec = {"phase": "epoch", "epoch": epoch, "step": int(self.state.step),
                   "train_loss": train_loss, "time_s": time.time() - t0,
                   **self.train_loader.counters.snapshot(), **val_metrics}
            self.log(rec)
            print(json.dumps(rec))
            self.ckpt.save(self.state, val_metrics, int(self.state.step))
        self.profiler.close()
        return self.state

    def _plateau_update(self, val_metrics: Dict[str, float]):
        cfg = self.config
        if cfg.scheduler != "ReduceLROnPlateau":
            return
        monitor = val_metrics.get(cfg.scheadule_monitor, val_metrics.get("val_miou"))
        if monitor is None:
            return
        if self.plateau_best is None or monitor > self.plateau_best:
            self.plateau_best = monitor
            self.plateau_wait = 0
        else:
            self.plateau_wait += 1
            if self.plateau_wait > cfg.reduce_patience:
                new_scale = float(self.state.lr_scale) * cfg.step_gamma
                floor = cfg.scheduler_min_lr / max(cfg.lr, 1e-12)
                self.state = self.state.replace(
                    lr_scale=jnp.asarray(max(new_scale, floor), jnp.float32)
                )
                self.plateau_wait = 0

    def test(self, save_predictions: bool = False):
        """Validation pass + optional full-pointcloud eval: voxel preds are
        dumped per scene, then KD-queried from the full-resolution cloud
        (reference eval_step -> visualize_results -> on_test_epoch_end ->
        dataset.test_pointcloud, lib/datasets/scannet.py:391-439)."""
        cfg = self.config
        dump = (
            save_predictions or cfg.save_prediction or cfg.visualize
            or cfg.test_original_pointcloud
        )
        pred_dir = cfg.visualize_path or os.path.join(self.log_dir, "visualize")
        metrics = self.validate(save_predictions_dir=pred_dir if dump else None)
        if cfg.test_original_pointcloud and hasattr(self.val_loader.dataset, "test_pointcloud"):
            miou, _ = self.val_loader.dataset.test_pointcloud(pred_dir, self.num_labels)
            metrics["full_cloud_miou"] = miou
        return metrics
