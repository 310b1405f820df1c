"""Dataset registry + parallel prefetching data loader.

The loader is the TPU-native replacement for torch DataLoader + InfSampler +
collate (reference lib/dataloader.py:6-35, lib/transforms.py:385-423,
lib/dataset.py:337-416): a pool of ``num_workers`` threads runs the per-scene
pipeline and the graph builder (the C++ builder releases the GIL, so threads
give real concurrency), assembling fixed-capacity device batches ahead of the
accelerator. Batches are delivered in deterministic submission order; any
worker exception is re-raised in the consuming thread (the reference gets
this from torch DataLoader worker propagation). Color normalization
(feats/255 - 0.5) happens here — matching the trainer-side normalization of
the reference (pl_BaselineTrainer.py:299).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List

import numpy as np

from languagegroundedsemseg_tpu.data.batching import BatchBuilder
from languagegroundedsemseg_tpu.data.dataset import DatasetPhase, build_input_transforms
from languagegroundedsemseg_tpu.train.step import TrainBatch

_DATASETS = {}


def register_dataset(cls):
    _DATASETS[cls.__name__] = cls
    return cls


def load_dataset(name: str):
    if not _DATASETS:
        _populate()
    if name not in _DATASETS:
        raise KeyError(f"unknown dataset {name!r}; available: {sorted(_DATASETS)}")
    return _DATASETS[name]


def _populate():
    from languagegroundedsemseg_tpu.data import scannet, stanford, prior_info, synthetic_dataset

    for mod in (scannet, stanford, prior_info, synthetic_dataset):
        for nm in dir(mod):
            obj = getattr(mod, nm)
            if isinstance(obj, type) and nm.endswith("Dataset"):
                _DATASETS[nm] = obj


class LoaderCounters:
    """Thread-safe data-loss / fill counters, logged by the trainer.

    The reference's analog (limit_numpoints truncation, lib/transforms.py:405)
    prints a warning per event; here every silent-drop site increments a
    counter so truncation is observable in metrics.jsonl."""

    def __init__(self):
        self._lock = threading.Lock()
        self.batches = 0
        self.scenes_dropped = 0  # limit_numpoints whole-scene drops
        self.voxels_dropped = 0  # level-0 capacity truncation
        self.level_overflows: dict = {}  # level -> count of truncated batches
        self.level_fill_sum: dict = {}  # level -> sum of num/capacity
        self.level_num_sum: dict = {}  # level -> sum of valid rows

    def update(self, stats: dict):
        with self._lock:
            self.batches += 1
            self.scenes_dropped += stats.get("scenes_dropped", 0)
            self.voxels_dropped += stats.get("voxels_dropped", 0)
            for l, (num, cap, overflowed) in stats.get("levels", {}).items():
                self.level_overflows[l] = self.level_overflows.get(l, 0) + int(overflowed)
                self.level_fill_sum[l] = self.level_fill_sum.get(l, 0.0) + num / max(cap, 1)
                self.level_num_sum[l] = self.level_num_sum.get(l, 0) + int(num)

    def snapshot(self) -> dict:
        with self._lock:
            out = {
                "loader_batches": self.batches,
                "loader_scenes_dropped": self.scenes_dropped,
                "loader_voxels_dropped": self.voxels_dropped,
            }
            for l, c in sorted(self.level_overflows.items()):
                out[f"loader_overflow_l{l}"] = c
            if self.batches:
                for l, s in sorted(self.level_fill_sum.items()):
                    out[f"loader_fill_l{l}"] = round(s / self.batches, 4)
            return out


class DataLoader:
    """Yields TrainBatch (one device's worth) or stacked multi-device
    batches. Infinite iteration when repeat=True (InfSampler semantics)."""

    def __init__(
        self,
        dataset,
        builder: BatchBuilder,
        batch_size: int,
        shuffle: bool = True,
        repeat: bool = False,
        seed: int = 0,
        num_workers: int = 2,
        num_devices: int = 1,
        ignore_index: int = 255,
        extras_fn=None,
    ):
        # Graph builds churn large numpy scratch every batch; tune the host
        # allocator once per process (utils/host_alloc.py — big, measured
        # win on lazily-backed VM memory; no-op where unsupported).
        from languagegroundedsemseg_tpu.utils.host_alloc import tune

        tune()
        self.dataset = dataset
        self.builder = builder
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.num_devices = num_devices
        # Optional per-item extras: extras_fn(item) -> dict of (N, ...)
        # arrays carried through dedup/sort/padding (instance targets for
        # the insseg trainer).
        self.extras_fn = extras_fn
        self.epoch = 0
        # Persistent across __iter__ calls: keeps per-scene augmentation RNG
        # distinct epoch over epoch (torch DataLoader gets this implicitly
        # from its global RNG stream).
        self._batch_counter = 0
        self.counters = LoaderCounters()
        # Ship batches to the device from the worker thread so host->device
        # transfer overlaps the previous step's compute (jax.device_put is
        # async). Significant when H2D is slow (remote/tunneled accelerators).
        self.device_put = True

    def __len__(self):
        per_step = self.batch_size * self.num_devices
        if not len(self.dataset):
            return 0
        # wrap-around padding -> ceil (torch DistributedSampler total_size)
        return max(-(-len(self.dataset) // per_step), 1)

    def _epoch_orders(self):
        while True:
            # Epoch folded into the shuffle RNG: a fresh order every epoch
            # (torch DistributedSampler.set_epoch semantics).
            rng = np.random.default_rng((self.seed, self.epoch))
            order = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(order)
            yield order
            self.epoch += 1
            if not self.repeat:
                return

    def _build_one(self, indices: List[int], batch_counter: int) -> TrainBatch:
        scenes, items = [], []
        for j, idx in enumerate(indices):
            rng = np.random.default_rng((self.seed, batch_counter, j))
            item = self.dataset.get_item(int(idx), rng)
            items.append(item)
            feats = item["feats"]
            labels = item["labels"]
            if labels is not None and labels.ndim == 2:
                labels = labels[:, 0]
            scenes.append((item["coords"], feats, labels))
        if getattr(self.dataset.config, "normalize_color", True):
            # Wire format decided PER BATCH (mixed dtypes would promote to
            # raw-valued f32 that the device step would not normalize):
            # uint8 = ship raw colors, the step normalizes on device
            # (TrainBatch.decompact — the reference also normalizes
            # trainer-side, pl_BaselineTrainer.py:299). Augmented colors
            # re-quantize to the source color depth; a batch whose chromatic
            # augs left [0, 255] takes the f32 wire path instead of clamping
            # (ADVICE r4 — no silent train-time distribution change).
            as_uint8 = self.builder.compact_feats and all(
                f.shape[1] == 3
                and (f.size == 0 or (f.min() >= 0.0 and f.max() <= 255.0))
                for _, f, _ in scenes
            )
            for j, (c, f, l) in enumerate(scenes):
                if as_uint8:
                    f = np.round(f).astype(np.uint8)
                else:
                    f = f.copy()
                    f[:, :3] = f[:, :3] / 255.0 - 0.5
                scenes[j] = (c, f, l)
        stats: dict = {}
        # Per-voxel dataset index: prediction dumps derive scene identity
        # from this, so dropped/reordered scenes can never shift ids
        # (reference aligns dumps positionally, lib/utils.py:340-435).
        extras = [
            {"scene_idx": np.full(len(s[0]), int(idx), np.int32)}
            for idx, s in zip(indices, scenes)
        ]
        if self.extras_fn is not None:
            for e, it in zip(extras, items):
                e.update(self.extras_fn(it))
        if getattr(self.dataset.config, "return_transformation", False):
            # Voxelizer transform rows (reference cflt_collate, lib/
            # dataset.py:352): lets the dump path restore original-scale
            # coordinates (lib/utils.py:292-315).
            for e, it in zip(extras, items):
                tr = np.asarray(
                    it.get("transform") if it.get("transform") is not None
                    else np.eye(4), np.float32,
                ).reshape(16)
                e["transform"] = np.tile(tr, (len(e["scene_idx"]), 1))
        batch = self.builder.build(scenes, extras=extras, stats_out=stats)
        self.counters.update(stats)
        return batch

    def _build_group(self, index_groups: List[List[int]], base_counter: int):
        device_batches = [
            self._build_one(indices, base_counter + k)
            for k, indices in enumerate(index_groups)
        ]
        if self.num_devices == 1:
            b = device_batches[0]
            if getattr(b, "graph", None) is not None:
                # pinned single-device builds keep flats (see batching.py);
                # no cross-shard decision here, so drop covered ones now
                from languagegroundedsemseg_tpu.sparse.graph_host import (
                    drop_covered_flat_maps,
                )

                b = b.replace(graph=drop_covered_flat_maps(b.graph))
        else:
            from languagegroundedsemseg_tpu.parallel.dp import stack_batches

            b = stack_batches(device_batches)
        if self.device_put and self.num_devices == 1:
            import jax

            b = jax.device_put(b)
        return b

    def __iter__(self) -> Iterator:
        per_step = self.batch_size * self.num_devices
        n_dev = self.num_devices
        # Queue of in-flight futures, in submission order. maxsize bounds the
        # number of batches being built/held at once.
        fut_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers + 1)
        stop = threading.Event()
        pool = ThreadPoolExecutor(
            max_workers=self.num_workers, thread_name_prefix="lgs-loader"
        )

        def feeder():
            try:
                for order in self._epoch_orders():
                    if stop.is_set() or not len(order):
                        return
                    # Pad the epoch to a whole number of per-step groups by
                    # wrapping around (torch DistributedSampler semantics:
                    # duplicates <= per_step-1 scenes instead of dropping).
                    total = -(-len(order) // per_step) * per_step
                    padded = np.resize(order, total)
                    for start in range(0, total, per_step):
                        if stop.is_set():
                            return
                        group = padded[start:start + per_step].reshape(
                            n_dev, self.batch_size
                        )
                        base = self._batch_counter
                        self._batch_counter += n_dev
                        fut_q.put(pool.submit(
                            self._build_group, [list(g) for g in group], base
                        ))
            except BaseException as e:  # index-stream/submit errors -> consumer
                fut_q.put(e)
            finally:
                fut_q.put(None)

        t = threading.Thread(target=feeder, daemon=True)
        t.start()
        try:
            while True:
                item = fut_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item.result()  # re-raises any worker exception
        finally:
            stop.set()
            pool.shutdown(wait=False, cancel_futures=True)


def initialize_data_loader(
    DatasetClass,
    config,
    phase,
    num_workers: int,
    shuffle: bool,
    repeat: bool,
    augment_data: bool,
    batch_size: int,
    limit_numpoints: int,
    num_devices: int = 1,
    spec=None,
    ship_coords: bool = True,
):
    """Reference-compatible loader factory (lib/dataset.py:337-416).

    ship_coords=False builds compact batches (no device-side spatial
    coords — data/batching.py); callers that visualize, run CRF wrappers,
    or read coords back keep the default."""
    from languagegroundedsemseg_tpu.models.res16unet import res16unet_graph_spec

    prevoxel, input_t = build_input_transforms(config, DatasetClass, augment_data)
    dataset = DatasetClass(
        config,
        phase=phase,
        augment_data=augment_data,
        prevoxel_transform=prevoxel,
        input_transform=input_t,
        cache=config.cache_data,
    )
    builder = BatchBuilder(
        spec=spec or res16unet_graph_spec(config.conv1_kernel_size),
        ignore_index=config.ignore_label,
        limit_numpoints=limit_numpoints,
        fixed_capacity=config.fixed_capacity or None,
        level_ratios=config.level_capacity_ratios,
        ship_coords=ship_coords,
        compact_feats=True,
        # Pin jit signatures across batches (data/batching.py): flex
        # capacities floor at their running max, window geometry pins to
        # first-seen, overflow buckets pad to running maxima — recompiles
        # decay to zero instead of tracking per-batch density.
        stabilize=True,
    )
    return DataLoader(
        dataset,
        builder,
        batch_size=batch_size,
        shuffle=shuffle,
        repeat=repeat,
        seed=config.seed,
        num_workers=num_workers,
        num_devices=num_devices,
        ignore_index=config.ignore_label,
    )
