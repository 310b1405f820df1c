"""Dataset registry + prefetching data loader.

The loader is the TPU-native replacement for torch DataLoader + InfSampler +
collate (reference lib/dataloader.py:6-35, lib/transforms.py:385-423,
lib/dataset.py:337-416): worker threads run the per-scene pipeline and the
graph builder, assembling fixed-capacity device batches a step ahead of the
accelerator. Color normalization (feats/255 - 0.5) happens here — matching
the trainer-side normalization of the reference (pl_BaselineTrainer.py:299).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional

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
    ):
        self.dataset = dataset
        self.builder = builder
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.repeat = repeat
        self.seed = seed
        self.num_workers = max(num_workers, 1)
        self.num_devices = num_devices
        self.epoch = 0
        # Ship batches to the device from the producer thread so host->device
        # transfer overlaps the previous step's compute (jax.device_put is
        # async). Significant when H2D is slow (remote/tunneled accelerators).
        self.device_put = True

    def __len__(self):
        per_step = self.batch_size * self.num_devices
        return max(len(self.dataset) // per_step, 1) if len(self.dataset) else 0

    def _index_stream(self):
        rng = np.random.default_rng(self.seed)
        while True:
            order = np.arange(len(self.dataset))
            if self.shuffle:
                rng.shuffle(order)
            yield from order
            self.epoch += 1
            if not self.repeat:
                return

    def _build_one(self, indices: List[int], batch_rng_seed: int) -> TrainBatch:
        scenes = []
        for j, idx in enumerate(indices):
            rng = np.random.default_rng((batch_rng_seed, j))
            item = self.dataset.get_item(int(idx), rng)
            feats = item["feats"]
            if getattr(self.dataset.config, "normalize_color", True):
                feats = feats.copy()
                feats[:, :3] = feats[:, :3] / 255.0 - 0.5
            labels = item["labels"]
            if labels is not None and labels.ndim == 2:
                labels = labels[:, 0]
            scenes.append((item["coords"], feats, labels))
        return self.builder.build(scenes)

    def __iter__(self) -> Iterator:
        stream = self._index_stream()
        per_batch = self.batch_size
        n_dev = self.num_devices
        out_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers + 1)
        stop = threading.Event()

        def producer():
            counter = 0
            try:
                while not stop.is_set():
                    device_batches = []
                    for _ in range(n_dev):
                        indices = []
                        for _ in range(per_batch):
                            try:
                                indices.append(next(stream))
                            except StopIteration:
                                break
                        if len(indices) < per_batch and not indices:
                            raise StopIteration
                        device_batches.append(
                            self._build_one(indices, self.seed * 100003 + counter)
                        )
                        counter += 1
                    if n_dev == 1:
                        b = device_batches[0]
                    else:
                        from languagegroundedsemseg_tpu.parallel.dp import stack_batches

                        b = stack_batches(device_batches)
                    if self.device_put and n_dev == 1:
                        import jax

                        b = jax.device_put(b)
                    out_q.put(b)
            except StopIteration:
                pass
            finally:
                out_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                b = out_q.get()
                if b is None:
                    return
                yield b
        finally:
            stop.set()


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
):
    """Reference-compatible loader factory (lib/dataset.py:337-416)."""
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
