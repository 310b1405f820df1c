"""Checkpointing: save/restore TrainState, best-monitor tracking, resume
discovery, and torch-checkpoint import.

Mirrors the reference's PL ModelCheckpoint semantics (top-1 on val_miou max
plus val_loss min for pretraining, main.py:129-170), the max-step resume glob
(main.py:140-156), and the lenient shape-matched cross-ecosystem weight
loading (lib/utils.py:17-45).
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization
from flax.core import FrozenDict

from languagegroundedsemseg_tpu.train.state import TrainState


def save_checkpoint(path: str, state: TrainState, metadata: Optional[Dict] = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.to_bytes(jax.device_get(state))
    with open(path, "wb") as f:
        f.write(blob)
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_checkpoint_metadata(path: str) -> Dict:
    meta = path + ".json"
    if os.path.isfile(meta):
        with open(meta) as f:
            return json.load(f)
    return {}


def find_resume_checkpoint(log_dir: str) -> Optional[str]:
    """Pick the max-step checkpoint in log_dir (reference main.py:140-156)."""
    ckpts = glob.glob(os.path.join(log_dir, "*.ckpt"))
    best, best_step = None, -1
    for c in ckpts:
        m = re.search(r"step[=_](\d+)", os.path.basename(c))
        step = int(m.group(1)) if m else 0
        if step > best_step:
            best, best_step = c, step
    return best


class CheckpointManager:
    """Keeps 'last' plus top-1 per monitored metric."""

    def __init__(self, log_dir: str, monitors: Dict[str, str]):
        """monitors: name -> 'max' | 'min' (e.g. {'val_miou': 'max'})."""
        self.log_dir = log_dir
        self.monitors = monitors
        self.best: Dict[str, float] = {}
        os.makedirs(log_dir, exist_ok=True)

    def save(self, state: TrainState, metrics: Dict[str, float], step: int, extra_meta=None):
        meta = {"step": step, "metrics": metrics}
        if extra_meta:
            meta.update(extra_meta)
        save_checkpoint(os.path.join(self.log_dir, f"last_step={step}.ckpt"), state, meta)
        # prune older "last" checkpoints
        for c in glob.glob(os.path.join(self.log_dir, "last_step=*.ckpt")):
            m = re.search(r"step=(\d+)", c)
            if m and int(m.group(1)) < step:
                for p in (c, c + ".json"):
                    if os.path.isfile(p):
                        os.remove(p)
        for name, mode in self.monitors.items():
            if name not in metrics or metrics[name] is None:
                continue
            v = float(metrics[name])
            cur = self.best.get(name)
            better = cur is None or (v > cur if mode == "max" else v < cur)
            if better:
                self.best[name] = v
                for c in glob.glob(os.path.join(self.log_dir, f"best_{name}*.ckpt")):
                    for p in (c, c + ".json"):
                        if os.path.isfile(p):
                            os.remove(p)
                save_checkpoint(
                    os.path.join(self.log_dir, f"best_{name}={v:.4f}_step={step}.ckpt"),
                    state,
                    meta,
                )


# ---- cross-ecosystem (torch) import ----------------------------------------


def me_kernel_permutation(num_slots: int, d: int = 3) -> Optional[np.ndarray]:
    """ME -> canonical kernel-slot permutation for hypercube regions.

    MinkowskiEngine's kernel-region iterator enumerates cube offsets with the
    FIRST spatial axis varying fastest (kernel_region.hpp increments
    coordinate 1 first); our canonical order (sparse/offsets.py,
    itertools.product) has the LAST axis fastest. Both walk the same per-axis
    ranges, so the mapping is the axis-reversal of the index cube:
    ``w_canonical[k] = w_me[perm[k]]``.

    Returns None when num_slots is not a perfect d-cube (cross/custom
    regions; our 4D custom region already replicates the reference's
    assembly order at models/modules/common.py:125-174, so no permutation
    applies there).
    """
    k = round(num_slots ** (1.0 / d))
    if k**d != num_slots or k <= 1:
        return None
    cube = np.arange(num_slots).reshape((k,) * d)
    return cube.transpose(tuple(range(d - 1, -1, -1))).ravel()


def _strip_prefixes(name: str) -> str:
    for p in ("module.", "model.", "encoder."):
        if name.startswith(p):
            name = name[len(p):]
    return name


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {_strip_prefixes(k): v.numpy() for k, v in blob.items() if hasattr(v, "numpy")}


def torch_to_flax_params(
    sd: Dict[str, np.ndarray],
    params: FrozenDict,
    batch_stats: FrozenDict,
    kernel_perm: "Optional[np.ndarray] | str" = "me",
) -> Tuple[FrozenDict, FrozenDict, list]:
    """Map a MinkowskiEngine Res16UNet state_dict onto our flax trees.

    Name translation: torch module paths (conv0p1s1.kernel, bn0.bn.weight,
    block1.0.conv1.kernel, ...) map onto our flax paths (conv0p1s1/kernel,
    bn0/BatchNorm/scale, block1_0/conv1/kernel, ...). Shapes are matched
    leniently (reference lib/utils.py:17-45): mismatches are skipped and
    reported. ``kernel_perm`` permutes ME kernel-slot order into our
    canonical offset order: the default "me" derives the hypercube
    axis-reversal per tensor (me_kernel_permutation); pass an explicit array
    or None to override.
    """
    flat_params = _flatten(params)
    flat_stats = _flatten(batch_stats)
    loaded, skipped = {}, []

    def try_set(table, key, value):
        if key in table and table[key].shape == value.shape:
            loaded[key] = value.astype(np.float32)
            return True
        return False

    for name, v in sd.items():
        v = np.asarray(v)
        parts = _strip_prefixes(name).split(".")
        # block1.0.conv1.kernel -> block1_0.conv1.kernel
        joined = []
        i = 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i + 1].isdigit():
                joined.append(parts[i] + "_" + parts[i + 1])
                i += 2
            else:
                joined.append(parts[i])
                i += 1
        # The reference builds block shortcuts as nn.Sequential(conv, norm)
        # (models/resnet.py:94-103), so tensors arrive as downsample.0.* /
        # downsample.1.bn.*; our modules are named downsample_conv/_norm.
        joined = [
            {"downsample_0": "downsample_conv", "downsample_1": "downsample_norm"}.get(j, j)
            for j in joined
        ]
        tail = joined[-1]
        base = "/".join(joined[:-1])

        ok = False
        if tail == "kernel":
            if v.ndim == 3:
                if isinstance(kernel_perm, str) and kernel_perm == "me":
                    p = me_kernel_permutation(v.shape[0])
                    if p is not None:
                        v = v[p]
                elif kernel_perm is not None and len(kernel_perm) == v.shape[0]:
                    v = v[kernel_perm]
                if v.shape[0] == 1:
                    # kernel-volume-1 conv stored (1, Cin, Cout); our
                    # pointwise kernels are (Cin, Cout)
                    tmpl = flat_params.get(f"{base}/kernel")
                    if tmpl is not None and tmpl.ndim == 2:
                        v = v[0]
            ok = try_set(flat_params, f"{base}/kernel", v)
        elif tail in ("weight", "bias") and joined[-2] == "bn":
            nm = {"weight": "scale", "bias": "bias"}[tail]
            b2 = "/".join(joined[:-2])
            ok = (
                try_set(flat_params, f"{b2}/{nm}", v)
                or try_set(flat_params, f"{b2}/SparseBatchNorm_0/{nm}", v)
                or try_set(flat_params, f"{b2}/BatchNorm/{nm}", v)
            )
        elif tail in ("running_mean", "running_var") and joined[-2] == "bn":
            nm = {"running_mean": "mean", "running_var": "var"}[tail]
            b2 = "/".join(joined[:-2])
            ok = (
                try_set(flat_stats, f"{b2}/{nm}", v)
                or try_set(flat_stats, f"{b2}/SparseBatchNorm_0/{nm}", v)
                or try_set(flat_stats, f"{b2}/BatchNorm/{nm}", v)
            )
        elif tail == "bias":
            ok = try_set(flat_params, f"{base}/bias", v)
        if not ok:
            skipped.append(name)

    new_params = _unflatten(flat_params, loaded)
    new_stats = _unflatten(flat_stats, loaded)
    return new_params, new_stats, skipped


def flax_to_torch_state_dict(
    params: FrozenDict,
    batch_stats: FrozenDict,
    template_sd: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], list]:
    """Inverse of ``torch_to_flax_params``: exports our flax trees back into
    a MinkowskiEngine-format state dict, following a TEMPLATE (names +
    shapes, e.g. the checkpoint being round-tripped or a freshly generated
    reference-format dict). Inverts the ME kernel-slot permutation and the
    pointwise (1, Cin, Cout) <-> (Cin, Cout) squeeze, so
    torch -> flax -> torch round trips byte-stable (tests/test_parity.py).
    Returns (state_dict, missing_names)."""
    flat_params = _flatten(params)
    flat_stats = _flatten(batch_stats)
    out: Dict[str, np.ndarray] = {}
    missing = []

    for name, tv in template_sd.items():
        tv = np.asarray(tv)
        parts = _strip_prefixes(name).split(".")
        joined = []
        i = 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i + 1].isdigit():
                joined.append(parts[i] + "_" + parts[i + 1])
                i += 2
            else:
                joined.append(parts[i])
                i += 1
        joined = [
            {"downsample_0": "downsample_conv", "downsample_1": "downsample_norm"}.get(j, j)
            for j in joined
        ]
        tail = joined[-1]
        base = "/".join(joined[:-1])

        v = None
        if tail == "kernel":
            v = flat_params.get(f"{base}/kernel")
            if v is not None:
                v = np.asarray(v)
                if tv.ndim == 3 and v.ndim == 2:
                    v = v[None]  # pointwise back to kernel-volume-1
                if v.ndim == 3:
                    p = me_kernel_permutation(v.shape[0])
                    if p is not None:
                        v = v[np.argsort(p)]
        elif tail in ("weight", "bias") and joined[-2] == "bn":
            nm = {"weight": "scale", "bias": "bias"}[tail]
            b2 = "/".join(joined[:-2])
            for k in (f"{b2}/{nm}", f"{b2}/SparseBatchNorm_0/{nm}",
                      f"{b2}/BatchNorm/{nm}"):
                if k in flat_params:
                    v = np.asarray(flat_params[k])
                    break
        elif tail in ("running_mean", "running_var") and joined[-2] == "bn":
            nm = {"running_mean": "mean", "running_var": "var"}[tail]
            b2 = "/".join(joined[:-2])
            for k in (f"{b2}/{nm}", f"{b2}/SparseBatchNorm_0/{nm}",
                      f"{b2}/BatchNorm/{nm}"):
                if k in flat_stats:
                    v = np.asarray(flat_stats[k])
                    break
        elif tail == "bias":
            v = flat_params.get(f"{base}/bias")

        if v is None or np.asarray(v).shape != tv.shape:
            missing.append(name)
            continue
        out[name] = np.asarray(v, dtype=np.float32)
    return out, missing


def _flatten(tree, prefix=""):
    out = {}
    items = tree.items() if hasattr(tree, "items") else []
    for k, v in items:
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if hasattr(v, "items"):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat_template, loaded):
    from flax.traverse_util import unflatten_dict

    merged = {k: loaded.get(k, v) for k, v in flat_template.items()}
    return FrozenDict(unflatten_dict({tuple(k.split("/")): v for k, v in merged.items()}))
