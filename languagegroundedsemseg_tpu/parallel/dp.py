"""Data-parallel wrapping of step functions via shard_map.

Each device holds its own fixed-capacity batch shard (feats + labels + its
own ConvGraph with device-local gather indices); gathers never cross chips.
Cross-chip traffic is exactly: grad psum, BN statistic psum, metric psum —
all riding ICI. This replaces the reference's PL DDPPlugin + NCCL stack
(main.py:192-195, downstream/insseg/lib/distributed.py:225-236).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def stack_batches(batches):
    """Stack per-device TrainBatch pytrees along a new leading axis.

    Fused kernel maps (ConvGraph.gmaps) are data-dependent: a device whose
    scenes overflow the leftover budget falls back to the flat table for
    that map, which changes the pytree STRUCTURE. Stacking requires one
    structure, so fused maps are intersected across devices first — any
    map not fused identically everywhere drops to the flat path on all
    devices (the flat table always ships).
    """
    graphs = [getattr(b, "graph", None) for b in batches]
    if all(g is not None and getattr(g, "gmaps", None) is not None for g in graphs):
        keep = set(graphs[0].gmaps)
        for g in graphs[1:]:
            keep &= set(g.gmaps)

        def _sig(gm):
            # treedef carries the static fields (tile/win, cols, ov_seg...);
            # leaf shapes catch data-dependent array-size divergence (e.g.
            # an empty vs populated overflow COO)
            leaves, treedef = jax.tree_util.tree_flatten(gm)
            return (treedef, tuple(np.shape(l) for l in leaves))

        # MaskedShiftMaps whose only divergence is the overflow-COO bounds
        # (tight, data-dependent buckets since _pack_ov) are harmonized by
        # padding with guard rows — a semantic no-op — instead of dropping
        # the fused path on every shard.
        from languagegroundedsemseg_tpu.sparse.graph_host import (
            pad_cs_overflow_to,
            pad_ms_overflow_to,
        )
        from languagegroundedsemseg_tpu.sparse.types import (
            ChildSumMap,
            MaskedShiftMap,
        )

        for n in keep:
            ms = [g.gmaps[n] for g in graphs]
            if all(isinstance(m, ChildSumMap) for m in ms):
                if len({(m.num_slots, m.tile, m.win, m.n_groups,
                         m.out_capacity_s, m.in_capacity) for m in ms}) != 1:
                    continue
                if len({_sig(m) for m in ms}) == 1:
                    continue
                seg = max(int(m.ov_seg) for m in ms)
                na = max(
                    max(m.ov_in.shape[0] for m in ms),
                    max(int(m.ov_off[-1]) for m in ms) + seg,
                ) if any(m.ov_in.shape[0] for m in ms) else 0
                for g, m in zip(graphs, ms):
                    g.gmaps[n] = pad_cs_overflow_to(m, seg, na)
                continue
            if not all(isinstance(m, MaskedShiftMap) for m in ms):
                continue
            if len({(m.cols, m.mirror_perm, m.tile, m.win) for m in ms}) != 1:
                continue
            if len({_sig(m) for m in ms}) == 1:
                continue
            seg = max(int(m.ov_seg) for m in ms)
            dseg = max(int(m.dwov_seg) for m in ms)
            na = max(
                max(m.ov_in.shape[0] for m in ms),
                max(int(m.ov_off[-1]) for m in ms) + seg,
            ) if any(m.ov_in.shape[0] for m in ms) else 0
            nd = max(
                max(m.dwov_in.shape[0] for m in ms),
                max(int(m.dwov_off[-1]) for m in ms) + dseg,
            ) if any(m.dwov_in.shape[0] for m in ms) else 0
            for g, m in zip(graphs, ms):
                g.gmaps[n] = pad_ms_overflow_to(m, seg, na, dseg, nd)
        keep = {
            n for n in keep
            if len({_sig(g.gmaps[n]) for g in graphs}) == 1
        }
        if any(set(g.gmaps) != keep for g in graphs):
            graphs = [g.replace(gmaps={n: g.gmaps[n] for n in keep})
                      for g in graphs]
        # Now that every shard agrees on which fused maps survive, drop the
        # flat tables they cover — identically on all shards (per-shard
        # builds keep flats in pinned mode exactly for this).
        from languagegroundedsemseg_tpu.sparse.graph_host import (
            drop_covered_flat_maps,
        )

        batches = [
            b.replace(graph=drop_covered_flat_maps(g))
            for b, g in zip(batches, graphs)
        ]
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *batches)


def _unstack_shard(tree):
    """Inside shard_map each device sees leading dim 1 — drop it."""
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def shard_train_step(step_fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """Wrap step(state, batch, key) for SPMD execution.

    state/key are replicated; batch is sharded on its stacked leading axis.
    Returns p_step(state, stacked_batch, key) -> (state, metrics), both
    replicated (the step must psum grads/metrics over ``axis``, which
    make_train_step does when axis_name is set).
    """

    def wrapped(state, batch, key):
        b = _unstack_shard(batch)
        return step_fn(state, b, key)

    sharded = shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def shard_eval_step(step_fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """Eval: batch sharded, outputs returned sharded on the leading axis."""

    def wrapped(state, batch):
        b = _unstack_shard(batch)
        out = step_fn(state, b)
        return jax.tree_util.tree_map(lambda x: x[None], out)

    sharded = shard_map(
        wrapped,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(sharded)
