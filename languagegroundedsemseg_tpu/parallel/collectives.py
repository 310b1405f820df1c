"""Cross-device collectives for variable-size sparse tensors.

The reference hand-rolls NCCL helpers for ragged point tensors: a pickled
all_gather with max-size padding and a differentiable all_gather that pads
each rank's (num_points, feat_dim) to the max across ranks (reference
downstream/insseg/lib/distributed.py:148-222). Under the fixed-capacity
design every shard already has identical shapes, so these become single XLA
collectives over the mesh axis — differentiable for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_features(x: jnp.ndarray, axis_name: str, valid_mask=None):
    """Gather every device's (capacity, F) feature block.

    Returns ((n_dev * capacity, F), (n_dev * capacity,) mask). The
    fixed-capacity equivalent of all_gather_differentiable (reference
    :148-181) — gradients flow back to each device's shard via the
    transpose of all_gather (psum_scatter).
    """
    g = jax.lax.all_gather(x, axis_name)  # (n_dev, cap, F)
    g = g.reshape((-1,) + x.shape[1:])
    if valid_mask is not None:
        m = jax.lax.all_gather(valid_mask, axis_name).reshape(-1)
        return g, m
    return g


def all_reduce_mean(tree, axis_name: str):
    return jax.tree_util.tree_map(lambda v: jax.lax.pmean(v, axis_name), tree)


def all_reduce_sum(tree, axis_name: str):
    return jax.tree_util.tree_map(lambda v: jax.lax.psum(v, axis_name), tree)


def barrier(axis_name: str):
    """Synchronization point (reference distributed.py:135-147 barrier):
    a trivial psum forces every device to reach this program point."""
    return jax.lax.psum(jnp.ones(()), axis_name)
