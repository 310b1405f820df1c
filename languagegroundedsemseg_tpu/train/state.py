"""Train state pytree: params + BN running stats + optimizer state + step."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    # Host-controlled multiplier for ReduceLROnPlateau (reference
    # lib/solvers.py:87-100); 1.0 otherwise.
    lr_scale: jnp.ndarray

    @classmethod
    def create(cls, variables: FrozenDict, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            lr_scale=jnp.ones((), jnp.float32),
        )
