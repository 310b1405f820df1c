"""Optimizers and LR schedules with reference-parity semantics.

Mirrors lib/solvers.py:45-102:
- SGD with torch semantics: grad += wd * param; buf = momentum * buf +
  (1 - dampening) * grad; update = -lr * buf (dampening 0.1 is the
  reference default, config/config.py:82 — optax.trace has no dampening, so
  this is a custom transform).
- Adam with decoupled-from-nothing torch semantics (L2 via grad add).
- Schedules: StepLR / MultiStepLR / PolyLR / SquaredLR / ExpLR as pure
  functions of the step counter; ReduceLROnPlateau is a host-side scale
  injected through TrainState.lr_scale.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax


class TraceDampState(NamedTuple):
    momentum: optax.Params
    count: jnp.ndarray


def trace_with_dampening(decay: float, dampening: float) -> optax.GradientTransformation:
    """buf = decay * buf + (1 - dampening) * grad  (torch SGD momentum).

    torch initializes the buffer to the *raw* gradient on the first step
    (dampening not applied, torch/optim/sgd.py) — matched via a step count.
    """

    def init_fn(params):
        return TraceDampState(
            jax.tree_util.tree_map(jnp.zeros_like, params), jnp.zeros((), jnp.int32)
        )

    def update_fn(updates, state, params=None):
        first = state.count == 0
        new_buf = jax.tree_util.tree_map(
            lambda b, g: jnp.where(first, g, decay * b + (1.0 - dampening) * g),
            state.momentum,
            updates,
        )
        return new_buf, TraceDampState(new_buf, state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def sgd_torch(
    learning_rate: optax.ScalarOrSchedule,
    momentum: float = 0.9,
    dampening: float = 0.1,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(trace_with_dampening(momentum, dampening))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def adam_torch(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        # torch.optim.Adam applies weight decay as L2 on the gradient.
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def make_lr_schedule(
    scheduler: str,
    base_lr: float,
    *,
    step_size: float = 2e4,
    step_gamma: float = 0.3,
    multi_step_milestones: Sequence[int] = (120, 150),
    poly_power: float = 0.9,
    max_steps: float = 400,
    exp_gamma: float = 0.95,
    exp_step_size: float = 445,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns schedule(step) -> lr. The unit of ``step`` matches the
    reference's scheduler stepping cadence (epochs under PL's default)."""
    if scheduler == "StepLR":
        return lambda s: base_lr * step_gamma ** jnp.floor(s / step_size)
    if scheduler == "MultiStepLR":
        ms = jnp.asarray(list(multi_step_milestones), dtype=jnp.float32)
        return lambda s: base_lr * step_gamma ** (s >= ms).sum().astype(jnp.float32)
    if scheduler == "PolyLR":
        return lambda s: base_lr * jnp.maximum(1.0 - s / (max_steps + 1), 0.0) ** poly_power
    if scheduler == "SquaredLR":
        return lambda s: base_lr * jnp.maximum(1.0 - s / (max_steps + 1), 0.0) ** 2
    if scheduler == "ExpLR":
        return lambda s: base_lr * exp_gamma ** (s / exp_step_size)
    if scheduler in ("ReduceLROnPlateau", "none", None):
        return lambda s: jnp.asarray(base_lr, jnp.float32)
    raise ValueError(f"unknown scheduler {scheduler!r}")


def initialize_optimizer(
    config,
    schedule: Optional[optax.ScalarOrSchedule] = None,
) -> optax.GradientTransformation:
    """Factory from a framework Config (lib/solvers.py:45-72 equivalent).

    The schedule (if given) replaces config.lr; TrainState.lr_scale further
    multiplies for plateau scheduling. ``config.iter_size > 1`` enables
    gradient accumulation (the reference's --iter_size flag,
    config/config.py:88) via optax.MultiSteps — parameters update every
    iter_size micro-batches.
    """
    lr = schedule if schedule is not None else config.lr
    if config.optimizer == "SGD":
        tx = sgd_torch(
            lr,
            momentum=config.sgd_momentum,
            dampening=config.sgd_dampening,
            weight_decay=config.weight_decay,
        )
    elif config.optimizer == "Adam":
        tx = adam_torch(
            lr,
            b1=config.adam_beta1,
            b2=config.adam_beta2,
            weight_decay=config.weight_decay,
        )
    else:
        raise ValueError(f"optimizer {config.optimizer!r} not supported")
    if getattr(config, "iter_size", 1) and config.iter_size > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(config.iter_size))
    return tx
