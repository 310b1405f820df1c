"""Observability: TensorBoard scalar events + jax.profiler trace capture.

Parity targets: the reference logs every PL metric to TensorBoard
(/root/reference/main.py:178 TensorBoardLogger) and SURVEY §5 commits this
framework to jax.profiler traces behind a flag. Both are wrapped here so the
trainer stays dependency-light: TensorBoard event writing degrades to a
no-op when the `tensorboard` package is absent, and profiler capture writes
standard trace protos under <log_dir>/plugins/profile that `tensorboard
--logdir` can open.
"""

from __future__ import annotations

import os
from typing import Dict, Optional


class TensorBoardLogger:
    """Scalar event writer; silently inert when tensorboard is missing."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self._writer = None
        self.log_dir = log_dir
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            try:
                from tensorboardX import SummaryWriter  # type: ignore

                self._writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._writer = None

    @property
    def active(self) -> bool:
        return self._writer is not None

    def log_scalars(self, step: int, scalars: Dict[str, float], prefix: str = ""):
        if self._writer is None:
            return
        for k, v in scalars.items():
            try:
                v = float(v)
            except (TypeError, ValueError):
                continue
            if v != v:  # skip NaNs: TB renders them as gaps anyway
                continue
            self._writer.add_scalar(prefix + k, v, global_step=step)
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
            self._writer = None


class ProfilerHook:
    """Capture a jax.profiler trace for steps [start, start + num).

    Call ``maybe_start(step)`` before and ``maybe_stop(step)`` after each
    train step. The trace lands under <log_dir>/plugins/profile/<ts>/ in the
    format `tensorboard --logdir <log_dir>` understands.
    """

    def __init__(self, log_dir: str, enabled: bool, start_step: int, num_steps: int):
        self.log_dir = log_dir
        self.enabled = enabled and num_steps > 0
        self.start_step = int(start_step)
        self.stop_step = int(start_step) + int(num_steps)
        self._running = False
        self.captured = False

    def maybe_start(self, step: int):
        if not self.enabled or self._running or self.captured:
            return
        if step >= self.start_step:
            import jax

            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._running = True

    def maybe_stop(self, step: int):
        if self._running and step + 1 >= self.stop_step:
            import jax

            jax.profiler.stop_trace()
            self._running = False
            self.captured = True

    def close(self):
        if self._running:
            import jax

            jax.profiler.stop_trace()
            self._running = False
            self.captured = True


def step_timer_scope(name: str):
    """Annotate a host-side region in profiler traces (TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
