"""Device mesh construction."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices.

    The model is ~38M params max (SURVEY.md §2.4) so data parallelism is the
    scaling dimension; capacity (scene-size) sharding composes later as a
    second axis.
    """
    devices = jax.devices()
    if n_devices is not None and len(devices) < n_devices:
        # Fall back to the (possibly virtual, via
        # --xla_force_host_platform_device_count) CPU platform so multi-chip
        # code paths stay exercisable on a single-chip or no-chip host.
        try:
            cpu_devices = jax.devices("cpu")
        except RuntimeError:
            cpu_devices = []
        if len(cpu_devices) >= n_devices:
            devices = cpu_devices
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))
