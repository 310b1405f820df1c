"""Test harness: force an 8-device virtual CPU mesh before jax import.

The reference could only exercise its NCCL/DDP path on real GPUs (SURVEY.md
§4); here multi-chip sharding is testable on CPU via XLA's host-platform
device-count flag.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon site hook may import jax before this conftest runs, freezing the
# platform choice — override through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
