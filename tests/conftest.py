"""Test configuration: hermetic CPU backend with 8 virtual devices.

Tests never require TPU hardware. Multi-chip sharding tests run on a virtual
8-device CPU mesh via `--xla_force_host_platform_device_count` (SURVEY.md §4.4).
This must happen before the first `import jax` anywhere in the test session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
