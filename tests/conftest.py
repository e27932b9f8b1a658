"""Test configuration: hermetic CPU backend with 8 virtual devices.

Tests never require TPU hardware. Multi-chip sharding tests run on a virtual
8-device CPU mesh via `--xla_force_host_platform_device_count` (SURVEY.md §4.4).

Note: this environment's sitecustomize registers the TPU PJRT plugin and
overrides `jax_platforms` via `jax.config` (so the JAX_PLATFORMS env var is
NOT enough); we must override the config back before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Persistent compilation cache: repeated test runs skip XLA recompiles.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8
