"""Test configuration: force a LOCAL CPU backend with 8 virtual devices.

The environment boots an `axon` remote-TPU PJRT plugin from a sitecustomize
hook (PYTHONPATH=/root/.axon_site) at interpreter start, which overrides
JAX_PLATFORMS from the environment. Setting the platform via
`jax.config.update` at runtime — before any backend is initialized — wins
over the hook, so tests run on the local host CPU (fast, deterministic)
while the driver benches on the real chip. The 8 virtual devices exercise
the multi-chip sharding paths without TPU hardware.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-dominated (chunk cores take
# 2-5 min each to build on one CPU core); caching executables on disk makes
# repeat runs and shared-shape tests pay the trace, not the XLA build.
jax.config.update("jax_compilation_cache_dir", "/tmp/mageslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
