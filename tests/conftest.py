"""Test configuration: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (the driver benches on the real chip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env ships JAX_PLATFORMS=axon (real TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
