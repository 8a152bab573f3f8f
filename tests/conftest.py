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
# NOTE: do NOT enable the persistent compilation cache here. This XLA
# build's CPU AOT reload path aborts the process on a machine-feature
# check ("+prefer-no-gather is not supported on the host machine" →
# Fatal Python error inside compilation_cache.get_executable_and_time),
# killing the whole pytest run mid-suite (observed 2026-08-20). Compile
# time is the price of a stable suite.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_collection_modifyitems(session, config, items):
    """Compile the biggest XLA programs while the process is YOUNG.

    This environment's XLA:CPU compiler has crashed (SIGSEGV/abort inside
    backend_compile_and_load) building the largest scan-embedded cores late
    in a long suite process, after ~50 prior compilations — the identical
    compile succeeds in a fresh process (2026-08-20, twice at the same
    aged-process point). Running the chunk-core-heavy files first means the
    big modules compile early and the tail of the suite only builds small
    unit-test programs. Stable sort: intra-file order is unchanged."""
    head = {
        "test_pipeline.py": 0,        # 640×480 chunk/stream cores
        "test_bank_growth.py": 1,     # 320×180 chunk cores + growth
        "test_stream_loop_ci.py": 2,  # 240×135 stream cores + closure
        "test_photoreal_ate.py": 3,
        "test_vi_e2e.py": 4,
        "test_stream_loop_closure.py": 5,
    }
    items.sort(key=lambda it: head.get(it.fspath.basename, 50))
