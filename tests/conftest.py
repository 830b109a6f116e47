"""Test configuration: force an 8-device virtual CPU mesh and f64.

Multi-chip sharding tests run against a virtual CPU mesh (the TPU
hardware available to CI is single-chip); the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip.
"""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered a TPU
# backend before this file runs; the config-level override still wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the solver graph is compiled once per
# problem shape; cache hits make repeat test runs much faster.
# Persistent compilation cache DISABLED for the CPU suite: this
# environment's jaxlib nondeterministically segfaults while
# (de)serializing large CPU executables through the cache
# (compilation_cache.{get,put}_executable_and_time) — observed killing
# otherwise-green runs at unrelated tests.  Tests pay recompiles;
# correctness is unaffected.  (bench.py keeps the cache on the TPU
# path, which has been stable.)
jax.config.update("jax_enable_compilation_cache", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
