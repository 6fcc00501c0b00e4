"""Test configuration: force CPU with 8 virtual devices so sharding
tests run without TPU hardware, keep f32 (matching device behavior)."""

import os

# Force CPU even when the image boots a TPU platform plugin (axon): the
# sitecustomize-registered plugin rewrites jax_platforms to "axon,cpu"
# at interpreter start, and initializing it claims the tunneled TPU —
# which blocks for minutes when another process holds the claim.  Tests
# must be fast and deterministic, so pin the config back to cpu BEFORE
# the first op triggers backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the sandbox host has one core, so cold
# XLA compiles dominate test time; cache them across pytest runs.
# CPU runs use a MACHINE-KEYED directory: XLA:CPU caches AOT machine
# code, and entries written by the driver's (different) machine into
# the shared .jax_cache SIGILL/segfault here (utils/cachedir.py).
import sys  # noqa: E402

sys.path.insert(0, "/root/repo")
from voxelslam_tpu.utils.cachedir import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running scenario test (loop recall, "
        "long runs); included by default, deselect with -m 'not slow'"
    )


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _free_jax_memory_between_modules():
    """The 108-test suite accumulates jitted executables + their
    workspaces until a mid-suite compile segfaults (host memory
    limit).  Dropping the in-memory caches per module keeps RSS
    bounded; the machine-keyed persistent cache makes any re-trace
    cheap."""
    yield
    jax.clear_caches()
