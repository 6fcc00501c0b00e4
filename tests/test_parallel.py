"""Multi-chip sharding: the full steady step jitted over an 8-device
mesh (virtual CPU devices via conftest's
--xla_force_host_platform_device_count=8), asserting the sharded
result equals the single-device result — a correctness test of the
psum reductions the shardings induce (SURVEY §2.14; reference
fork-join Hessian pools, voxel_map.hpp:306-335)."""

import jax
import pytest


def test_dryrun_multichip_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from voxelslam_tpu.parallel import mesh

    mesh.dryrun(8, check_vs_single=True)


def test_graft_entry_dryrun_subprocess():
    """The driver-facing entry point must work even when the axon TPU
    plugin is registered: it re-execs a CPU-pinned subprocess."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(4)
