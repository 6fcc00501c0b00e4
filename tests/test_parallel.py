"""Multi-chip sharding: the full steady step jitted over an 8-device
mesh (virtual CPU devices via conftest's
--xla_force_host_platform_device_count=8)."""

import jax
import pytest


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from voxelslam_tpu.parallel import mesh

    mesh.dryrun(8)
