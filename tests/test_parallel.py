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


def test_sharded_ba_hessian_matches_single_device():
    """Voxel-sharded eigen-factor Hessian assembly (shard_map + psum
    over ICI, reference fork-join pools voxel_map.hpp:306-335) must
    equal the single-device evaluation."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import jax.numpy as jnp
    import numpy as np

    from voxelslam_tpu.core import state
    from voxelslam_tpu.core.cluster import Cluster
    from voxelslam_tpu.core import cluster as cl
    from voxelslam_tpu.lba import lidar_factor as lf
    from voxelslam_tpu.parallel import mesh

    rng = np.random.default_rng(0)
    V, W = 64, 4
    # synthetic plane-voxel factors: points near planes per voxel
    win_P = np.zeros((V, W, 6), np.float32)
    win_v = np.zeros((V, W, 3), np.float32)
    win_n = np.zeros((V, W), np.float32)
    for v in range(V):
        for w in range(W):
            k = 12
            q = rng.uniform(-0.5, 0.5, (k, 3)).astype(np.float32)
            q[:, 2] *= 0.02
            o = np.einsum("ki,kj->ij", q, q)
            win_P[v, w] = o[np.triu_indices(3)]  # (00,01,02,11,12,22)
            win_v[v, w] = q.sum(0)
            win_n[v, w] = k
    factors = lf.LidarFactors(
        valid=jnp.ones((V,), bool),
        win_P=jnp.asarray(win_P), win_v=jnp.asarray(win_v),
        win_n=jnp.asarray(win_n),
        fix_P=jnp.zeros((V, 6)), fix_v=jnp.zeros((V, 3)),
        fix_n=jnp.zeros((V,)),
        center=jnp.asarray(rng.uniform(-5, 5, (V, 3)), jnp.float32),
        coe=jnp.ones((V,)),
        slot=jnp.arange(V, dtype=jnp.int32),
    )
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (W, 3, 3))
    p = jnp.asarray(rng.normal(size=(W, 3)) * 0.1, jnp.float32)

    _, cache = lf.evaluate_residual(factors, R, p)
    r1, g1, h1 = lf.evaluate_hess(factors, cache, R, p)

    m = mesh.make_mesh(8)
    r8, g8, h8 = mesh.sharded_lidar_hessian(factors, R, p, m)
    # f32 reduction order differs (per-shard partials + psum vs one
    # flat sum); tolerances sized for that, not for algorithmic drift
    np.testing.assert_allclose(float(r8), float(r1), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h8), np.asarray(h1),
                               rtol=1e-3, atol=1e-4)


def test_graft_entry_dryrun_subprocess():
    """The driver-facing entry point must work even when the axon TPU
    plugin is registered: it re-execs a CPU-pinned subprocess."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(4)
