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

    mesh.dryrun(8, check_vs_single=True, production=False)


@pytest.mark.slow
def test_dryrun_multichip_production_shapes():
    """The driver-facing dryrun at PRODUCTION shapes (n_ds 2048,
    C 2^15, W 10, V 2048 — VERDICT #7), including the in-BA
    voxel-sharded path (li_ba(mesh=...)).

    Runs in a SUBPROCESS (the graft-entry path): in-process after ~70
    suite tests the accumulated executable/array caches push the
    8-device production compile over the host memory limit and the
    process segfaults inside the compile-cache load."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


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


def test_li_ba_with_mesh_matches_single_device():
    """`opt.li_ba(mesh=...)` — the PRODUCTION BA entry point with the
    voxel-sharded factor evaluation — must match the unsharded LM
    solve (same factors, same window, same iterations)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import jax.numpy as jnp
    import numpy as np

    from jax.sharding import NamedSharding, PartitionSpec as P
    from voxelslam_tpu.imu import preintegration as pre
    from voxelslam_tpu.core import state
    from voxelslam_tpu.lba import lidar_factor as lf
    from voxelslam_tpu.lba import optimizer as opt
    from voxelslam_tpu.parallel import mesh

    rng = np.random.default_rng(1)
    V, W = 64, 4
    win_P = np.zeros((V, W, 6), np.float32)
    win_v = np.zeros((V, W, 3), np.float32)
    win_n = np.zeros((V, W), np.float32)
    for v in range(V):
        for w in range(W):
            k = 12
            q = rng.uniform(-0.5, 0.5, (k, 3)).astype(np.float32)
            q[:, 2] *= 0.02
            o = np.einsum("ki,kj->ij", q, q)
            win_P[v, w] = o[np.triu_indices(3)]
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
    x = state.identity(jnp.float32)
    xs = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (W,) + a.shape).copy(), x
    )
    # small pose perturbations so the LM has something to do
    dp = jnp.asarray(rng.normal(size=(W, 3)) * 0.02, jnp.float32)
    xs = xs._replace(p=xs.p + dp)
    pres = pre.identity((W - 1,), jnp.float32)

    ba_1 = opt.li_ba(xs, factors, pres, max_iter=2)
    m = mesh.make_mesh(8)
    rep = NamedSharding(m, P())
    with m:
        factors_s = jax.device_put(
            factors,
            jax.tree.map(lambda _: NamedSharding(m, P("data")), factors),
        )
        xs_s = jax.device_put(xs, jax.tree.map(lambda _: rep, xs))
        pres_s = jax.device_put(pres, jax.tree.map(lambda _: rep, pres))
        ba_s = opt.li_ba(xs_s, factors_s, pres_s, max_iter=2, mesh=m)
        jax.block_until_ready(ba_s.xs.p)
    np.testing.assert_allclose(
        np.asarray(ba_s.xs.p), np.asarray(ba_1.xs.p), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ba_s.xs.R), np.asarray(ba_1.xs.R), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ba_s.hess), np.asarray(ba_1.hess), atol=1e-2, rtol=1e-3
    )
