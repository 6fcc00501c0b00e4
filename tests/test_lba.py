"""Eigen-factor BA tests: closed-form gradient/Hessian vs finite
differences (in f64 — SURVEY.md §7 'must match finite differences'),
and LM convergence on synthetic windows."""

import numpy as np
import jax
import jax.numpy as jnp

from voxelslam_tpu.core import cluster, so3, state, synthetic
from voxelslam_tpu.imu import preintegration as pre
from voxelslam_tpu.lba import lidar_factor as lf
from voxelslam_tpu.lba import optimizer as opt


def _make_factors(rng, V=3, W=4, dtype=jnp.float64, n_pts=60):
    """Random plane-ish voxels observed from W poses: body clusters are
    the world points pulled back through each pose."""
    centers = rng.uniform(-3, 3, size=(V, 3))
    R_true = np.stack([np.asarray(so3.exp(jnp.asarray(rng.normal(size=3) * 0.3, dtype))) for _ in range(W)])
    p_true = rng.uniform(-1, 1, size=(W, 3))

    win_P = np.zeros((V, W, 6))
    win_v = np.zeros((V, W, 3))
    win_n = np.zeros((V, W))
    fix_P = np.zeros((V, 6))
    fix_v = np.zeros((V, 3))
    fix_n = np.zeros(V)
    for a in range(V):
        nrm = rng.normal(size=3); nrm /= np.linalg.norm(nrm)
        basis = np.linalg.svd(np.eye(3) - np.outer(nrm, nrm))[0][:, :2]
        for w in range(W):
            k = n_pts // W
            pts_w = (centers[a] + rng.uniform(-0.5, 0.5, (k, 2)) @ basis.T
                     + nrm * rng.normal(0, 0.01, (k, 1)))
            # body frame points for pose w
            pts_b = (pts_w - p_true[w]) @ R_true[w]
            c = cluster.from_points(jnp.asarray(pts_b, dtype))
            win_P[a, w] = np.asarray(c.P)
            win_v[a, w] = np.asarray(c.v)
            win_n[a, w] = float(c.n)
        # a few fixed points (center-relative world)
        pts_f = (centers[a] + rng.uniform(-0.5, 0.5, (5, 2)) @ basis.T
                 + nrm * rng.normal(0, 0.01, (5, 1))) - centers[a]
        cf = cluster.from_points(jnp.asarray(pts_f, dtype))
        fix_P[a] = np.asarray(cf.P)
        fix_v[a] = np.asarray(cf.v)
        fix_n[a] = float(cf.n)

    factors = lf.LidarFactors(
        valid=jnp.ones(V, bool),
        win_P=jnp.asarray(win_P, dtype),
        win_v=jnp.asarray(win_v, dtype),
        win_n=jnp.asarray(win_n, dtype),
        fix_P=jnp.asarray(fix_P, dtype),
        fix_v=jnp.asarray(fix_v, dtype),
        fix_n=jnp.asarray(fix_n, dtype),
        center=jnp.asarray(centers, dtype),
        coe=jnp.ones(V, dtype),
        slot=jnp.zeros(V, jnp.int32),
    )
    return factors, jnp.asarray(R_true, dtype), jnp.asarray(p_true, dtype)


class TestEigenFactor:
    def test_residual_matches_direct(self):
        with jax.enable_x64(True):
            rng = np.random.default_rng(0)
            factors, R, p = _make_factors(rng)
            res, cache = lf.evaluate_residual(factors, R, p)
            # direct: merge points per voxel, eigendecompose
            V, W = factors.win_n.shape
            total = 0.0
            for a in range(V):
                P = np.array(cluster.unpack_sym(factors.fix_P[a]))
                v = np.array(factors.fix_v[a])
                n = float(factors.fix_n[a])
                for w in range(W):
                    cw = cluster.Cluster(
                        factors.win_P[a, w], factors.win_v[a, w], factors.win_n[a, w]
                    )
                    t = np.asarray(p[w]) - np.asarray(factors.center[a])
                    ct = cluster.transform(cw, R[w], jnp.asarray(t))
                    P += np.asarray(cluster.unpack_sym(ct.P))
                    v += np.asarray(ct.v)
                    n += float(ct.n)
                S = P / n - np.outer(v / n, v / n)
                total += np.linalg.eigvalsh(S)[0]
            np.testing.assert_allclose(float(res), total, rtol=1e-9)

    def test_grad_hess_vs_fd(self):
        """The analytic gradient and exact Hessian must match central
        finite differences of Σ λ0 to near machine precision in f64."""
        with jax.enable_x64(True):
            rng = np.random.default_rng(1)
            factors, R0, p0 = _make_factors(rng)
            W = R0.shape[0]

            def cost(dx):
                dx = dx.reshape(W, 6)
                R = R0 @ so3.exp(dx[:, 0:3])
                p = p0 + dx[:, 3:6]
                res, _ = lf.evaluate_residual(factors, R, p)
                return res

            _, cache = lf.evaluate_residual(factors, R0, p0)
            res, grad, H = lf.evaluate_hess(factors, cache, R0, p0)
            n = W * 6
            eps = 1e-5
            g_fd = np.zeros(n)
            for k in range(n):
                d = np.zeros(n); d[k] = eps
                g_fd[k] = (float(cost(jnp.asarray(d))) - float(cost(jnp.asarray(-d)))) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(grad).reshape(n), g_fd, rtol=1e-4, atol=1e-7
            )
            H_fd = np.zeros((n, n))
            for k in range(n):
                d = np.zeros(n); d[k] = eps
                gp = np.asarray(jax.grad(lambda dd: cost(dd))(jnp.asarray(d)))
                gm = np.asarray(jax.grad(lambda dd: cost(dd))(jnp.asarray(-d)))
                H_fd[:, k] = (gp - gm) / (2 * eps)
            H_dense = np.asarray(H).transpose(0, 2, 1, 3).reshape(n, n)
            scale = np.abs(H_fd).max()
            np.testing.assert_allclose(
                H_dense / scale, H_fd / scale, atol=5e-5
            )

    def test_lidar_ba_recovers_poses(self):
        """Perturbed window poses re-converge to the ground truth
        (gauge anchored at pose 0)."""
        with jax.enable_x64(True):
            rng = np.random.default_rng(2)
            factors, R0, p0 = _make_factors(rng, V=8, W=4, n_pts=200)
            xs = state.identity(jnp.float64)
            xs = jax.tree.map(lambda a: jnp.broadcast_to(a, (4,) + a.shape), xs)
            # perturb all but the first pose
            dR = [np.zeros(3)] + [rng.normal(size=3) * 0.03 for _ in range(3)]
            dp = [np.zeros(3)] + [rng.normal(size=3) * 0.05 for _ in range(3)]
            R_pert = R0 @ so3.exp(jnp.asarray(np.stack(dR)))
            p_pert = p0 + jnp.asarray(np.stack(dp))
            xs = xs._replace(R=R_pert, p=p_pert)
            result = opt.lidar_ba(xs, factors, max_iter=10)
            assert float(result.resid1) < float(result.resid0) * 0.2
            np.testing.assert_allclose(
                np.asarray(result.xs.p), np.asarray(p0), atol=5e-3
            )
            dR_fin = so3.log(jnp.swapaxes(R0, -1, -2) @ result.xs.R)
            assert np.abs(np.asarray(dR_fin)).max() < 5e-3


class TestLIBA:
    def test_li_ba_converges(self):
        """LiDAR+IMU window: perturbed states recover; gravity variant
        also refines g."""
        with jax.enable_x64(True):
            rng = np.random.default_rng(3)
            W = 4
            factors, R0, p0 = _make_factors(rng, V=8, W=W, n_pts=200)
            traj = synthetic.Trajectory()
            data = synthetic.simulate(n_scans=W, seed=4)
            # build preintegrations between scan ends
            pres = []
            g_w = data.gravity
            ts = [data.scans[i].t_end for i in range(W)]
            for i in range(W - 1):
                i0 = int(np.searchsorted(data.imu_t, ts[i]))
                i1 = int(np.searchsorted(data.imu_t, ts[i + 1])) + 1
                tt = data.imu_t[i0:i1]
                M = 32
                dt = np.zeros(M); gy = np.zeros((M, 3)); ac = np.zeros((M, 3))
                vd = np.zeros(M, bool)
                nn = len(tt) - 1
                dt[:nn] = np.diff(tt)
                gy[:nn] = 0.5 * (data.imu_gyr[i0 + 1:i1] + data.imu_gyr[i0:i1 - 1])
                ac[:nn] = 0.5 * (data.imu_acc[i0 + 1:i1] + data.imu_acc[i0:i1 - 1])
                vd[:nn] = True
                nm = jnp.diag(jnp.concatenate([jnp.full(3, 1e-2), jnp.full(3, 1e-2)]))
                nw = jnp.diag(jnp.full(6, 1e-4))
                pres.append(pre.integrate(
                    jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
                    jnp.asarray(dt), jnp.asarray(gy), jnp.asarray(ac),
                    jnp.asarray(vd), nm, nw,
                ))
            pres = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)

            # ground-truth-consistent states, but lidar factors use their
            # own (R0, p0): rebuild lidar factors from the trajectory poses
            R_traj = jnp.asarray(np.stack([traj.rot(t) for t in ts]))
            p_traj = jnp.asarray(np.stack([traj.pos(t) for t in ts]))
            factors, _, _ = _make_factors_at(rng, R_traj, p_traj)

            xs = state.identity(jnp.float64)
            xs = jax.tree.map(lambda a: jnp.broadcast_to(a, (W,) + a.shape), xs)
            xs = xs._replace(
                R=R_traj, p=p_traj,
                v=jnp.asarray(np.stack([traj.vel(t) for t in ts])),
                g=jnp.broadcast_to(jnp.asarray(g_w), (W, 3)),
            )
            # perturb states 1.. (keep pose 0 as gauge)
            pert = np.zeros((W, 15))
            pert[1:, :9] = rng.normal(size=(W - 1, 9)) * 0.02
            xs_pert = xs._replace(
                R=xs.R @ so3.exp(jnp.asarray(pert[:, 0:3])),
                p=xs.p + jnp.asarray(pert[:, 3:6]),
                v=xs.v + jnp.asarray(pert[:, 6:9]),
            )
            result = opt.li_ba(xs_pert, factors, pres, imu_coef=1e-4,
                               max_iter=8)
            assert float(result.resid1) < float(result.resid0)
            np.testing.assert_allclose(
                np.asarray(result.xs.p), np.asarray(xs.p), atol=2e-2
            )
            # gravity variant runs and returns finite results
            res_g = opt.li_ba(xs_pert, factors, pres, imu_coef=1e-4,
                              max_iter=5, with_gravity=True)
            assert np.isfinite(float(res_g.resid1))
            assert np.isfinite(np.asarray(res_g.xs.g)).all()


def _make_factors_at(rng, R, p, V=8, dtype=jnp.float64, n_pts=200):
    """Same as _make_factors but with given poses."""
    W = R.shape[0]
    centers = rng.uniform(-3, 3, size=(V, 3))
    win_P = np.zeros((V, W, 6)); win_v = np.zeros((V, W, 3)); win_n = np.zeros((V, W))
    for a in range(V):
        nrm = rng.normal(size=3); nrm /= np.linalg.norm(nrm)
        basis = np.linalg.svd(np.eye(3) - np.outer(nrm, nrm))[0][:, :2]
        for w in range(W):
            k = n_pts // W
            pts_w = (centers[a] + rng.uniform(-0.5, 0.5, (k, 2)) @ basis.T
                     + nrm * rng.normal(0, 0.01, (k, 1)))
            pts_b = (pts_w - np.asarray(p[w])) @ np.asarray(R[w])
            c = cluster.from_points(jnp.asarray(pts_b, dtype))
            win_P[a, w] = np.asarray(c.P); win_v[a, w] = np.asarray(c.v)
            win_n[a, w] = float(c.n)
    factors = lf.LidarFactors(
        valid=jnp.ones(V, bool),
        win_P=jnp.asarray(win_P, dtype),
        win_v=jnp.asarray(win_v, dtype),
        win_n=jnp.asarray(win_n, dtype),
        fix_P=jnp.zeros((V, 6), dtype),
        fix_v=jnp.zeros((V, 3), dtype),
        fix_n=jnp.zeros(V, dtype),
        center=jnp.asarray(centers, dtype),
        coe=jnp.ones(V, dtype),
        slot=jnp.zeros(V, jnp.int32),
    )
    return factors, R, p
