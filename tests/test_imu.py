"""IMU propagation/deskew vs synthetic ground truth; preintegration
residual/Jacobian vs numerical integration and finite differences
(the reference has no tests — SURVEY.md §4 mandates these)."""

import numpy as np
import jax
import jax.numpy as jnp

from voxelslam_tpu.core import so3, state, synthetic
from voxelslam_tpu.imu import propagation as prop
from voxelslam_tpu.imu import preintegration as pre


def _synth(n_scans=3, **kw):
    return synthetic.simulate(n_scans=n_scans, seed=3, **kw)


def _gt_state(data, traj, t, dtype=jnp.float32):
    x = state.identity()
    return x._replace(
        t=jnp.asarray(t, dtype),
        R=jnp.asarray(traj.rot(t), dtype),
        p=jnp.asarray(traj.pos(t), dtype),
        v=jnp.asarray(traj.vel(t), dtype),
        g=jnp.asarray(data.gravity, dtype),
    )


class TestPropagation:
    def test_forward_propagation_matches_truth(self):
        traj = synthetic.Trajectory()
        data = _synth()
        sc = data.scans[1]
        noise = prop.noise_from_cfg(0.1, 0.1, 1e-4, 1e-4)
        x0 = _gt_state(data, traj, data.scans[0].t_end)

        dt, gyr, acc, offt, valid, dt_ext = prop.pack_imu_intervals(
            data.imu_t, data.imu_gyr, data.imu_acc,
            data.scans[0].t_end, sc.t_begin, sc.t_end, 64,
        )
        imus = prop.ImuBatch(*map(jnp.asarray, (dt, gyr, acc, offt, valid)))
        x1, poses = prop.propagate(
            x0, imus, noise, jnp.float32(dt_ext), jnp.float32(1.0),
            jnp.float32(sc.t_end),
        )
        np.testing.assert_allclose(np.asarray(x1.p), traj.pos(sc.t_end), atol=2e-3)
        np.testing.assert_allclose(np.asarray(x1.v), traj.vel(sc.t_end), atol=2e-3)
        np.testing.assert_allclose(np.asarray(x1.R), traj.rot(sc.t_end), atol=2e-3)
        # covariance grows and stays symmetric PSD-ish
        c = np.asarray(x1.cov)
        assert (np.diag(c)[:9] > np.diag(np.asarray(x0.cov))[:9]).all()
        np.testing.assert_allclose(c, c.T, atol=1e-8)

    def test_backward_propagation_inverts_forward(self):
        """propagate_backward from the forward result must reproduce
        the forward interval-start pose log (it is the exact inverse
        recurrence) — the dynamic-init re-deskew anchor
        (Initialization::motion_blur, voxelslam.cpp:488-561)."""
        traj = synthetic.Trajectory(
            yaw_amp=1.2, yaw_freq=0.4, amp=np.array([2.0, 1.5, 0.5])
        )
        data = _synth(traj=traj)
        sc = data.scans[1]
        noise = prop.noise_from_cfg(0.1, 0.1, 1e-4, 1e-4)
        x0 = _gt_state(data, traj, data.scans[0].t_end)
        dt, gyr, acc, offt, valid, dt_ext = prop.pack_imu_intervals(
            data.imu_t, data.imu_gyr, data.imu_acc,
            data.scans[0].t_end, sc.t_begin, sc.t_end, 64,
        )
        imus = prop.ImuBatch(*map(jnp.asarray, (dt, gyr, acc, offt, valid)))
        x1, poses_f = prop.propagate(
            x0, imus, noise, jnp.float32(dt_ext), jnp.float32(1.0),
            jnp.float32(sc.t_end),
        )
        poses_b = prop.propagate_backward(
            x1, imus, jnp.float32(dt_ext), jnp.float32(1.0)
        )
        v = valid
        np.testing.assert_allclose(
            np.asarray(poses_b.R)[v], np.asarray(poses_f.R)[v], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(poses_b.p)[v], np.asarray(poses_f.p)[v], atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(poses_b.v)[v], np.asarray(poses_f.v)[v], atol=1e-4
        )

    def test_pack_intervals_imu_dropout(self):
        """Sensor dropout: one (or zero) IMU samples near the span must
        not crash the public process_scan path — a boundary sample is
        synthesized (reference ekf_imu.hpp:125-133)."""
        imu_t = np.asarray([0.02])
        gyr = np.asarray([[0.0, 0.0, 0.1]])
        acc = np.asarray([[0.0, 0.0, 9.8]])
        dt, g, a, offt, valid, dt_ext = prop.pack_imu_intervals(
            imu_t, gyr, acc, 0.0, 0.0, 0.1, 16
        )
        assert valid.any()
        assert abs(dt[valid].sum() - 0.1) < 1e-6  # covers the span
        np.testing.assert_allclose(g[0], gyr[0])
        import pytest as _pytest
        with _pytest.raises(ValueError):
            prop.pack_imu_intervals(
                np.zeros(0), np.zeros((0, 3)), np.zeros((0, 3)),
                0.0, 0.0, 0.1, 16,
            )

    def test_deskew_recovers_static_world(self):
        traj = synthetic.Trajectory()
        data = _synth()
        sc = data.scans[1]
        noise = prop.noise_from_cfg(0.1, 0.1, 1e-4, 1e-4)
        x0 = _gt_state(data, traj, data.scans[0].t_end)
        dt, gyr, acc, offt, valid, dt_ext = prop.pack_imu_intervals(
            data.imu_t, data.imu_gyr, data.imu_acc,
            data.scans[0].t_end, sc.t_begin, sc.t_end, 64,
        )
        imus = prop.ImuBatch(*map(jnp.asarray, (dt, gyr, acc, offt, valid)))
        x1, poses = prop.propagate(
            x0, imus, noise, jnp.float32(dt_ext), jnp.float32(1.0),
            jnp.float32(sc.t_end),
        )
        K = sc.points.shape[0]
        eye = jnp.eye(3)
        zero = jnp.zeros(3)
        out = prop.deskew(
            jnp.asarray(sc.points, jnp.float32),
            jnp.asarray(sc.offsets, jnp.float32),
            jnp.ones(K, bool), poses, x1, eye, zero,
        )
        # expected: world point from true pose at acquisition time,
        # re-expressed in the scan-end body frame
        exp = np.zeros_like(sc.points)
        R_end, p_end = traj.rot(sc.t_end), traj.pos(sc.t_end)
        for i in range(K):
            tm = sc.t_begin + sc.offsets[i]
            pw = traj.rot(tm) @ sc.points[i] + traj.pos(tm)
            exp[i] = R_end.T @ (pw - p_end)
        np.testing.assert_allclose(np.asarray(out), exp, atol=5e-3)


class TestPreintegration:
    def _make(self, data, i0, i1, bg0=(0.0, 0.0, 0.0), ba0=(0.0, 0.0, 0.0)):
        ts = data.imu_t[i0:i1]
        M = 64
        dt = np.zeros(M, np.float32)
        gyr = np.zeros((M, 3), np.float32)
        acc = np.zeros((M, 3), np.float32)
        valid = np.zeros(M, bool)
        n = len(ts) - 1
        dt[:n] = np.diff(ts)
        gyr[:n] = 0.5 * (data.imu_gyr[i0 + 1:i1] + data.imu_gyr[i0:i1 - 1])
        acc[:n] = 0.5 * (data.imu_acc[i0 + 1:i1] + data.imu_acc[i0:i1 - 1])
        valid[:n] = True
        nm = jnp.diag(jnp.concatenate([jnp.full(3, 0.01), jnp.full(3, 0.01)]))
        nw = jnp.diag(jnp.full(6, 1e-4))
        return pre.integrate(
            jnp.asarray(bg0, jnp.float32), jnp.asarray(ba0, jnp.float32),
            jnp.asarray(dt), jnp.asarray(gyr), jnp.asarray(acc),
            jnp.asarray(valid), nm, nw,
        ), ts[0], ts[-1]

    def test_delta_matches_truth(self):
        """ΔR/Δp/Δv from preintegration == relative motion compensated
        for gravity, for a bias-free noise-free trajectory."""
        traj = synthetic.Trajectory()
        data = _synth()
        p, t0, t1 = self._make(data, 10, 40)
        T = t1 - t0
        R0, p0, v0 = traj.rot(t0), traj.pos(t0), traj.vel(t0)
        g = data.gravity
        dR_true = R0.T @ traj.rot(t1)
        dp_true = R0.T @ (traj.pos(t1) - p0 - v0 * T - 0.5 * g * T * T)
        dv_true = R0.T @ (traj.vel(t1) - v0 - g * T)
        np.testing.assert_allclose(np.asarray(p.R_delta), dR_true, atol=2e-3)
        np.testing.assert_allclose(np.asarray(p.p_delta), dp_true, atol=2e-3)
        np.testing.assert_allclose(np.asarray(p.v_delta), dv_true, atol=2e-3)
        np.testing.assert_allclose(float(p.dtime), T, rtol=1e-5)

    def test_zero_residual_at_truth(self):
        traj = synthetic.Trajectory()
        data = _synth()
        p, t0, t1 = self._make(data, 10, 40)
        x1 = _gt_state(data, traj, t0)
        x2 = _gt_state(data, traj, t1)
        z = jnp.zeros(3)
        rr, chi2, *_ = pre._evaluate_one(p, z, z, x1, x2, True)
        assert np.abs(np.asarray(rr)[:9]).max() < 5e-3

    def test_bias_jacobians_fd(self):
        """First-order bias correction matches re-integration."""
        traj = synthetic.Trajectory()
        data = _synth()
        p0, t0, t1 = self._make(data, 10, 40)
        eps = 1e-3
        for k in range(3):
            db = np.zeros(3); db[k] = eps
            pb, _, _ = self._make(data, 10, 40, bg0=db)
            # ΔR(bg+δ) ≈ ΔR Exp(R_bg δ)  (note: bg0=δ means w' = w − δ)
            pred = np.asarray(p0.R_delta @ so3.exp(p0.R_bg @ jnp.asarray(db, jnp.float32)))
            np.testing.assert_allclose(np.asarray(pb.R_delta), pred, atol=2e-5)
            pred_p = np.asarray(p0.p_delta + p0.p_bg @ jnp.asarray(db, jnp.float32))
            np.testing.assert_allclose(np.asarray(pb.p_delta), pred_p, atol=2e-5)
            pred_v = np.asarray(p0.v_delta + p0.v_bg @ jnp.asarray(db, jnp.float32))
            np.testing.assert_allclose(np.asarray(pb.v_delta), pred_v, atol=2e-5)
            pa, _, _ = self._make(data, 10, 40, ba0=db)
            pred_pa = np.asarray(p0.p_delta + p0.p_ba @ jnp.asarray(db, jnp.float32))
            np.testing.assert_allclose(np.asarray(pa.p_delta), pred_pa, atol=2e-5)
            pred_va = np.asarray(p0.v_delta + p0.v_ba @ jnp.asarray(db, jnp.float32))
            np.testing.assert_allclose(np.asarray(pa.v_delta), pred_va, atol=2e-5)

    def test_state_jacobians_fd(self):
        """Analytic 15x30 Jacobian vs finite differences of the residual."""
        traj = synthetic.Trajectory()
        data = _synth()
        p, t0, t1 = self._make(data, 10, 40)
        rng = np.random.default_rng(12)
        x1 = _gt_state(data, traj, t0)
        x2 = _gt_state(data, traj, t1)
        # perturb away from the optimum so Jacobians are generic
        x1 = state.boxplus(x1, jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32))
        x2 = state.boxplus(x2, jnp.asarray(rng.normal(size=15) * 0.05, jnp.float32))
        z = jnp.zeros(3)

        def resid(d1, d2):
            return pre._evaluate_one(
                p, z, z, state.boxplus(x1, d1), state.boxplus(x2, d2), False
            )[0]

        rr, chi2, jtj, gg, jtj_g, gg_g = pre._evaluate_one(p, z, z, x1, x2, True)
        J_fd = np.zeros((15, 30))
        eps = 1e-3
        for k in range(15):
            d = np.zeros(15, np.float32); d[k] = eps
            J_fd[:, k] = (np.asarray(resid(jnp.asarray(d), jnp.zeros(15))) -
                          np.asarray(resid(jnp.asarray(-d), jnp.zeros(15)))) / (2 * eps)
            J_fd[:, 15 + k] = (np.asarray(resid(jnp.zeros(15), jnp.asarray(d))) -
                               np.asarray(resid(jnp.zeros(15), jnp.asarray(-d)))) / (2 * eps)
        # reconstruct J from jtj/gg is lossy; recompute J directly
        cov_inv = np.linalg.inv(np.asarray(p.cov) + np.eye(15) * 1e-10)
        # jtj = Jᵀ C J with C=cov_inv ⇒ verify via quadratic forms
        JtCJ_fd = J_fd.T @ cov_inv @ J_fd
        scale = max(1.0, np.abs(np.asarray(jtj)).max())
        np.testing.assert_allclose(
            np.asarray(jtj) / scale, JtCJ_fd / scale, atol=2e-2
        )
        gg_fd = J_fd.T @ cov_inv @ np.asarray(rr)
        gscale = max(1.0, np.abs(gg_fd).max())
        np.testing.assert_allclose(
            np.asarray(gg) / gscale, gg_fd / gscale, atol=2e-2
        )

    def test_merge_matches_joint(self):
        traj = synthetic.Trajectory()
        data = _synth()
        pa, t0, tm = self._make(data, 10, 25)
        pb, _, t1 = self._make(data, 24, 40)
        pj, _, _ = self._make(data, 10, 40)
        pm = pre.merge(pa, pb)
        np.testing.assert_allclose(np.asarray(pm.R_delta), np.asarray(pj.R_delta), atol=1e-4)
        np.testing.assert_allclose(np.asarray(pm.p_delta), np.asarray(pj.p_delta), atol=1e-3)
        np.testing.assert_allclose(np.asarray(pm.v_delta), np.asarray(pj.v_delta), atol=1e-3)
        np.testing.assert_allclose(float(pm.dtime), float(pj.dtime), rtol=1e-5)
