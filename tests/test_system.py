"""Full-system tests: VoxelSLAM orchestration (front-end + loop layer
+ global mapping + persistence), IO round trips, HBA window BA."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelslam_tpu.core import so3, synthetic
from voxelslam_tpu.glb import hba
from voxelslam_tpu.io import serialization as ser
from voxelslam_tpu.slam import VoxelSLAM
from test_e2e import small_config


@pytest.fixture(scope="module")
def synth_data():
    traj = synthetic.Trajectory(
        amp=np.array([1.2, 0.9, 0.2]), ramp=1.5, t_start=1.0
    )
    dirs = synthetic.lidar_dirs(n_lines=20, n_cols=80, fov_v=55.0, fov_h=140.0)
    return traj, synthetic.simulate(n_scans=30, traj=traj, dirs=dirs,
                                    t0=0.5, seed=7)


class TestVoxelSLAM:
    def test_full_system(self, synth_data, tmp_path):
        traj, data = synth_data
        slam = VoxelSLAM(small_config())
        slam.run_synthetic(data)
        assert slam.frontend.phase == "STEADY"
        # keyframes formed from marginalized scans
        assert len(slam.loop.keyframes) >= 1
        # finish: HBA + top-down + save
        slam.finish(save_dir=str(tmp_path))
        ts, Rs, ps = slam.trajectory()
        assert len(ts) > 10
        errs = [
            np.linalg.norm(ps[i] - data.gt_p[int(np.argmin(np.abs(data.gt_t - ts[i])))])
            for i in range(len(ts))
        ]
        assert np.isfinite(errs).all()
        assert np.median(errs) < 0.2
        # session saved and reloadable
        sess_dirs = [d for d in os.listdir(tmp_path) if d.startswith("session")]
        dirs = os.listdir(tmp_path)
        assert len(dirs) >= 1
        sps = ser.load_session(os.path.join(tmp_path, dirs[0]))
        assert len(sps) == len(slam.loop.sessions[0])
        assert "pts" in sps[0]

    def test_continuous_bottom_up_gba(self, synth_data, tmp_path):
        """Bottom-up HBA windows run DURING the session (the
        reference's thd_globalmapping background pass), so edges
        accumulate before finish and finish only drains leftovers."""
        traj, data = synth_data
        cfg = small_config()
        slam = VoxelSLAM(cfg)
        # small windows so the short synthetic run produces several
        slam.gmap.hp = slam.gmap.hp._replace(win=3, stride=2)
        slam.run_synthetic(data)
        mid_windows = slam.frontend.telemetry.counters.get("gba_windows", 0)
        mid_edges = len(slam.gmap.edges)
        assert mid_windows >= 1, "no bottom-up window ran during the session"
        assert mid_edges >= 1
        slam.finish()
        # finish added at most the ragged leftovers, not a full re-sweep
        assert len(slam.gmap.edges) >= mid_edges

    def test_loop_correction_preserves_tracking(self, synth_data):
        """Applying a (small) PGO correction mid-run keeps the
        front-end matching its rebuilt map."""
        traj, data = synth_data
        slam = VoxelSLAM(small_config())
        n = len(data.scans)
        for sc in data.scans[: n - 5]:
            slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                              data.imu_t, data.imu_gyr, data.imu_acc)
        assert slam.frontend.phase == "STEADY"
        if not slam.loop.keyframes:
            pytest.skip("no keyframes formed")
        # synthetic correction event: small rigid dx + recent keyframes
        kfs = slam.loop.keyframes[-3:]
        dx_R = np.asarray(so3.exp(jnp.asarray([0, 0, 0.01], jnp.float32)))
        dx_p = np.asarray([0.02, -0.01, 0.0])
        event = dict(
            dx_R=dx_R, dx_p=dx_p,
            kf_clouds=[
                (k.cloud, k.cloud_mask, dx_R @ k.R0, dx_R @ k.p0 + dx_p)
                for k in kfs
            ],
        )
        slam.frontend.apply_loop_correction(event)
        # continue: front-end must keep matching
        for sc in data.scans[n - 5 :]:
            r = slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                                  data.imu_t, data.imu_gyr, data.imu_acc)
        steady = [rr for rr in slam.frontend.records[-4:]]
        assert all(s.match_count > 50 for s in steady)


class TestIO:
    def test_lidar_state_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        sps = []
        for i in range(5):
            R = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3), jnp.float32)))
            sps.append(dict(
                t=float(i) * 0.1, R=R, p=rng.normal(size=3),
                v=rng.normal(size=3), bg=rng.normal(size=3) * 0.01,
                ba=rng.normal(size=3) * 0.01, g=np.asarray([0, 0, -9.8]),
                v6=np.abs(rng.normal(size=6)) + 1e-6,
            ))
        path = str(tmp_path / "alidarState.txt")
        ser.save_lidar_state(path, sps)
        back = ser.load_lidar_state(path)
        assert len(back) == 5
        for a, b in zip(sps, back):
            np.testing.assert_allclose(b["p"], a["p"], atol=1e-5)
            np.testing.assert_allclose(b["R"], a["R"], atol=1e-5)
            np.testing.assert_allclose(b["v"], a["v"], atol=1e-5)
            np.testing.assert_allclose(b["v6"], a["v6"], rtol=1e-4)

    def test_edges_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        R = np.asarray(so3.exp(jnp.asarray(rng.normal(size=3), jnp.float32)))
        edges = [dict(name1="sessA", name2="sessB", id1=3, id2=17,
                      R=R, t=rng.normal(size=3))]
        path = str(tmp_path / "edge.txt")
        ser.save_edges(path, edges)
        back, absent = ser.load_edges(path, ["sessA", "sessB"])
        assert len(back) == 1
        np.testing.assert_allclose(back[0]["R"], R, atol=1e-5)
        # unknown sessions preserved as absent lines
        back2, absent2 = ser.load_edges(path, ["other"], bagname="x")
        assert len(back2) == 0 and len(absent2) == 1

    def test_pcd_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        path = str(tmp_path / "scan.pcd")
        ser.save_pcd(path, pts)
        back = ser.load_pcd(path)
        np.testing.assert_allclose(back, pts, atol=1e-6)


class TestHba:
    def test_window_ba_recovers_poses(self):
        """Keyframe clouds of a shared room from perturbed poses: the
        coarse→fine window BA pulls them back; hessian edges valid."""
        rng = np.random.default_rng(3)
        world = synthetic.make_room(size=(10.0, 8.0, 4.0), n_boxes=6, seed=2)
        W, P = 4, 4096
        areas = 4.0 * np.linalg.norm(world.u, axis=1) * np.linalg.norm(world.v, axis=1)
        counts = np.maximum((P * areas / areas.sum()).astype(int), 5)
        pts_w = []
        m = world.center.shape[0]
        for i in range(m):
            uv = rng.uniform(-1, 1, (counts[i], 2))
            pts_w.append(world.center[i] + uv[:, :1] * world.u[i] + uv[:, 1:] * world.v[i])
        pts_w = np.concatenate(pts_w)[:P]

        R_true = [np.asarray(so3.exp(jnp.asarray(rng.normal(size=3) * 0.1, jnp.float32))) for _ in range(W)]
        p_true = [rng.normal(size=3) * 0.5 for _ in range(W)]
        pts = np.zeros((W, P, 3), np.float32)
        mask = np.zeros((W, P), bool)
        for w in range(W):
            loc = (pts_w - p_true[w]) @ R_true[w]
            k = min(len(loc), P)
            pts[w, :k] = loc[:k]
            mask[w, :k] = True

        R0 = np.stack(R_true).astype(np.float32)
        p0 = np.stack(p_true).astype(np.float32)
        # perturb poses 1.. (pose 0 = gauge)
        Rp = R0.copy(); pp_ = p0.copy()
        for w in range(1, W):
            Rp[w] = R0[w] @ np.asarray(so3.exp(jnp.asarray(rng.normal(size=3) * 0.02, jnp.float32)))
            pp_[w] = p0[w] + rng.normal(size=3) * 0.05

        params = hba.default_params(gba_voxel=2.0, gba_min_eigen=0.1,
                                    odo_voxel=1.0, odo_min_eigen=0.01,
                                    capacity=1 << 13)
        params = params._replace(win=W, max_ba_voxels=512)
        R2, p2, edges, n_fact = hba.window_ba(
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.asarray(Rp), jnp.asarray(pp_), params,
        )
        assert int(n_fact) > 10
        p_err0 = np.linalg.norm(pp_ - p0, axis=1).max()
        p_err1 = np.linalg.norm(np.asarray(p2) - p0, axis=1).max()
        assert p_err1 < 0.6 * p_err0
        assert int(jnp.sum(edges.valid)) >= 1
        assert np.isfinite(np.asarray(edges.v6)[np.asarray(edges.valid)]).all()
