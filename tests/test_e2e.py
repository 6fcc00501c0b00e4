"""End-to-end odometry + local BA on a synthetic world.

The TPU-native replacement for the reference's rosbag-replay
validation (SURVEY.md §4): a known trajectory through a plane world,
full pipeline (IMU init → fill → dynamic init with gravity alignment →
steady odometry/BA), scored as ATE against ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from voxelslam_tpu.core import synthetic
from voxelslam_tpu.core.config import Config, GeneralCfg, LocalBACfg, OdometryCfg, Shapes
from voxelslam_tpu.slam import SlamFrontend


def small_config() -> Config:
    return Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(
            cov_gyr=0.01, cov_acc=0.1, down_size=0.25, voxel_size=1.0,
            min_eigen_value=0.01, init_span_bound=4.0,
        ),
        local_ba=LocalBACfg(win_size=5, plane_eigen_value_thre=(4.0,) * 4),
        shapes=Shapes(
            max_raw_points=2048,
            max_points=1024,
            max_imu=32,
            hash_capacity=1 << 14,
            max_ba_voxels=512,
        ),
    )


@pytest.fixture(scope="module")
def synth_data():
    traj = synthetic.Trajectory(
        amp=np.array([1.2, 0.9, 0.2]),
        ramp=1.5,
        t_start=1.0,
    )
    dirs = synthetic.lidar_dirs(n_lines=20, n_cols=80, fov_v=55.0, fov_h=140.0)
    return traj, synthetic.simulate(
        n_scans=25, traj=traj, dirs=dirs, t0=0.5, seed=7,
    )


class TestEndToEnd:
    def test_trajectory_ate(self, synth_data):
        traj, data = synth_data
        fe = SlamFrontend(small_config())
        fe.run_synthetic(data)
        assert fe.phase == "STEADY", f"pipeline stuck in {fe.phase}"
        assert fe.session == 0, "unexpected session reset"

        ts, Rs, ps = fe.trajectory()
        # compare the steady-state tail (after init convergence)
        errs = []
        for i in range(len(ts)):
            if ts[i] < data.gt_t[0]:
                continue
            j = int(np.argmin(np.abs(data.gt_t - ts[i])))
            errs.append(np.linalg.norm(ps[i] - data.gt_p[j]))
        errs = np.array(errs)
        n_tail = max(len(errs) // 2, 1)
        ate_tail = np.sqrt(np.mean(errs[-n_tail:] ** 2))
        assert np.isfinite(errs).all()
        # coarse LiDAR (1024 rays) + f32: ~1 cm on a room scale
        # (0.06 = 5x headroom over the observed ~0.01 steady-state ATE)
        assert ate_tail < 0.06, f"ATE tail {ate_tail:.3f} m, errs={errs}"

    def test_violent_start(self):
        """Jungle-challenge-style start (reference README.md:150-157):
        fast rotation from the first moving scans (~300 deg/s peak)
        plus gyro/accel biases and noise.  The backward-from-scan-end
        re-deskew in dynamic init (Initialization::motion_blur,
        voxelslam.cpp:488-561) must either converge or reset cleanly —
        here it must converge with a bounded ATE."""
        traj = synthetic.Trajectory(
            amp=np.array([1.0, 0.8, 0.3]),
            yaw_amp=2.0, yaw_freq=0.45, pitch_amp=0.35,
            ramp=0.6, t_start=1.0,
        )
        data = synthetic.simulate(
            n_scans=22, traj=traj,
            dirs=synthetic.lidar_dirs(20, 80, fov_v=55.0, fov_h=140.0),
            gyr_bias=(0.02, -0.015, 0.01), acc_bias=(0.05, -0.03, 0.08),
            gyr_noise=1e-3, acc_noise=1e-2,
            t0=0.5, seed=13,
        )
        # the scenario is genuinely violent: > 200 deg/s body rate
        peak = np.degrees(np.linalg.norm(data.imu_gyr, axis=1).max())
        assert peak > 200.0, f"peak rate only {peak:.0f} deg/s"
        fe = SlamFrontend(small_config())
        fe.run_synthetic(data)
        assert fe.phase == "STEADY", f"stuck in {fe.phase}"
        assert fe.session <= 1, "more than one reset on violent start"
        ts, Rs, ps = fe.trajectory()
        errs = []
        for i in range(len(ts)):
            j = int(np.argmin(np.abs(data.gt_t - ts[i])))
            errs.append(np.linalg.norm(ps[i] - data.gt_p[j]))
        errs = np.array(errs)
        n_tail = max(len(errs) // 2, 1)
        ate_tail = float(np.sqrt(np.mean(errs[-n_tail:] ** 2)))
        assert np.isfinite(errs).all()
        assert ate_tail < 0.08, f"violent-start ATE tail {ate_tail:.3f} m"

    def test_init_failure_retries_same_session(self):
        """A failed INITIALIZATION attempt (plane-span / gravity-norm
        gate) must retry under the SAME session id — the reference
        loops motion_init without a system reset (voxelslam.cpp:
        1618-1634).  Before the fix each failed attempt minted a new
        empty session: a featureless corridor inflated the count by
        ~1 per attempt (24 sessions on the stress corpus) and drowned
        the pose graph in fragments."""
        # two SMALL floor/ceiling tiles: plane spread stays below
        # init_span_bound (4.0) -> the span gate fires on every
        # attempt (the big-floor variant instead passes init and
        # trips the steady degrade bound — a different, legitimately
        # new-session reset)
        world = synthetic.PlaneWorld(
            center=np.array([[0.0, 0, -1.5], [0.0, 0, 2.0]]),
            normal=np.array([[0.0, 0, 1], [0.0, 0, -1]]),
            u=np.array([[1.2, 0, 0], [1.2, 0, 0]]),
            v=np.array([[0.0, 1.2, 0], [0.0, 1.2, 0]]),
        )
        traj = synthetic.Trajectory(
            amp=np.array([0.3, 0.25, 0.05]), ramp=1.5, t_start=1.0
        )
        data = synthetic.simulate(
            n_scans=22, traj=traj, world=world,
            dirs=synthetic.lidar_dirs(20, 80, fov_v=55.0, fov_h=140.0),
            t0=0.5, seed=11,
        )
        fe = SlamFrontend(small_config())
        fe.run_synthetic(data)
        assert fe.phase != "STEADY", "rank-1 world must not pass init"
        assert fe.session == 0, (
            f"init retries minted {fe.session} empty sessions"
        )

    def test_outputs_flow(self, synth_data):
        traj, data = synth_data
        fe = SlamFrontend(small_config())
        fe.run_synthetic(data)
        # ScanPose exports exist for the loop-closure layer
        assert len(fe.scan_poses) > 3
        sp = fe.scan_poses[-1]
        assert np.isfinite(sp["v6"]).all()
        assert (sp["v6"] > 0).all()
        # matches found on every steady scan
        steady = [r for r in fe.records if r.match_count > 0]
        assert len(steady) >= 5


def test_pvec_downsample_flag_e2e(synth_data=None):
    """down_sampling_pvec parity flag: averaged per-point covariances
    (voxel_map.hpp:24-65) keep the pipeline accurate end to end."""
    import dataclasses
    import numpy as np
    from voxelslam_tpu.core import synthetic as syn
    from voxelslam_tpu.slam import SlamFrontend

    traj = syn.Trajectory(amp=np.array([1.2, 0.9, 0.2]), ramp=1.5,
                          t_start=1.0)
    data = syn.simulate(
        n_scans=20, traj=traj,
        dirs=syn.lidar_dirs(20, 80, fov_v=55.0, fov_h=140.0),
        t0=0.5, seed=7,
    )
    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, odometry=dataclasses.replace(cfg.odometry, pvec_downsample=1)
    )
    fe = SlamFrontend(cfg)
    fe.run_synthetic(data)
    assert fe.phase == "STEADY"
    ts, Rs, ps = fe.trajectory()
    errs = []
    for i in range(len(ts)):
        j = int(np.argmin(np.abs(data.gt_t - ts[i])))
        errs.append(np.linalg.norm(ps[i] - data.gt_p[j]))
    errs = np.array(errs)
    n_tail = max(len(errs) // 2, 1)
    ate_tail = np.sqrt(np.mean(errs[-n_tail:] ** 2))
    assert np.isfinite(errs).all()
    assert ate_tail < 0.06, f"pvec-flag ATE tail {ate_tail:.3f} m"
