"""Long-run capacity stress: a small hash table driven to saturation
over a ring-corridor circuit.  Exercises the pressure valve the
reference implements as idle-time eviction + pool trim
(voxelslam.cpp:1503-1536): overflow must be COUNTED (not silently
dropped), pressure compaction must fire, and the system must keep
producing a sane trajectory — graceful degradation, with telemetry
evidence."""

import numpy as np

from voxelslam_tpu.core import synthetic
from voxelslam_tpu.core.config import (
    Config, GeneralCfg, LocalBACfg, OdometryCfg, Shapes,
)
from voxelslam_tpu.map import voxelmap
from voxelslam_tpu.slam import SlamFrontend


def test_saturation_pressure_valve():
    # a circuit through a ring corridor: travel accumulates, so
    # distance eviction has something to reclaim once pressure hits
    lap_s = 16.0
    f = 1.0 / lap_s
    R_ring = 12.5
    traj = synthetic.Trajectory(
        amp=np.array([R_ring, R_ring, 0.2]),
        freq=np.array([f, f, 0.23]),
        phase=np.array([0.0, -np.pi / 2, 0.0]),
        yaw_amp=0.0,
        yaw_rate=2 * np.pi * f,
        pitch_amp=0.05,
        ramp=1.5,
        t_start=1.0,
    )
    world = synthetic.make_ring(radius=R_ring, corridor=9.0, seed=3)
    n_scans = 200
    data = synthetic.simulate(
        n_scans=n_scans, traj=traj, world=world,
        dirs=synthetic.lidar_dirs(16, 64, fov_v=55.0, fov_h=140.0),
        t0=0.5, seed=11,
    )

    cfg = Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(
            cov_gyr=0.01, cov_acc=0.1, down_size=0.25, voxel_size=1.0,
            min_eigen_value=0.01,
            evict_dist=30.0,  # ~0.4 lap: old corridor is reclaimable
        ),
        local_ba=LocalBACfg(win_size=5),
        shapes=Shapes(
            max_raw_points=1024, max_points=1024, max_imu=32,
            hash_capacity=1 << 10,  # TINY: forces saturation mid-lap
            max_probe=8, max_ba_voxels=512, scan_batch=4,
        ),
    )
    fe = SlamFrontend(cfg)
    for sc in data.scans:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    fe.flush()

    counters = fe.telemetry.counters
    # the table must have been driven into overflow, and the valve
    # must have responded (host consumed StepOutputs.overflow)
    assert counters.get("hash_overflow", 0) > 0, counters
    assert counters.get("pressure_compactions", 0) >= 1, counters
    assert counters.get("evictions", 0) >= 1, counters

    # graceful degradation: table not wedged at 100%, trajectory sane
    load = float(voxelmap.load_factor(fe.carry.vmap.keys))
    assert load < 0.98, f"table wedged at load {load:.2f}"
    ts, Rs, ps = fe.trajectory()
    assert len(ts) > n_scans // 2
    assert np.isfinite(ps).all()
    errs = []
    for i in range(len(ts)):
        j = int(np.argmin(np.abs(data.gt_t - ts[i])))
        errs.append(np.linalg.norm(ps[i] - data.gt_p[j]))
    ate = float(np.sqrt(np.mean(np.asarray(errs) ** 2)))
    # capacity-starved small-config run: bounded drift, not garbage
    assert ate < 2.0, f"ATE {ate:.2f} m under saturation"
