"""free_startup_programs: dropping the FILL/init executables after the
STEADY transition must be TRANSPARENT — a later session reset re-enters
FILL and the programs recompile (persistent cache) instead of crashing
or corrupting state.  Guards the round-5 RSS lever (r4 VERDICT #8:
~3 GB of once-per-phase program arenas)."""

import dataclasses

import numpy as np

from voxelslam_tpu.core import synthetic
from voxelslam_tpu.slam import SlamFrontend
from test_e2e import small_config


def test_reset_after_freed_startup_programs():
    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, shapes=dataclasses.replace(cfg.shapes,
                                        free_startup_programs=1),
    )
    traj = synthetic.Trajectory(
        amp=np.array([1.2, 0.9, 0.2]), ramp=1.5, t_start=1.0,
    )
    dirs = synthetic.lidar_dirs(n_lines=20, n_cols=80, fov_v=55.0,
                                fov_h=140.0)
    data = synthetic.simulate(n_scans=40, traj=traj, dirs=dirs,
                              t0=0.5, seed=7)

    fe = SlamFrontend(cfg)
    for sc in data.scans[:20]:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    fe.flush()
    assert fe.phase == "STEADY"
    assert fe.telemetry.counters.get("startup_programs_freed", 0) >= 1

    # force a mid-run session reset: FILL/init must recompile and the
    # new session must reach STEADY again on the remaining stream
    fe._reset("test: forced reset after program retirement",
              handoff=fe.scan_poses[-1] if fe.scan_poses else None)
    for sc in data.scans[20:]:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    fe.flush()
    assert fe.phase == "STEADY", f"stuck in {fe.phase} after reset"
    assert fe.session == 1
    ts, _, ps = fe.trajectory()
    assert np.isfinite(ps).all()
