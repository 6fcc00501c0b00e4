"""Loop-closure-under-drift exercise: an out-and-back run through a
long hall with a 3% gyro scale-factor error (unobservable by bias
estimation).  The outbound map is built from drifted poses; on
return, BTC loop closures measure the accumulated drift, the
pose-graph optimizer runs, and the corrected trajectory must beat
raw odometry.

Run: python scripts/demo_drift_pgo.py  (CPU, a few minutes)
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import sys as _sys
_sys.path.insert(0, "/root/repo")
from voxelslam_tpu.utils.cachedir import cpu_cache_dir
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np

from voxelslam_tpu.core import synthetic
from voxelslam_tpu.core.config import (
    Config, GeneralCfg, LocalBACfg, LoopCfg, OdometryCfg, Shapes,
)
from voxelslam_tpu.slam import VoxelSLAM


def main(n_scans=400, seed=7):
    # one-way circuit around a ring corridor: the central block
    # occludes the far side, so the map can only anchor locally and
    # the 3% gyro scale error accumulates into real drift until the
    # lap closes
    lap_s = 30.0
    f = 1.0 / lap_s
    R = 12.5
    traj = synthetic.Trajectory(
        amp=np.array([R, R, 0.25]),
        freq=np.array([f, f, 0.13]),
        phase=np.array([0.0, -np.pi / 2, 0.0]),
        yaw_amp=0.2, yaw_freq=0.11,
        yaw_rate=2 * np.pi * f,  # heading follows the tangent
        ramp=1.5, t_start=1.0,
    )
    world = synthetic.make_ring(radius=R, corridor=9.0, height=4.5,
                                n_boxes=26, n_poles=44, seed=3)
    dirs = synthetic.lidar_dirs(n_lines=24, n_cols=96, fov_v=55.0,
                                fov_h=140.0)
    data = synthetic.simulate(
        n_scans=n_scans, traj=traj, dirs=dirs, t0=0.5, seed=seed,
        world=world,
        gyr_noise=1e-3, acc_noise=1e-2,
        gyr_scale=1.01, range_scale=1.022,
    )

    cfg = Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(
            cov_gyr=0.01, cov_acc=0.1, down_size=0.25, voxel_size=1.0,
            min_eigen_value=0.01, init_span_bound=4.0,
            evict_dist=35.0,  # mid-term map forgets the lap start -> real
            #                   drift at closure; keyframe DB persists
        ),
        local_ba=LocalBACfg(win_size=5),
        loop=LoopCfg(icp_eigval=3.0, curr_halt=2),
        shapes=Shapes(max_raw_points=4096, max_points=2048, max_imu=32,
                      hash_capacity=1 << 15, max_ba_voxels=1024),
    )
    slam = VoxelSLAM(cfg)
    slam.loop.p = slam.loop.p._replace(
        line_filter_enable=False, voxel_init_num=5
    )
    slam.loop.sp = slam.loop.sp._replace(skip_near_num=4)

    errs = []
    for i, sc in enumerate(data.scans):
        r = slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                              data.imu_t, data.imu_gyr, data.imu_acc)
        if r is not None:
            j = int(np.argmin(np.abs(data.gt_t - r.t)))
            e = np.linalg.norm(r.p - data.gt_p[j])
            errs.append(e)
            if i % 20 == 0:
                print(f"scan {i:3d} p_err={e:.3f} "
                      f"kfs={len(slam.loop.keyframes)}"
                      f" loops={slam.loop.n_loops_found}"
                      f" edges={len(slam.loop.loop_edges)}"
                      f" drift={getattr(slam.loop, 'last_drift', 0):.2f}"
                      f" pgo={slam.loop.n_optimizations}")
    slam.finish()
    ts, Rs, ps = slam.trajectory()
    fin = []
    for i in range(len(ts)):
        j = int(np.argmin(np.abs(data.gt_t - ts[i])))
        fin.append(np.linalg.norm(ps[i] - data.gt_p[j]))
    fin = np.asarray(fin)
    odo = np.sqrt(np.mean(np.array(errs) ** 2))
    post = np.sqrt(np.mean(fin ** 2))
    print(f"\nkeyframes={len(slam.loop.keyframes)} "
          f"loops_found={slam.loop.n_loops_found} "
          f"pgo_runs={slam.loop.n_optimizations}")
    print(f"odometry ATE rmse={odo:.3f} max={max(errs):.3f}")
    print(f"final    ATE rmse={post:.3f} max={fin.max():.3f}")
    return slam, odo, post


if __name__ == "__main__":
    main()
