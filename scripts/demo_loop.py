"""Loop-closure end-to-end demo: a long trajectory that revisits its
start; odometry drifts (noisy IMU), the BTC search fires on a revisit
keyframe, the pose graph corrects the trajectory, and the front-end
map is rebuilt.  Prints per-scan errors and the loop events.

Run: python scripts/demo_loop.py  (CPU, a few minutes)
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


def main(n_scans=140, seed=7):
    # circular revisit trajectory (yaw sweeps a full turn)
    traj = synthetic.Trajectory(
        amp=np.array([2.5, 2.0, 0.25]),
        freq=np.array([0.05, 0.05, 0.1]),
        yaw_amp=3.14, yaw_freq=0.035,
        ramp=1.5, t_start=1.0,
    )
    world = synthetic.make_room(size=(16.0, 12.0, 5.0), n_boxes=8,
                                n_poles=25, seed=3)
    dirs = synthetic.lidar_dirs(n_lines=24, n_cols=96, fov_v=55.0,
                                fov_h=140.0)
    data = synthetic.simulate(
        n_scans=n_scans, traj=traj, dirs=dirs, t0=0.5, seed=seed,
        world=world,
        gyr_noise=2e-3, acc_noise=2e-2,
        gyr_scale=1.03,  # 3% gyro scale error: heading drift the
        #                  filter cannot estimate away -> real
        #                  position drift at revisit, PGO fires
    )

    cfg = Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(
            cov_gyr=0.01, cov_acc=0.1, down_size=0.25, voxel_size=1.0,
            min_eigen_value=0.01, init_span_bound=4.0,
        ),
        local_ba=LocalBACfg(win_size=5),
        loop=LoopCfg(icp_eigval=3.0, curr_halt=2),
        shapes=Shapes(max_raw_points=4096, max_points=2048, max_imu=32,
                      hash_capacity=1 << 15, max_ba_voxels=1024),
    )
    slam = VoxelSLAM(cfg)
    # test-scale loop knobs: sparse clouds need looser plane counts
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
                print(f"scan {i:3d} p_err={e:.3f} kfs={len(slam.loop.keyframes)}"
                      f" loops={slam.loop.n_loops_found}"
                      f" pgo={slam.loop.n_optimizations}")
    slam.finish()
    ts, Rs, ps = slam.trajectory()
    fin = []
    for i in range(len(ts)):
        j = int(np.argmin(np.abs(data.gt_t - ts[i])))
        fin.append(np.linalg.norm(ps[i] - data.gt_p[j]))
    fin = np.asarray(fin)
    print(f"\nkeyframes={len(slam.loop.keyframes)} "
          f"loops_found={slam.loop.n_loops_found} "
          f"pgo_runs={slam.loop.n_optimizations}")
    print(f"odometry ATE rmse={np.sqrt(np.mean(np.array(errs)**2)):.3f} "
          f"max={max(errs):.3f}")
    print(f"final    ATE rmse={np.sqrt(np.mean(fin**2)):.3f} "
          f"max={fin.max():.3f}")
    return slam


if __name__ == "__main__":
    main()
