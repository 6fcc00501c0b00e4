import os, sys
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
sys.path.insert(0, "/root/repo/tests")
from test_e2e import small_config
from voxelslam_tpu.core import synthetic
from voxelslam_tpu.slam import SlamFrontend
import voxelslam_tpu.odom.pipeline as pl

traj = synthetic.Trajectory(amp=np.array([1.2, 0.9, 0.2]), ramp=1.5, t_start=1.0)
dirs = synthetic.lidar_dirs(n_lines=20, n_cols=80, fov_v=55.0, fov_h=140.0)
data = synthetic.simulate(n_scans=25, traj=traj, dirs=dirs, t0=0.5, seed=7)

fe = SlamFrontend(small_config())
for si, sc in enumerate(data.scans):
    r = fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    x = fe.carry.x
    if r is None:
        print(f"{si:3d} phase={fe.phase} (imu init)")
        continue
    # the resolved record is the PREVIOUS scan's output (deferred
    # async readback) — pair GT by the record's own timestamp;
    # carry.x reflects the CURRENT scan's dispatch
    gt_p = traj.pos(r.t)
    gt_v = traj.vel(sc.t_end)
    import numpy as _np
    g = _np.asarray(x.g)
    print(
        f"{si:3d} {fe.phase:6s} m={r.match_count:4d} "
        f"p_err={np.linalg.norm(r.p-gt_p):.4f} "
        f"v_err={np.linalg.norm(_np.asarray(x.v)-gt_v):.4f} "
        f"g=({g[0]:+.3f},{g[1]:+.3f},{g[2]:+.3f}) |g|={np.linalg.norm(g):.4f} "
        f"bg={_np.linalg.norm(_np.asarray(x.bg)):.4f} ba={_np.linalg.norm(_np.asarray(x.ba)):.4f} "
        f"deg={r.degenerate}"
    )
