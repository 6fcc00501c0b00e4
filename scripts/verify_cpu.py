"""CPU end-to-end verification drive (the /verify skill's recipe):
run the full pipeline on a synthetic world through the public
SlamFrontend surface and score ATE against ground truth.

Usage: python scripts/verify_cpu.py [--full]
  --full also drives the complete VoxelSLAM system (loop + HBA) on a
  small revisit world.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from voxelslam_tpu.utils.cachedir import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402

from voxelslam_tpu.core import synthetic  # noqa: E402
from voxelslam_tpu.core.config import (  # noqa: E402
    Config, GeneralCfg, LocalBACfg, OdometryCfg, Shapes,
)
from voxelslam_tpu.slam import SlamFrontend  # noqa: E402


def _ate(ts, ps, gt_t, gt_p):
    errs = []
    for i in range(len(ts)):
        j = int(np.argmin(np.abs(gt_t - ts[i])))
        errs.append(np.linalg.norm(ps[i] - gt_p[j]))
    return float(np.sqrt(np.mean(np.array(errs) ** 2)))


def main():
    cfg = Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(cov_gyr=0.01, cov_acc=0.1, down_size=0.25,
                             voxel_size=1.0, min_eigen_value=0.01),
        local_ba=LocalBACfg(win_size=5),
        shapes=Shapes(max_raw_points=2048, max_points=1024, max_imu=32,
                      hash_capacity=1 << 14, max_ba_voxels=512),
    )
    traj = synthetic.Trajectory(amp=np.array([1.2, .9, .2]), ramp=1.5,
                                t_start=1.0)
    data = synthetic.simulate(
        n_scans=20, traj=traj,
        dirs=synthetic.lidar_dirs(20, 80, fov_v=55.0, fov_h=140.0),
        t0=0.5, seed=7,
    )
    fe = SlamFrontend(cfg)
    fe.run_synthetic(data)
    ts, Rs, ps = fe.trajectory()
    ate = _ate(ts, ps, data.gt_t, data.gt_p)
    print(f"frontend: phase={fe.phase} session={fe.session} "
          f"ATE={ate:.4f} m")
    assert fe.phase == "STEADY", "pipeline did not reach STEADY"
    assert fe.session == 0, "unexpected session reset"
    assert ate < 0.03, f"ATE {ate:.4f} m exceeds 0.03 m"

    if "--full" in sys.argv:
        from voxelslam_tpu.core.config import LoopCfg
        from voxelslam_tpu.slam import VoxelSLAM
        import dataclasses

        cfgf = dataclasses.replace(cfg, loop=LoopCfg(icp_eigval=3.0,
                                                     curr_halt=2))
        slam = VoxelSLAM(cfgf)
        slam.run_synthetic(data)
        slam.finish()
        ts, _, ps = slam.trajectory()
        atef = _ate(ts, ps, data.gt_t, data.gt_p)
        print(f"full system: ATE={atef:.4f} m "
              f"loops={slam.loop.n_loops_found}")
        assert atef < 0.06, f"full-system ATE {atef:.4f} m"
    print("VERIFY OK")


if __name__ == "__main__":
    main()
