"""Run ONLY the bench's full-system (ring) section with per-scan wall
logging to localize untimed host/device cost (try4: 250 ms/scan wall
vs ~33 ms/scan across all telemetry stages)."""

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    sys.path.insert(0, "/root/repo")
    import bench as B

    out = {}

    # monkeypatch the timed loop with a chunk logger
    orig = B._full_system

    import dataclasses
    import pickle

    from voxelslam_tpu.core.config import LoopCfg
    from voxelslam_tpu.slam import VoxelSLAM
    from voxelslam_tpu.utils.telemetry import Telemetry

    with open("/tmp/bench_ring_n520.pkl", "rb") as f:
        data = pickle.load(f)
    cfg = B._room_cfg()
    cfg = dataclasses.replace(
        cfg,
        loop=LoopCfg(icp_eigval=3.0, curr_halt=2),
        odometry=dataclasses.replace(cfg.odometry, evict_dist=200.0),
    )
    slam = VoxelSLAM(cfg)
    warm = cfg.local_ba.win_size + 1 + 2 * cfg.shapes.scan_batch
    t0 = time.time()
    for sc in data.scans[:warm]:
        slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                          data.imu_t, data.imu_gyr, data.imu_acc)
    slam.gmap.warmup()
    log(f"warmup {time.time() - t0:.1f}s phase={slam.frontend.phase}")
    slam.frontend.telemetry = Telemetry()

    timed = data.scans[warm:]
    t0 = time.time()
    tc = time.time()
    for i, sc in enumerate(timed):
        slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                          data.imu_t, data.imu_gyr, data.imu_acc)
        if (i + 1) % 32 == 0:
            log(f"  scans {i-30:3d}-{i+1:3d}: "
                f"{(time.time()-tc)*1000/32:7.1f} ms/scan  "
                f"kf={len(slam.loop.keyframes)}")
            tc = time.time()
    slam.frontend.flush()
    slam._drain()
    dt = time.time() - t0
    log(f"[full] {len(timed)} scans in {dt:.1f}s -> "
        f"{len(timed)/dt:.2f} scans/s; loops={slam.loop.n_loops_found}")
    log(slam.frontend.telemetry.report())


if __name__ == "__main__":
    main()
