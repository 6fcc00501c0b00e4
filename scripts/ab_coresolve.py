"""A/B the keyframe/HBA co-resolve (outputs riding the steady-batch
device_get) against the old per-keyframe device_get, in ONE process
on the bench ring full system.

Usage: python scripts/ab_coresolve.py [on,off|off,on]

Both variants run identical device programs at identical shapes (so
in-process compile caches are shared); only the host-side resolve
plumbing differs:
  off: co_resolver disconnected, kf_inflight=3  (pre-co-resolve code path)
  on : as shipped (co-resolve, kf_inflight=8)

Run one TPU process at a time; compare WITHIN this process only
(CLAUDE.md: tunnel timing varies ~2x between runs)."""
import dataclasses
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from bench import _ate, _dataset, log
from voxelslam_tpu.core import synthetic  # noqa: E402
from voxelslam_tpu.core.config import LoopCfg  # noqa: E402
from voxelslam_tpu.slam import VoxelSLAM  # noqa: E402
from voxelslam_tpu.utils.telemetry import Telemetry  # noqa: E402


def _ring_cfg():
    from bench import _room_cfg

    cfg = _room_cfg()
    return dataclasses.replace(
        cfg,
        loop=LoopCfg(icp_eigval=3.0, curr_halt=2),
        shapes=dataclasses.replace(cfg.shapes, scan_batch=16,
                                   free_startup_programs=1),
        odometry=dataclasses.replace(cfg.odometry, evict_dist=200.0),
        general=dataclasses.replace(
            cfg.general, spill_dir=tempfile.mkdtemp(prefix="vslam_ab_")
        ),
    )


def _make(n):
    R_ring, f = 18.0, 0.03
    traj = synthetic.Trajectory(
        amp=np.array([R_ring, R_ring, 0.2]),
        freq=np.array([f, f, 0.23]),
        phase=np.array([0.0, -np.pi / 2, 0.0]),
        yaw_amp=0.0, yaw_rate=2 * np.pi * f, pitch_amp=0.05,
        ramp=1.5, t_start=1.0,
    )
    world = synthetic.make_ring(radius=R_ring, corridor=9.0, seed=3)
    dirs = synthetic.lidar_dirs(n_lines=96, n_cols=300, fov_v=60.0,
                                fov_h=160.0)
    return synthetic.simulate(
        n_scans=n, traj=traj, world=world, dirs=dirs, t0=0.5, seed=11,
        gyr_noise=2e-3, acc_noise=2e-2, gyr_scale=1.02,
    )


def run_variant(mode: str, data, cfg):
    slam = VoxelSLAM(cfg)
    if mode == "off":
        slam.frontend.co_resolver = None
        slam.loop.fe_seq = None
        slam.gmap.fe_seq = None
        slam.loop.kf_inflight = 3
    warm = cfg.local_ba.win_size + 1 + 2 * cfg.shapes.scan_batch
    for sc in data.scans[:warm]:
        slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                          data.imu_t, data.imu_gyr, data.imu_acc)
    slam.frontend.flush()
    slam._drain()
    slam.gmap.warmup(submap=(cfg.gba.max_submaps, cfg.gba.submap_points))
    slam.frontend.telemetry = Telemetry()
    slam.loop.telemetry = slam.frontend.telemetry
    timed = data.scans[warm:]
    t0 = time.time()
    for sc in timed:
        slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                          data.imu_t, data.imu_gyr, data.imu_acc)
    slam.frontend.flush()
    slam._drain()
    dt = time.time() - t0
    ts, _, ps = slam.trajectory()
    ate = _ate(ts, ps, data.gt_t, data.gt_p)
    tel = slam.frontend.telemetry
    log(f"--- variant {mode}: {len(timed)} scans in {dt:.1f}s -> "
        f"{len(timed) / dt:.2f} scans/s; ATE {ate:.4f}; "
        f"loops={slam.loop.n_loops_found}")
    log(tel.report())
    row = {"mode": mode, "sps": round(len(timed) / dt, 2),
           "ate": round(ate, 4)}
    for k in ("pack", "dispatch", "resolve", "evict", "loop",
              "gba_window", "kf_resolve", "fe_step"):
        st = tel.stages.get(k)
        if st is not None and st.count:
            row[k] = round(1000.0 * st.mean, 2)
    row["kf_coresolved"] = tel.counters.get("kf_coresolved", 0)
    return row


def main():
    order = (sys.argv[1] if len(sys.argv) > 1 else "off,on").split(",")
    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")
    data = _dataset("ring", 520, _make)
    cfg = _ring_cfg()
    rows = [run_variant(m, data, cfg) for m in order]
    for r in rows:
        log(r)
    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
