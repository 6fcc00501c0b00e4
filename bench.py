"""Benchmark: LiDAR scans/sec through the full odometry + local-BA
scan step (the reference's hot loop, voxelslam.cpp:1456-1738) at
production shapes on the available accelerator.

Baseline: the reference runs the same loop in real time on a
multicore CPU against 10 Hz LiDAR bags (BASELINE.md — no published
numeric tables; real-time 10 scans/sec is its demonstrated rate), so
vs_baseline = our_scans_per_sec / 10.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache (TPU compiles of the fused scan step are
    # expensive; cache across runs)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from voxelslam_tpu.core import synthetic
    from voxelslam_tpu.core.config import (
        Config, GeneralCfg, LocalBACfg, OdometryCfg, Shapes,
    )
    from voxelslam_tpu.slam import SlamFrontend

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    # production-ish shapes: dense scan (28.8k rays), 10-scan window.
    # Padded sizes right-sized by scripts/shape_sweep.py (everything
    # is bandwidth-bound, so padding waste is ~linear in time):
    # ds 2048 / V 2048 / C 2^16 keeps ATE while nearly doubling rate;
    # larger worlds bump hash_capacity in their YAML (pressure valve
    # + eviction cover the spill).
    cfg = Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(
            cov_gyr=0.01, cov_acc=0.1, down_size=0.1, voxel_size=1.0,
            min_eigen_value=0.005,
        ),
        local_ba=LocalBACfg(win_size=10, max_iter=2),
        shapes=Shapes(
            # 28.8k-ray scans host-reduce (native voxel_reduce, one
            # representative per down_size cell) to fit 8192 — cuts
            # device deskew/downsample and the tunnel transfer 4x
            max_raw_points=8192,
            max_points=2048,
            max_imu=64,
            # 2^15 holds the scene at ~4% load; ATE 0.0069 after the
            # fill-covariance conditioning fix + reroute-cov removal
            # (capacity sensitivity was numerical, diagnosed + fixed).
            # V=1024 truncates factors (ATE 0.007 -> 0.019); keep 2048.
            hash_capacity=1 << 15,
            max_ba_voxels=2048,
            scan_batch=16,
            # ATE-neutral under the refit growth gate (pipeline.py
            # refit_size note); skipped voxels retry on next touch
            refit_size=1024,
        ),
    )

    log("generating synthetic dataset...")
    import pickle, os
    traj = synthetic.Trajectory(
        amp=np.array([1.5, 1.2, 0.3]), ramp=1.5, t_start=1.0
    )
    dirs = synthetic.lidar_dirs(n_lines=96, n_cols=300, fov_v=60.0,
                                fov_h=160.0)  # 28800 rays, wide FoV
    # warmup: IMU init (1) + fill (win) + enough steady scans to
    # dispatch at least one full batch (compiles the batched steady
    # program before the timed window); timed = whole batches only so
    # no tail scans leak past the timing fence into flush()
    sb = cfg.shapes.scan_batch
    # 1 IMU-init scan + win_size fill scans, then whole batches
    warm = cfg.local_ba.win_size + 1 + 2 * sb
    # >=4 timed batches: the final flush drains a whole batch
    # serially (~0.3 s), so short windows understate steady rate
    timed_n = ((56 + sb - 1) // sb) * sb
    n_scans = warm + timed_n
    # dataset generation takes ~7 min on the 1-core host: cache it on
    # disk keyed by the generation parameters (scan count, rays, seed)
    cache_key = f"bench_data_n{n_scans}_r{dirs.shape[0]}_s7.pkl"
    cache_path = os.path.join("/tmp", cache_key)
    if os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            data = pickle.load(f)
        log(f"loaded cached dataset {cache_path}")
    else:
        data = synthetic.simulate(
            n_scans=n_scans, traj=traj, dirs=dirs, t0=0.5, seed=7,
            world=synthetic.make_room(size=(14.0, 11.0, 5.0), n_boxes=10),
        )
        with open(cache_path, "wb") as f:
            pickle.dump(data, f)

    fe = SlamFrontend(cfg)
    t_compile0 = time.time()
    for sc in data.scans[:warm]:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    log(f"warmup+compile: {time.time() - t_compile0:.1f}s, phase={fe.phase}")
    if fe.phase != "STEADY":
        log("WARNING: pipeline not steady after warmup")
    # the warmup count is batch-aligned (1 IMU-init + win fill +
    # 2*scan_batch steady) so the timing fence lands on an empty
    # batch buffer; verify rather than silently mistime
    if fe._batch_buf:
        log(f"WARNING: {len(fe._batch_buf)} scans straddle the fence")

    # timed steady-state scans (fresh telemetry: warmup compiles would
    # otherwise dominate the stage means)
    from voxelslam_tpu.utils.telemetry import Telemetry
    fe.telemetry = Telemetry()
    timed = data.scans[warm:]
    import jax

    t0 = time.time()
    for sc in timed:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    fe.flush()
    jax.block_until_ready(fe.carry.x.p)
    dt = time.time() - t0
    sps = len(timed) / dt
    log(fe.telemetry.report())
    log(f"sessions: {fe.session + 1}")
    # output latency: results arrive one scan_batch behind real time
    log(f"output latency: {sb} scans batched -> "
        f"{sb / sps * 1000:.0f} ms behind the stream at this rate")

    # sanity: the result must be a real trajectory, not garbage
    ts, Rs, ps = fe.trajectory()
    errs = []
    for i in range(len(ts)):
        j = int(np.argmin(np.abs(data.gt_t - ts[i])))
        errs.append(np.linalg.norm(ps[i] - data.gt_p[j]))
    ate = float(np.sqrt(np.mean(np.array(errs) ** 2)))
    log(f"{len(timed)} scans in {dt:.3f}s -> {sps:.2f} scans/s; ATE {ate:.4f} m")
    if not np.isfinite(ate) or ate > 1.0:
        log("WARNING: trajectory quality degraded; reporting anyway")

    print(json.dumps({
        "metric": "lidar_scans_per_sec_odom_lba",
        "value": round(sps, 3),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
