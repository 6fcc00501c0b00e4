"""Diagnose the frontend throughput decline across the 512-scan bench
(BENCH r3 segments 96.3/96.7/67.1/54.0): log per-batch wall time split
into pack / dispatch / resolve plus device-side observables (n_subdiv,
overflow, n_occupied) to localize what grows.

Run on the real TPU (no JAX_PLATFORMS pin): `python scripts/diag_degrade.py`.
"""

import pickle
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
    from bench import _room_cfg

    from voxelslam_tpu.slam import SlamFrontend

    with open("/tmp/bench_room_n555.pkl", "rb") as f:
        data = pickle.load(f)

    cfg = _room_cfg()
    fe = SlamFrontend(cfg)
    sb = cfg.shapes.scan_batch
    warm = cfg.local_ba.win_size + 1 + 2 * sb

    t0 = time.time()
    for sc in data.scans[:warm]:
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
    log(f"warmup {time.time() - t0:.1f}s phase={fe.phase}")

    # per-batch log: wall, and the out stats of the batch resolved in it
    n_timed = 512
    scans = data.scans[warm:warm + n_timed]
    t_batch = time.time()
    i_in_batch = 0
    batch_no = 0
    for sc in scans:
        ns0 = fe.telemetry.counters.get("subdivisions", 0)
        fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                        data.imu_t, data.imu_gyr, data.imu_acc)
        i_in_batch += 1
        if i_in_batch == sb:
            i_in_batch = 0
            dt = time.time() - t_batch
            ns = fe.telemetry.counters.get("subdivisions", 0) - ns0
            log(f"batch {batch_no:3d}: {1000*dt:7.1f} ms "
                f"({1000*dt/sb:5.1f} ms/scan) subdiv+={ns} "
                f"load={fe._last_load:.3f} jour={fe._last_jour:.1f} "
                f"pend={'y' if fe._pending is not None else 'n'}")
            batch_no += 1
            t_batch = time.time()
    fe.flush()
    jax.block_until_ready(fe.carry.x.p)
    log("stage report:")
    log(fe.telemetry.report())


if __name__ == "__main__":
    main()
