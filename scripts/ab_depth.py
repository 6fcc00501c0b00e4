"""A/B pipe_depth within ONE process (tunnel mood varies ~2x between
runs, so cross-run comparisons lie): alternate 64-scan segments at
depth 1 / 2 / 1 / 2 ... on the room dataset and print each rate."""

import pickle
import sys
import time


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
    log(f"warmup {time.time()-t0:.1f}s phase={fe.phase}")

    seg = 64
    pos = warm
    for k in range(8):
        depth = 1 if k % 2 == 0 else 2
        fe.pipe_depth = depth
        t0 = time.time()
        for sc in data.scans[pos:pos + seg]:
            fe.process_scan(sc.points, sc.offsets, sc.t_begin,
                            sc.t_end, data.imu_t, data.imu_gyr,
                            data.imu_acc)
        # drain to the target depth so the next segment starts equal
        while len(fe._pending) > 1:
            fe._resolve_pending()
        dt = time.time() - t0
        log(f"seg {k}: depth={depth}  {seg/dt:6.1f} scans/s")
        pos += seg


if __name__ == "__main__":
    main()
