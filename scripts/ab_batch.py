"""Paired A/B of scan_batch sizes with HONEST window fences.

scripts/ab_cfg.py keeps one batch in flight per timed window with a
64-scan window — at scan_batch>=64 the window is <= one batch, so the
"rate" it reports is host dispatch speed, not device throughput (this
is how an early b64 reading claimed +80 scans/s that a clean
end-to-end bench could not reproduce).  Here each timed window is
256 scans (a multiple of both batch sizes) and ends with a FULL pipe
drain, so every window pays its own device time; order alternates per
window to cancel tunnel drift inside the pair.

Usage: python scripts/ab_batch.py 32 64 [window]
"""

import dataclasses
import glob
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
    import numpy as np

    from bench import _ate, _room_cfg
    from voxelslam_tpu.slam import SlamFrontend

    va, vb = int(sys.argv[1]), int(sys.argv[2])
    seg = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    assert seg % va == 0 and seg % vb == 0, "window must cover whole batches"

    paths = sorted(glob.glob("/tmp/bench_room_n*.pkl"))
    assert paths, "run bench.py once to generate the room dataset"
    with open(paths[-1], "rb") as f:
        data = pickle.load(f)
    log(f"dataset: {paths[-1]} ({len(data.scans)} scans)")

    def mk(v):
        cfg = _room_cfg()
        cfg = dataclasses.replace(
            cfg, shapes=dataclasses.replace(cfg.shapes, scan_batch=v)
        )
        return SlamFrontend(cfg), cfg

    fe_a, cfg_a = mk(va)
    fe_b, cfg_b = mk(vb)

    def feed(fe, scans):
        for sc in scans:
            fe.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                            data.imu_t, data.imu_gyr, data.imu_acc)

    warm = max(
        cfg_a.local_ba.win_size + 1 + 2 * cfg_a.shapes.scan_batch,
        cfg_b.local_ba.win_size + 1 + 2 * cfg_b.shapes.scan_batch,
    )
    # round warm up to a multiple of both batches so windows stay
    # batch-aligned for both frontends
    lcm = np.lcm(va, vb)
    warm = int(-(-warm // lcm) * lcm)
    for name, fe in (("A", fe_a), ("B", fe_b)):
        t0 = time.time()
        feed(fe, data.scans[:warm])
        while fe._pending:
            fe._resolve_pending()
        log(f"warmup {name} {time.time()-t0:.1f}s phase={fe.phase}")

    pos = warm
    ra, rb = [], []
    k = 0
    while pos + seg <= len(data.scans):
        order = [("A", fe_a, ra), ("B", fe_b, rb)]
        if k % 2 == 1:
            order.reverse()
        line = f"win {k}:"
        for name, fe, acc in order:
            t0 = time.time()
            feed(fe, data.scans[pos:pos + seg])
            while fe._pending:  # full drain: window owns its device time
                fe._resolve_pending()
            r = seg / (time.time() - t0)
            acc.append(r)
            line += f"  {name}={r:6.1f}"
        log(line)
        pos += seg
        k += 1

    ra, rb = np.array(ra), np.array(rb)
    log(f"A (scan_batch={va}): {ra.mean():.1f} +/- {ra.std():.1f} scans/s")
    log(f"B (scan_batch={vb}): {rb.mean():.1f} +/- {rb.std():.1f} scans/s")
    d = rb - ra
    log(f"paired delta B-A: {d.mean():+.1f} +/- {d.std():.1f}")
    for name, fe in (("A", fe_a), ("B", fe_b)):
        fe.flush()
        ts, _, ps = fe.trajectory()
        log(f"ATE {name}: {_ate(ts, ps, data.gt_t, data.gt_p):.4f} m")


if __name__ == "__main__":
    main()
