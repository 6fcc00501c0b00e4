"""A/B two frontend CONFIGS within one process (tunnel mood varies
~2x between runs, so cross-run comparisons lie).

Both frontends consume the SAME contiguous scan stream; for each
64-scan window the two frontends each process the window back to
back, order alternating per window to cancel drift inside the pair.
Prints per-window rates and the paired mean delta.

Usage: python scripts/ab_cfg.py KEY VALUE_A VALUE_B
  e.g. python scripts/ab_cfg.py hash_capacity 16384 8192
       python scripts/ab_cfg.py scan_batch 16 32
"""

import dataclasses
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

    key = sys.argv[1]
    va, vb = int(sys.argv[2]), int(sys.argv[3])

    import glob

    paths = sorted(glob.glob("/tmp/bench_room_n*.pkl"))
    assert paths, "run bench.py once to generate the room dataset"
    with open(paths[-1], "rb") as f:
        data = pickle.load(f)
    log(f"dataset: {paths[-1]} ({len(data.scans)} scans)")

    def mk(v):
        cfg = _room_cfg()
        cfg = dataclasses.replace(
            cfg, shapes=dataclasses.replace(cfg.shapes, **{key: v})
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
    t0 = time.time()
    feed(fe_a, data.scans[:warm])
    log(f"warmup A {time.time()-t0:.1f}s phase={fe_a.phase}")
    t0 = time.time()
    feed(fe_b, data.scans[:warm])
    log(f"warmup B {time.time()-t0:.1f}s phase={fe_b.phase}")

    seg = 64
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
            # settle in-flight work so the pair's timings don't bleed.
            # ONE batch intentionally stays in flight: draining fully
            # would pay the resolve round-trip inside the timed region
            # (the alternation of A/B order cancels the leftover in the
            # paired mean; it does inflate per-window variance).
            while len(fe._pending) > 1:
                fe._resolve_pending()
            r = seg / (time.time() - t0)
            acc.append(r)
            line += f"  {name}={r:6.1f}"
        log(line)
        pos += seg
        k += 1

    import numpy as np

    from bench import _ate

    ra, rb = np.array(ra), np.array(rb)
    log(f"A ({key}={va}): {ra.mean():.1f} +/- {ra.std():.1f} scans/s")
    log(f"B ({key}={vb}): {rb.mean():.1f} +/- {rb.std():.1f} scans/s")
    d = rb - ra
    log(f"paired delta B-A: {d.mean():+.1f} +/- {d.std():.1f}")
    # both frontends saw the full stream -> ATE is comparable
    for name, fe in (("A", fe_a), ("B", fe_b)):
        fe.flush()
        ts, _, ps = fe.trajectory()
        log(f"ATE {name}: {_ate(ts, ps, data.gt_t, data.gt_p):.4f} m")


if __name__ == "__main__":
    main()
