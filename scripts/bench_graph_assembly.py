"""Micro-benchmark: PGO graph assembly at long-run scale.

r3 VERDICT #6: `_graph_arrays` walked every scan of every session in
Python per solve — seconds of host time at 10k scans.  The chain now
lives in per-session numpy mirrors (_SessChain) maintained on arrival;
assembly is concat + pad.  This script times assembly + writeback at
10k scans (the reference's ISAM2 is incremental for the same reason,
voxelslam.cpp:2090-2098).

Run: python scripts/bench_graph_assembly.py  (CPU-pinned)
"""

import sys
import time

sys.path.insert(0, ".")

import os  # noqa: E402

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from voxelslam_tpu.loop import btc, database, manager  # noqa: E402


def main(n_scans=10_000, n_sessions=4, n_loops=200):
    p = btc.BtcParams(line_filter_enable=False, voxel_init_num=5)
    sp = database.SearchParams(skip_near_num=2)
    mgr = manager.LoopManager(
        p, sp, win_size=3, min_kf_rot_deg=1e9, min_kf_trans=1e9,
        db_capacity=1 << 12, kf_capacity=64,
    )
    rng = np.random.default_rng(0)
    per = n_scans // n_sessions
    t0 = time.perf_counter()
    for s in range(n_sessions):
        for i in range(per):
            mgr.push_scan_pose(dict(
                t=0.1 * i, R=np.eye(3), p=np.asarray([0.5 * i, 0.0, 0.0]),
                v=np.zeros(3), bg=np.zeros(3), ba=np.zeros(3),
                g=np.asarray([0.0, 0.0, -9.8]), v6=np.full(6, 1e-4),
                pts=np.zeros((2, 3), np.float32), mask=np.zeros(2, bool),
            ))
        if s + 1 < n_sessions:
            mgr.new_session()
    t_push = time.perf_counter() - t0
    for _ in range(n_loops):
        s1, s2 = sorted(rng.integers(0, n_sessions, 2))
        mgr.loop_edges.append(manager.LoopEdge(
            s1=int(s1), s2=int(s2),
            scan1=int(rng.integers(0, per)), scan2=int(rng.integers(0, per)),
            R=np.eye(3), t=np.zeros(3), v6=np.full(6, 1e-4),
        ))

    # assembly
    t0 = time.perf_counter()
    g, offsets = mgr._graph_arrays()
    t_asm = (time.perf_counter() - t0) * 1000
    # repeat hot
    t0 = time.perf_counter()
    for _ in range(5):
        g, offsets = mgr._graph_arrays()
    t_asm_hot = (time.perf_counter() - t0) * 1000 / 5

    # writeback at the same scale
    N = int(g.R.shape[0])
    R_new = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
    p_new = np.asarray(g.p)
    t0 = time.perf_counter()
    mgr.write_back(R_new, p_new, offsets)
    t_wb = (time.perf_counter() - t0) * 1000

    print(
        f"scans={n_scans} sessions={n_sessions} loops={n_loops}: "
        f"push {t_push:.2f}s total ({1e6 * t_push / n_scans:.0f} us/scan), "
        f"assembly {t_asm:.1f} ms cold / {t_asm_hot:.1f} ms hot, "
        f"writeback {t_wb:.1f} ms"
    )
    assert t_asm_hot < 50.0, "graph assembly exceeds the 50 ms budget"


if __name__ == "__main__":
    main()
