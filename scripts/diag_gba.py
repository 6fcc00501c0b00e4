"""GBA-effect diagnosis (VERDICT r4 #5): why does finish GBA barely
move the ring ATE (0.0175 -> 0.0168 in BENCH_r04)?

Builds a CPU-sized drifted ring circuit (gyro scale error -> heading
drift, the revisit needs PGO), runs the full system, then scores the
FINAL top-down solve in controlled variants WITHOUT write-back
mutation — ATE is computed directly from each solver output:

  A  no finish solve (poses as-run: per-loop-event PGO already applied)
  B  re-solve sequential + loop edges only (16x256)
  C  B + bottom-up keyframe hessian edges (gba_edges1)
  D  C + submap-level edges (gba_edges2)      <- what finish() runs
  E  D at 32 GN x 512 CG                      <- convergence probe

Prints chi2 before/after and ATE per variant, plus edge-information
stats (median sequential vs GBA weights: a huge ratio means one side
is drowned out).

Usage: python scripts/diag_gba.py [--scans 420] [--lines 48]
"""

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from voxelslam_tpu.utils.cachedir import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _align_yaw_t(est, ref):
    ca, cb = est.mean(0), ref.mean(0)
    A, B = est - ca, ref - cb
    num = float(np.sum(A[:, 0] * B[:, 1] - A[:, 1] * B[:, 0]))
    den = float(np.sum(A[:, 0] * B[:, 0] + A[:, 1] * B[:, 1]))
    th = np.arctan2(num, den)
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return R, cb - R @ ca


def _ate(est, ref):
    R, t = _align_yaw_t(np.asarray(est), np.asarray(ref))
    d = est @ R.T + t - ref
    return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=420)
    ap.add_argument("--lines", type=int, default=48)
    ap.add_argument("--cols", type=int, default=160)
    args = ap.parse_args()

    from voxelslam_tpu.core import synthetic
    from voxelslam_tpu.core.config import (
        Config, GeneralCfg, LocalBACfg, LoopCfg, OdometryCfg, Shapes,
    )
    from voxelslam_tpu.loop import posegraph
    from voxelslam_tpu.slam import VoxelSLAM

    lap_s = 24.0
    f = 1.0 / lap_s
    R_ring = 12.5
    traj = synthetic.Trajectory(
        amp=np.array([R_ring, R_ring, 0.2]),
        freq=np.array([f, f, 0.23]),
        phase=np.array([0.0, -np.pi / 2, 0.0]),
        yaw_amp=0.0, yaw_rate=2 * np.pi * f, pitch_amp=0.05,
        ramp=1.5, t_start=1.0,
    )
    world = synthetic.make_ring(radius=R_ring, corridor=9.0, seed=3)
    dirs = synthetic.lidar_dirs(n_lines=args.lines, n_cols=args.cols,
                                fov_v=60.0, fov_h=160.0)
    import pickle

    cache = f"/tmp/diag_ring_{args.scans}_{args.lines}x{args.cols}.pkl"
    if (args.scans, args.lines, args.cols) == (520, 96, 300) and \
            os.path.exists("/tmp/bench_ring_n520.pkl"):
        # identical generator params to bench.py's ring dataset
        cache = "/tmp/bench_ring_n520.pkl"
    if os.path.exists(cache):
        data = pickle.load(open(cache, "rb"))
        log(f"loaded cached dataset {cache}")
    else:
        t0 = time.time()
        data = synthetic.simulate(
            n_scans=args.scans, traj=traj, world=world, dirs=dirs,
            t0=0.5, seed=11, gyr_noise=2e-3, acc_noise=2e-2,
            gyr_scale=1.02,
        )
        log(f"simulated {args.scans} scans in {time.time() - t0:.0f}s")
        pickle.dump(data, open(cache, "wb"))

    cfg = Config(
        general=GeneralCfg(imu_topic="/synthetic/imu"),
        odometry=OdometryCfg(
            cov_gyr=0.01, cov_acc=0.1, down_size=0.1, voxel_size=1.0,
            min_eigen_value=0.005, degrade_bound=5, evict_dist=200.0,
        ),
        local_ba=LocalBACfg(win_size=10, max_iter=2),
        loop=LoopCfg(icp_eigval=3.0, curr_halt=2),
        shapes=Shapes(
            max_raw_points=8192, max_points=2048, max_imu=64,
            hash_capacity=1 << 14, max_ba_voxels=2048,
            scan_batch=8, refit_size=1024,
        ),
    )
    slam = VoxelSLAM(cfg)
    t0 = time.time()
    for sc in data.scans:
        slam.process_scan(sc.points, sc.offsets, sc.t_begin, sc.t_end,
                          data.imu_t, data.imu_gyr, data.imu_acc)
    slam.frontend.flush()
    slam._drain(final=True)
    log(f"pipeline: {time.time() - t0:.0f}s, "
        f"loops={slam.loop.n_loops_found} opts={slam.loop.n_optimizations}")

    # bottom-up drain + submap level (what finish() does before PGO)
    kfs = slam.loop.keyframes
    slam.gmap.bottom_up_drain(kfs)
    edges1 = list(slam.gmap.edges)
    edges2 = slam.gmap.submap_level(
        keyframes=kfs, max_submaps=cfg.gba.max_submaps,
        submap_points=cfg.gba.submap_points,
    )
    log(f"gba_edges1={len(edges1)} gba_edges2={len(edges2)} "
        f"keyframes={len(kfs)}")

    # ground-truth correspondence for the solver-output scans
    sess_all = [s for sess in slam.loop.sessions for s in sess]
    ts = np.array([s["t"] for s in sess_all])
    gidx = [int(np.argmin(np.abs(data.gt_t - t))) for t in ts]
    ref = data.gt_p[gidx]

    # edge-information stats
    w_seq = np.concatenate(
        [c.w[1 : c.n].reshape(-1) for c in slam.loop._chains if c.n >= 2]
    )
    if edges1:
        w_gba = np.concatenate(
            [1.0 / np.maximum(np.abs(np.asarray(e["v6"])), 1e-12)
             for e in edges1]
        )
        log(f"info medians: seq={np.median(w_seq):.3e} "
            f"gba1={np.median(w_gba):.3e} "
            f"(ratio {np.median(w_gba) / np.median(w_seq):.2f})")

    est0 = np.stack([s["p"] for s in sess_all])
    log(f"A  as-run                       ATE {_ate(est0, ref):.4f}")

    variants = [
        ("B  seq+loop re-solve 16x256", (), 16, 256),
        ("C  + gba1              16x256", tuple(edges1), 16, 256),
        ("D  + gba1+gba2         16x256", tuple(edges1 + edges2), 16, 256),
        ("E  + gba1+gba2         32x512", tuple(edges1 + edges2), 32, 512),
    ]
    for name, extra, ni, ci in variants:
        g, offsets = slam.loop._graph_arrays(extra_edges=list(extra))
        R, p, chi2, chi2_0 = posegraph.optimize(
            g, n_iters=ni, cg_iters=ci
        )
        p = np.asarray(p)
        est = np.concatenate([
            p[o : o + c.n] for o, c in zip(offsets, slam.loop._chains)
            if c.n
        ])
        log(f"{name}  ATE {_ate(est, ref):.4f}  "
            f"chi2 {float(chi2_0):.3e} -> {float(chi2):.3e}")

    # F: the TWO-STAGE finish (what slam.finish now runs) — stage 1
    # solves seq+loop+gba1 and WRITES BACK, stage 2 rebuilds submap
    # clouds from the corrected poses, reruns the submap BA and solves
    # with all edges.  Mutating, so it runs last.
    g1, off1 = slam.loop._graph_arrays(extra_edges=edges1)
    R1, p1, _, _ = posegraph.optimize(g1, n_iters=16, cg_iters=256)
    slam.loop.write_back(np.asarray(R1), np.asarray(p1), off1)
    edges2b = slam.gmap.submap_level(
        keyframes=kfs, max_submaps=cfg.gba.max_submaps,
        submap_points=cfg.gba.submap_points,
    )
    g2, off2 = slam.loop._graph_arrays(extra_edges=edges1 + edges2b)
    R2, p2, chi2, chi2_0 = posegraph.optimize(
        g2, n_iters=16, cg_iters=256
    )
    p2 = np.asarray(p2)
    est = np.concatenate([
        p2[o : o + c.n] for o, c in zip(off2, slam.loop._chains) if c.n
    ])
    log(f"F  two-stage finish (gba2 rebuilt)  ATE {_ate(est, ref):.4f}  "
        f"chi2 {float(chi2_0):.3e} -> {float(chi2):.3e}")


if __name__ == "__main__":
    main()
