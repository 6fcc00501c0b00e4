"""Command-line entry point — the reference's node `main` + launch
files (voxelslam.cpp:2599-2624) as a standalone app.

Dataset directory layout (produced by `convert-synth` or by rosbag
extraction tooling):

    dataset/
      imu.npz            t (M,), gyr (M,3), acc (M,3)
      scans/000000.npz   pts (K,3), offsets (K,), t_begin, t_end
      config.yaml        (optional, reference YAML format)

Commands:
    python -m voxelslam_tpu.cli run <dataset> [--config c.yaml]
        [--out out/] [--viz] [--finish]
    python -m voxelslam_tpu.cli convert-synth <outdir> [--scans N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np


def _load_dataset(path: str):
    imu = np.load(os.path.join(path, "imu.npz"))
    scan_files = sorted(glob.glob(os.path.join(path, "scans", "*.npz")))
    return imu, scan_files


def cmd_run(args):
    if args.platform:
        # select the backend BEFORE the first jax op claims a device
        # (the sandbox's sitecustomize prepends the axon TPU plugin to
        # every process; CPU runs must opt out explicitly).  CPU runs
        # also need the machine-keyed compile cache — XLA:CPU AOT
        # entries in the shared .jax_cache come from a different host
        # and can SIGILL (utils/cachedir.py).
        import jax

        jax.config.update("jax_platforms", args.platform)
        if args.platform == "cpu":
            from .utils.cachedir import cpu_cache_dir

            jax.config.update(
                "jax_compilation_cache_dir", cpu_cache_dir()
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0
            )
    from .core.config import Config, load_yaml
    from .slam import VoxelSLAM

    if args.dataset is None and not getattr(args, "listen", None):
        raise SystemExit("run: need a dataset directory or --listen ADDR")

    cfg = Config()
    cfg_path = args.config or (
        os.path.join(args.dataset, "config.yaml") if args.dataset else ""
    )
    if cfg_path and os.path.exists(cfg_path):
        cfg = load_yaml(cfg_path, cfg)
        print(f"config: {cfg_path}", file=sys.stderr)

    previous = None
    previous_edges = None
    if args.previous_map:
        from .io import serialization

        dirs = args.previous_map.split(",")
        previous = [
            (os.path.basename(os.path.normpath(p)),
             serialization.load_session(p))
            for p in dirs
        ]
        # the shared edge.txt lives next to the session dirs
        edge_path = os.path.join(
            os.path.dirname(os.path.normpath(dirs[0])), "edge.txt"
        )
        if os.path.exists(edge_path):
            previous_edges = edge_path
            print(f"prior edges: {edge_path}", file=sys.stderr)

    slam = VoxelSLAM(cfg, previous_sessions=previous,
                     previous_edges=previous_edges)

    if getattr(args, "listen", None):
        # online mode: no dataset replay — accept a live transport
        # producer (cli play / a driver bridge) and run the streaming
        # loop, the no-ROS equivalent of the reference's subscriber
        # callbacks + odometry thread (voxelslam.hpp:52-103)
        from .io import transport

        print(f"listening on {args.listen}", file=sys.stderr)
        feed, closer = transport.serve_feed(args.listen)
        t0 = time.time()
        try:
            slam.run_live(feed)
            slam.drain_live()
        finally:
            closer()
        wall = time.time() - t0
        n = len(slam.frontend.records)
        _finish_run(args, slam, n, wall)
        return

    imu, scan_files = _load_dataset(args.dataset)
    streamer = None
    streamed = 0
    if getattr(args, "viz_stream", False) and args.out:
        from .io import viz as _viz

        streamer = _viz.VizExporter(
            args.out, every=getattr(args, "viz_every", 10)
        )
    t0 = time.time()
    n = 0
    seen_events = 0
    for f in scan_files:
        d = np.load(f)
        slam.process_scan(
            d["pts"], d["offsets"], float(d["t_begin"]), float(d["t_end"]),
            imu["t"], imu["gyr"], imu["acc"],
        )
        n += 1
        if streamer is not None:
            # loop correction moved the world: wipe stale accumulated
            # exports (the reference publishes an empty cloud for the
            # same purpose, voxelslam_pc2.cpp:155-158)
            if len(slam.loop_events) > seen_events:
                seen_events = len(slam.loop_events)
                streamer.clear()
            sps = slam.frontend.scan_poses
            while streamed < len(sps):
                sp = sps[streamed]
                streamed += 1
                from .utils.spill import fetch_scan

                p_full, m_full = fetch_scan(sp)
                pw = p_full[m_full] @ sp["R"].T + sp["p"]
                streamer.stream_frame(
                    pw, np.stack([s["p"] for s in sps[: streamed]]),
                )
        if n % 50 == 0:
            print(f"  scan {n}/{len(scan_files)} "
                  f"phase={slam.frontend.phase} "
                  f"sessions={slam.frontend.session + 1} "
                  f"loops={slam.loop.n_loops_found}", file=sys.stderr)
    wall = time.time() - t0
    _finish_run(args, slam, n, wall)


def _finish_run(args, slam, n, wall):
    """Shared post-run tail for replay and live modes: optional final
    GBA, ATE scoring, summary JSON, viz export."""

    def _align_yaw_t(est, ref):
        """Gauge-aware alignment: global yaw + translation are
        unobservable for a LiDAR-inertial system (roll/pitch are
        pinned by gravity), so score after removing exactly those
        4 DoF — the standard SLAM-evaluation practice (evo's
        align with yaw-only Umeyama).  Returns (R_align, t_align)."""
        ca, cb = est.mean(0), ref.mean(0)
        A, B = est - ca, ref - cb
        num = float(np.sum(A[:, 0] * B[:, 1] - A[:, 1] * B[:, 0]))
        den = float(np.sum(A[:, 0] * B[:, 0] + A[:, 1] * B[:, 1]))
        th = np.arctan2(num, den)
        c, s = np.cos(th), np.sin(th)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        return R, cb - R @ ca

    def _score(est, ref):
        if len(est) == 0:
            return None
        est = np.asarray(est)
        ref = np.asarray(ref)
        R, t = _align_yaw_t(est, ref)
        d = est @ R.T + t - ref
        return float(np.sqrt(np.mean(np.sum(d * d, axis=1))))

    def _gt_match(gt, ts_, ps_):
        idx = [int(np.argmin(np.abs(gt["t"] - t))) for t in ts_]
        return np.asarray(ps_), gt["p"][idx]

    def _ate():
        if not args.gt:
            return None
        gt = np.load(args.gt)
        ts_, _, ps_ = slam.trajectory()
        if len(ts_) == 0:
            return None
        return _score(*_gt_match(gt, ts_, ps_))

    ate_before = None
    if args.gt:
        slam.frontend.flush()
        slam._drain()
        ate_before = _ate()
    if args.finish:
        slam.finish(save_dir=args.out)
    elif args.out:
        slam.frontend.flush()
        from .io import serialization

        os.makedirs(args.out, exist_ok=True)
        for si, sess in enumerate(slam.loop.sessions):
            if sess:
                serialization.save_session(
                    os.path.join(args.out, slam.session_name(si)),
                    sess,
                )

    ts, Rs, ps = slam.trajectory()
    print(slam.frontend.telemetry.report(), file=sys.stderr)
    summary = dict(
        scans=n,
        wall_s=round(wall, 2),
        scans_per_sec=round(n / max(wall, 1e-9), 2),
        sessions=slam.frontend.session + 1,
        keyframes=len(slam.loop.keyframes),
        loops=slam.loop.n_loops_found,
        pgo_runs=slam.loop.n_optimizations,
        traj_len=len(ts),
    )
    if args.gt:
        summary["ate_m"] = (
            round(ate_before, 4) if ate_before is not None else None
        )
        if args.finish:
            a = _ate()
            summary["ate_after_gba_m"] = (
                round(a, 4) if a is not None else None
            )
        # multi-session scoring: sessions PGO-linked to session 0
        # share its (ground-truth) frame; unlinked components live in
        # their own z-offset frames by design, so the global ate_m is
        # meaningful only when main_component covers everything.
        gt = np.load(args.gt)
        per_sess = []
        for sess in slam.loop.sessions:
            if not sess:
                per_sess.append(None)
                continue
            est, ref = _gt_match(
                gt, [s["t"] for s in sess], [s["p"] for s in sess]
            )
            a = _score(est, ref)
            per_sess.append(round(a, 4) if a is not None else None)
        comps = slam.loop.components()
        main = next((c for c in comps if 0 in c), [0])
        m_ts, m_ps = [], []
        for si in main:
            for s in slam.loop.sessions[si]:
                m_ts.append(s["t"])
                m_ps.append(s["p"])
        # ONE alignment over the whole linked component: inter-session
        # misalignment inside it must show up in the score
        a = _score(*_gt_match(gt, m_ts, m_ps)) if m_ts else None
        summary["ate_per_session_m"] = per_sess
        summary["session_components"] = comps
        summary["ate_main_component_m"] = (
            round(a, 4) if a is not None else None
        )
        summary["main_component_coverage"] = round(
            len(m_ts) / max(sum(len(s) for s in slam.loop.sessions), 1), 3
        )
    print(json.dumps(summary))

    if args.viz and args.out:
        from .io import viz

        ex = viz.VizExporter(args.out, every=1)
        ex.path(ps, np.asarray([0] * len(ps)))
        clouds = []
        for k in slam.loop.keyframes:
            kc, km = k.get_cloud()
            pw = kc[km] @ k.R0.T + k.p0
            clouds.append(pw)
        if clouds:
            ex.global_map(clouds)
        print(f"viz written to {args.out}", file=sys.stderr)


def cmd_play(args):
    """Producer half of the live pair: frame a converted dataset onto
    the transport socket in arrival-time order (the rosbag-play
    counterpart, README.md:48-51)."""
    from .io import transport

    w = transport.connect(args.connect)
    n = transport.play_dataset(args.dataset, w, rate=args.rate)
    w.close()
    print(f"streamed {n} scans to {args.connect}", file=sys.stderr)


def cmd_convert_synth(args):
    from .core import synthetic

    traj = synthetic.Trajectory(
        amp=np.array([1.5, 1.2, 0.3]), ramp=1.5, t_start=1.0
    )
    dirs = synthetic.lidar_dirs(
        n_lines=args.lines, n_cols=args.cols, fov_v=55.0, fov_h=140.0
    )
    data = synthetic.simulate(
        n_scans=args.scans, traj=traj, dirs=dirs, t0=0.5, seed=args.seed,
        world=synthetic.make_room(size=(14.0, 11.0, 5.0), n_boxes=10),
    )
    os.makedirs(os.path.join(args.outdir, "scans"), exist_ok=True)
    np.savez_compressed(
        os.path.join(args.outdir, "imu.npz"),
        t=data.imu_t, gyr=data.imu_gyr, acc=data.imu_acc,
    )
    np.savez_compressed(
        os.path.join(args.outdir, "groundtruth.npz"),
        t=data.gt_t, R=data.gt_R, p=data.gt_p,
    )
    for i, sc in enumerate(data.scans):
        np.savez_compressed(
            os.path.join(args.outdir, "scans", f"{i:06d}.npz"),
            pts=sc.points.astype(np.float32),
            offsets=sc.offsets.astype(np.float32),
            t_begin=sc.t_begin, t_end=sc.t_end,
        )
    print(f"wrote {len(data.scans)} scans to {args.outdir}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="voxelslam_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run SLAM over a dataset directory")
    r.add_argument("dataset", nargs="?", default=None)
    r.add_argument("--listen", default=None, metavar="ADDR",
                   help="online mode: accept a live transport producer "
                        "on a unix-socket path or host:port instead of "
                        "replaying a dataset (pair with `cli play`)")
    r.add_argument("--config", default=None)
    r.add_argument("--out", default=None)
    r.add_argument("--viz", action="store_true")
    r.add_argument("--viz-stream", action="store_true",
                   help="write live map_scan/map_path PLYs + numbered "
                        "frames during the run (watchable)")
    r.add_argument("--viz-every", type=int, default=10)
    r.add_argument("--finish", action="store_true",
                   help="run final global BA (the reference's "
                        "`rosparam set finish true`)")
    r.add_argument("--previous-map", default=None,
                   help="comma-separated saved session dirs to "
                        "relocalize against")
    r.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="pin the jax backend (default: environment "
                        "order, i.e. TPU when one is attached)")
    r.add_argument("--gt", default=None,
                   help="ground-truth npz (t, R, p): score ATE before "
                        "and (with --finish) after the final GBA")
    r.set_defaults(fn=cmd_run)

    p = sub.add_parser(
        "play", help="stream a converted dataset to a listening "
                     "`cli run --listen` process (live-transport pair)"
    )
    p.add_argument("dataset")
    p.add_argument("--connect", required=True, metavar="ADDR",
                   help="unix-socket path or host:port of the listener")
    p.add_argument("--rate", type=float, default=0.0,
                   help="pace at RATE x real time (0 = full speed)")
    p.set_defaults(fn=cmd_play)

    c = sub.add_parser("convert-synth", help="generate a synthetic dataset")
    c.add_argument("outdir")
    c.add_argument("--scans", type=int, default=60)
    c.add_argument("--lines", type=int, default=32)
    c.add_argument("--cols", type=int, default=128)
    c.add_argument("--seed", type=int, default=7)
    c.set_defaults(fn=cmd_convert_synth)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
