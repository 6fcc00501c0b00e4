"""HILTI-shaped stress corpus: generate → bag → npz → full-system run.

The hardest synthetic scenario this sandbox can produce in place of
real bags (egress is blocked; see PARITY.md "real data" note):

- multi-room + corridor world, ~51 x 40 m span (> 50 m);
- >= 1000 scans at production shapes (28.8k rays, 10 Hz);
- a 22 m FEATURELESS corridor: ESIKF degeneracy trips, the session
  resets mid-run (voxelslam.cpp:1618-1634 counterpart) and the new
  session must later re-merge through cross-session loop closure;
- >= 3 true revisits (room B twice, room C loop, room A start/end);
- gyro scale error (un-estimable heading drift), IMU noise + bias,
  range-dependent LiDAR noise AND spurious short returns (outliers);
- everything flows through the REAL ingestion chain: ROS1 bag
  (PointCloud2 + Imu) → scripts/convert_bag.py → npz dataset →
  `python -m voxelslam_tpu.cli run` with loop closure + continuous
  bottom-up HBA + finish GBA, scored as ATE before/after GBA.

Reproduce (one command):

    python scripts/stress_corpus.py all --dir /tmp/stress

or step by step:

    python scripts/stress_corpus.py gen --dir /tmp/stress
    python scripts/convert_bag.py /tmp/stress/stress.bag \
        /tmp/stress/dataset --lidar-topic /velodyne_points \
        --imu-topic /imu/data --lidar-type VELODYNE --filter-num 1 \
        --blind 0.1
    python -m voxelslam_tpu.cli run /tmp/stress/dataset \
        --config /tmp/stress/dataset/config.yaml \
        --gt /tmp/stress/stress_gt.npz --finish
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("STRESS_PLATFORM",
                                                      "cpu"))
HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CONFIG_YAML = """\
General:
  lid_topic: "/velodyne_points"
  imu_topic: "/imu/data"
  bagname: "stress"
Odometry:
  cov_gyr: 0.01
  cov_acc: 0.1
  down_size: 0.1
  voxel_size: 1.0
  min_eigen_value: 0.005
  degrade_bound: 5
  evict_dist: 200.0
LocalBA:
  win_size: 10
  max_iter: 2
Loop:
  icp_eigval: 3.0
  curr_halt: 3
Shapes:
  max_raw_points: 8192
  max_points: 2048
  max_imu: 64
  hash_capacity: 16384
  max_ba_voxels: 2048
  scan_batch: 16
  pipe_depth: 2
  refit_size: 1024
"""
# shapes above deliberately match bench.py's room/full-system config
# so the TPU evidence run reuses the bench-warmed compile cache


def cmd_gen(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from voxelslam_tpu.core import synthetic
    from voxelslam_tpu.io import rosbag
    from make_replay_bag import velodyne_packetize

    os.makedirs(args.dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    traj = synthetic.WaypointTrajectory(
        waypoints=synthetic.stress_waypoints(),
        speed=1.35, ramp=1.5, t_start=1.0,
    )
    world = synthetic.make_multiroom(seed=2)
    dirs = synthetic.lidar_dirs(n_lines=args.lines, n_cols=args.cols,
                                fov_v=60.0, fov_h=160.0)  # 28800 rays
    t0 = time.time()
    data = synthetic.simulate(
        n_scans=args.scans, traj=traj, world=world, dirs=dirs,
        gyr_noise=2e-3, acc_noise=2e-2,
        gyr_bias=(0.004, -0.002, 0.003), acc_bias=(0.02, -0.01, 0.03),
        # 0.5% gyro scale error: un-estimable heading drift large
        # enough that only loop closure can hold the map together,
        # small enough that true loops stay within the same-session
        # drift-plausibility gate (1.5% made the gate reject every
        # genuine loop: drift/jour > ratio_drift everywhere).
        gyr_scale=1.005,
        range_noise=0.005, range_noise_rel=0.002,  # range-dependent
        outlier_frac=0.002,    # spurious short returns
        # Short sensor range (--max-range 12): mid-corridor the
        # scanner sees ONLY the parallel walls/floor/ceiling (at 60 m
        # it saw the far rooms straight down the corridor and the
        # degeneracy never built up the degrade_bound streak -> no
        # session reset).  60 m = the continuous headline-accuracy
        # variant; 12 m = the reset/re-merge resilience variant.
        max_range=args.max_range,
        t0=0.5, seed=args.seed,
    )
    log(f"simulated {args.scans} scans in {time.time() - t0:.0f}s")

    T0 = 1700000000.0 - data.imu_t[0]
    bag = os.path.join(args.dir, "stress.bag")
    w = rosbag.BagWriter(bag)
    li = 0
    for i in range(len(data.imu_t)):
        t = data.imu_t[i] + T0
        while li < len(data.scans) and data.scans[li].t_begin + T0 <= t:
            sc = data.scans[li]
            arr = velodyne_packetize(sc.points, sc.offsets, rng)
            w.write("/velodyne_points", "sensor_msgs/PointCloud2",
                    sc.t_begin + T0,
                    rosbag.serialize_pointcloud2(sc.t_begin + T0, arr))
            li += 1
        w.write("/imu/data", "sensor_msgs/Imu", t,
                rosbag.serialize_imu(t, data.imu_gyr[i], data.imu_acc[i]))
    w.close()
    np.savez_compressed(
        os.path.join(args.dir, "stress_gt.npz"),
        t=data.gt_t + T0, R=data.gt_R, p=data.gt_p,
    )
    log(f"wrote {bag}: {li} scans, {os.path.getsize(bag) / 1e6:.0f} MB")


def cmd_all(args):
    cmd_gen(args)
    ds = os.path.join(args.dir, "dataset")
    subprocess.run(
        [sys.executable, os.path.join(HERE, "convert_bag.py"),
         os.path.join(args.dir, "stress.bag"), ds,
         "--lidar-topic", "/velodyne_points", "--imu-topic", "/imu/data",
         "--lidar-type", "VELODYNE", "--filter-num", "1",
         "--blind", "0.1"],
        check=True,
    )
    with open(os.path.join(ds, "config.yaml"), "w") as f:
        f.write(CONFIG_YAML)
    env = dict(os.environ)
    if args.tpu:
        env.pop("JAX_PLATFORMS", None)  # let axon claim the TPU
    t0 = time.time()
    # CPU runs MUST pin via --platform (jax.config.update before the
    # first op): the sandbox sitecustomize rewrites JAX_PLATFORMS to
    # "axon,cpu" in every process, so the env var alone silently
    # queues the run behind a TPU claim.
    r = subprocess.run(
        [sys.executable, "-m", "voxelslam_tpu.cli", "run", ds,
         "--config", os.path.join(ds, "config.yaml"),
         "--gt", os.path.join(args.dir, "stress_gt.npz"), "--finish",
         "--out", os.path.join(args.dir, "session_out")]
        + ([] if args.tpu else ["--platform", "cpu"]),
        cwd=ROOT, env=env, capture_output=True, text=True,
    )
    sys.stderr.write(r.stderr[-4000:])
    print(r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}")
    log(f"full run wall: {time.time() - t0:.0f}s rc={r.returncode}")
    if r.returncode:
        raise SystemExit(r.returncode)


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen", help="generate bag + ground truth")
    a = sub.add_parser("all", help="gen + convert + full-system run")
    for p in (g, a):
        p.add_argument("--dir", default="/tmp/stress")
        p.add_argument("--scans", type=int, default=1050)
        p.add_argument("--seed", type=int, default=31)
        p.add_argument("--lines", type=int, default=96)
        p.add_argument("--cols", type=int, default=300)
        p.add_argument("--max-range", type=float, default=60.0,
                       help="sensor range cap: 60 = continuous "
                            "headline run; 12 = corridor degeneracy "
                            "-> session reset -> re-merge variant")
    a.add_argument("--tpu", action="store_true",
                   help="run the SLAM pass on the TPU (default CPU)")
    g.set_defaults(fn=cmd_gen)
    a.set_defaults(fn=cmd_all)
    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
