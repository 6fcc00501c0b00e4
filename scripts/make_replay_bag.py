"""Generate a deterministic sensor-faithful replay bag.

No real dataset can be downloaded in this sandbox (zero egress), so
this synthesizes the closest thing to the reference's rosbag replay
protocol (/root/reference/README.md:41-62): a Velodyne-style spinning
LiDAR (ring + per-point `time` fields, azimuth-ordered points, range
noise) + a 200 Hz IMU stream (bias + noise) recorded as an actual
ROS1 `.bag` through `io/rosbag.BagWriter` — so the full ingestion
chain (bag parse → PointCloud2 decode → feature extraction → SLAM)
runs exactly as it would on a recorded dataset.  Ground truth is
saved alongside for ATE scoring.

    python scripts/make_replay_bag.py out.bag [--scans N] [--rings R]
    python scripts/convert_bag.py out.bag dataset/ \
        --lidar-topic /velodyne_points --imu-topic /imu/data \
        --lidar-type VELODYNE --filter-num 1
    python -m voxelslam_tpu.cli run dataset/
"""

import argparse
import os
import sys

# host-side tool: never claim the TPU (axon registers in every process)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voxelslam_tpu.core import synthetic  # noqa: E402
from voxelslam_tpu.io import rosbag  # noqa: E402


def velodyne_packetize(points, offsets, rng, range_noise=0.0):
    """Arrange raycast points like a spinning Velodyne: sorted by
    per-point time (azimuth order), structured fields x/y/z/intensity/
    time(f32)/ring(u16)."""
    n = len(points)
    order = np.argsort(offsets, kind="stable")
    pts = points[order]
    offt = offsets[order]
    # ring id from elevation angle
    el = np.arctan2(pts[:, 2], np.linalg.norm(pts[:, :2], axis=1))
    nb = 16
    edges = np.linspace(el.min() - 1e-6, el.max() + 1e-6, nb + 1)
    ring = np.clip(np.searchsorted(edges, el) - 1, 0, nb - 1)
    arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("intensity", "f4"), ("time", "f4"),
                             ("ring", "u2")])
    arr["x"], arr["y"], arr["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    arr["intensity"] = rng.uniform(1, 100, n).astype(np.float32)
    arr["time"] = offt.astype(np.float32)
    arr["ring"] = ring.astype(np.uint16)
    return arr


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--scans", type=int, default=80)
    ap.add_argument("--rings", type=int, default=16)
    ap.add_argument("--cols", type=int, default=300)
    ap.add_argument("--seed", type=int, default=21)
    ap.add_argument("--t0", type=float, default=1700000000.0,
                    help="epoch-like bag start time")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    traj = synthetic.Trajectory(
        amp=np.array([1.5, 1.2, 0.3]), ramp=1.5, t_start=1.0
    )
    dirs = synthetic.lidar_dirs(
        n_lines=args.rings, n_cols=args.cols, fov_v=30.0, fov_h=360.0
    )
    data = synthetic.simulate(
        n_scans=args.scans, traj=traj, dirs=dirs,
        world=synthetic.make_room(size=(14.0, 11.0, 5.0), n_boxes=10),
        gyr_noise=1e-3, acc_noise=1e-2,
        gyr_bias=(0.005, -0.003, 0.002), acc_bias=(0.02, -0.01, 0.03),
        range_noise=0.01,
        t0=0.5, seed=args.seed,
    )

    T0 = args.t0 - data.imu_t[0]
    w = rosbag.BagWriter(args.out)
    li = 0
    lidar_msgs = 0
    for i in range(len(data.imu_t)):
        t = data.imu_t[i] + T0
        # interleave lidar scans at their begin times
        while li < len(data.scans) and data.scans[li].t_begin + T0 <= t:
            sc = data.scans[li]
            arr = velodyne_packetize(sc.points, sc.offsets, rng)
            w.write("/velodyne_points", "sensor_msgs/PointCloud2",
                    sc.t_begin + T0,
                    rosbag.serialize_pointcloud2(sc.t_begin + T0, arr))
            li += 1
            lidar_msgs += 1
        w.write("/imu/data", "sensor_msgs/Imu", t,
                rosbag.serialize_imu(t, data.imu_gyr[i], data.imu_acc[i]))
    w.close()

    np.savez_compressed(
        os.path.splitext(args.out)[0] + "_gt.npz",
        t=data.gt_t + T0, R=data.gt_R, p=data.gt_p,
    )
    sz = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out}: {lidar_msgs} scans, "
          f"{len(data.imu_t)} imu msgs, {sz:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
