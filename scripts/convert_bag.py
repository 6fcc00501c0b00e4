"""Convert a ROS1 bag into the npz replay layout `voxelslam_tpu.cli run`
ingests — the counterpart of the reference's rosbag-play protocol
(/root/reference/README.md:41-62: `roslaunch ... && rosbag play ...`).

    python scripts/convert_bag.py <in.bag> <outdir> \
        --lidar-topic /velodyne_points --imu-topic /imu/data \
        --lidar-type VELODYNE [--blind 0.5] [--filter-num 3] \
        [--scan-period 0.1] [--max-scans N]

Topics/types can be listed first with:

    python scripts/convert_bag.py <in.bag> --list

LiDAR types: LIVOX (livox_ros_driver/CustomMsg), VELODYNE, OUSTER,
HESAI, ROBOSENSE, TARTANAIR (PointCloud2).  The decode path is the
same `io/drivers.py` used at runtime (feature_point.hpp parity).
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

from voxelslam_tpu.io import drivers, rosbag  # noqa: E402
from voxelslam_tpu.io.drivers import LidType  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("bag")
    ap.add_argument("outdir", nargs="?")
    ap.add_argument("--list", action="store_true",
                    help="list topics and exit")
    ap.add_argument("--lidar-topic", default=None)
    ap.add_argument("--imu-topic", default=None)
    ap.add_argument("--lidar-type", default="LIVOX",
                    choices=[t.name for t in LidType])
    ap.add_argument("--blind", type=float, default=0.5)
    ap.add_argument("--filter-num", type=int, default=3)
    ap.add_argument("--scan-period", type=float, default=0.1)
    ap.add_argument("--max-scans", type=int, default=0)
    args = ap.parse_args(argv)

    if args.list:
        for topic, mtype in rosbag.connections(args.bag):
            print(f"{topic:40s} {mtype}")
        return 0

    if not (args.outdir and args.lidar_topic and args.imu_topic):
        ap.error("outdir, --lidar-topic and --imu-topic are required")

    ltype = LidType[args.lidar_type]
    os.makedirs(os.path.join(args.outdir, "scans"), exist_ok=True)

    imu_t, imu_gyr, imu_acc = [], [], []
    n_scans = 0
    topics = {args.lidar_topic, args.imu_topic}
    for msg in rosbag.read_messages(args.bag, topics=topics):
        if msg.topic == args.imu_topic:
            t, gyr, acc = rosbag.parse_imu(msg.data)
            imu_t.append(t)
            imu_gyr.append(gyr)
            imu_acc.append(acc)
            continue
        if args.max_scans and n_scans >= args.max_scans:
            continue
        if "CustomMsg" in msg.msg_type or ltype == LidType.LIVOX:
            t0, arr = rosbag.parse_livox_custom(msg.data)
        else:
            t0, arr = rosbag.parse_pointcloud2(msg.data)
        sc = drivers.decode(
            ltype, arr, t0, blind=args.blind,
            point_filter_num=args.filter_num,
            scan_period=args.scan_period,
        )
        np.savez_compressed(
            os.path.join(args.outdir, "scans", f"{n_scans:06d}.npz"),
            pts=sc.pts, offsets=sc.offsets,
            t_begin=sc.t_begin, t_end=sc.t_end,
        )
        n_scans += 1
        if n_scans % 100 == 0:
            print(f"  {n_scans} scans...", file=sys.stderr)

    order = np.argsort(imu_t)
    np.savez_compressed(
        os.path.join(args.outdir, "imu.npz"),
        t=np.asarray(imu_t)[order],
        gyr=np.stack(imu_gyr)[order] if imu_gyr else np.zeros((0, 3)),
        acc=np.stack(imu_acc)[order] if imu_acc else np.zeros((0, 3)),
    )
    print(f"wrote {n_scans} scans + {len(imu_t)} IMU samples to {args.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
