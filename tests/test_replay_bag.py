"""End-to-end replay from an actual ROS1 bag file — the reference's
validation protocol (rosbag play, README.md:41-62) with a
deterministic sensor-faithful recording (no egress: real datasets
cannot be downloaded here, so the bag is synthesized through the real
serialization path by scripts/make_replay_bag.py): spinning-Velodyne
PointCloud2 (ring + time fields, azimuth order, range noise) + biased
noisy 200 Hz IMU.  The full chain bag → convert_bag.py → npz replay →
VoxelSLAM must track with bounded ATE."""

import glob
import importlib.util
import os

import numpy as np
import pytest


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bag_replay_end_to_end(tmp_path):
    make_bag = _load("make_replay_bag")
    convert = _load("convert_bag")

    bag = str(tmp_path / "seq.bag")
    rc = make_bag.main([bag, "--scans", "25", "--rings", "16",
                        "--cols", "128"])
    assert rc == 0
    ds = str(tmp_path / "dataset")
    rc = convert.main([
        bag, ds, "--lidar-topic", "/velodyne_points",
        "--imu-topic", "/imu/data", "--lidar-type", "VELODYNE",
        "--filter-num", "1", "--blind", "0.5",
    ])
    assert rc == 0
    assert len(glob.glob(os.path.join(ds, "scans", "*.npz"))) == 25

    from voxelslam_tpu.slam import VoxelSLAM
    from test_e2e import small_config

    cfg = small_config()
    slam = VoxelSLAM(cfg)
    imu = np.load(os.path.join(ds, "imu.npz"))
    for f in sorted(glob.glob(os.path.join(ds, "scans", "*.npz"))):
        d = np.load(f)
        slam.process_scan(
            d["pts"], d["offsets"], float(d["t_begin"]),
            float(d["t_end"]), imu["t"], imu["gyr"], imu["acc"],
        )
    slam.frontend.flush()
    slam._drain()
    assert slam.frontend.phase == "STEADY", slam.frontend.phase

    gt = np.load(os.path.splitext(bag)[0] + "_gt.npz")
    ts, Rs, ps = slam.trajectory()
    errs = []
    for i in range(len(ts)):
        j = int(np.argmin(np.abs(gt["t"] - ts[i])))
        errs.append(np.linalg.norm(ps[i] - gt["p"][j]))
    errs = np.asarray(errs)
    n_tail = max(len(errs) // 2, 1)
    ate_tail = float(np.sqrt(np.mean(errs[-n_tail:] ** 2)))
    assert np.isfinite(errs).all()
    # noisy biased IMU + 1 cm range noise + decimated 2k-ray sensor
    assert ate_tail < 0.12, f"replay ATE tail {ate_tail:.3f} m"
