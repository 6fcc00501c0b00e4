"""ROS1 bag reader/writer round-trip + bag->npz conversion.

The writer synthesizes a realistic bag (Imu + PointCloud2 + livox
CustomMsg records in chunks); the reader and `scripts/convert_bag.py`
must reproduce the payloads exactly — this validates the real-data
ingestion path end to end without a ROS installation."""

import bz2
import os
import struct

import numpy as np
import pytest

from voxelslam_tpu.io import drivers, rosbag
from voxelslam_tpu.io.drivers import LidType


def _velodyne_cloud(n, rng):
    arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                             ("intensity", "f4"), ("time", "f4"),
                             ("ring", "u2")])
    ang = np.linspace(0, 2 * np.pi * 0.99, n)
    r = rng.uniform(2, 30, n)
    arr["x"] = r * np.cos(ang)
    arr["y"] = r * np.sin(ang)
    arr["z"] = rng.uniform(-2, 2, n)
    arr["time"] = np.linspace(0, 0.099, n)
    arr["ring"] = np.arange(n) % 16
    return arr


def _write_demo_bag(path, rng, n_scans=3, imu_hz=100.0, t0=1000.0):
    w = rosbag.BagWriter(path)
    clouds = []
    for k in range(n_scans):
        t = t0 + 0.1 * k
        cloud = _velodyne_cloud(600, rng)
        clouds.append((t, cloud))
        w.write("/velodyne_points", "sensor_msgs/PointCloud2", t,
                rosbag.serialize_pointcloud2(t, cloud))
        for j in range(int(0.1 * imu_hz)):
            ti = t + j / imu_hz
            w.write("/imu/data", "sensor_msgs/Imu", ti,
                    rosbag.serialize_imu(ti, [0.0, 0.0, 0.1],
                                         [0.0, 0.0, 9.81]))
    w.close()
    return clouds


class TestRoundTrip:
    def test_pointcloud2_and_imu(self, tmp_path):
        rng = np.random.default_rng(0)
        bag = str(tmp_path / "demo.bag")
        clouds = _write_demo_bag(bag, rng)

        topics = rosbag.connections(bag)
        assert ("/imu/data", "sensor_msgs/Imu") in topics
        assert ("/velodyne_points", "sensor_msgs/PointCloud2") in topics

        got_clouds, got_imu = [], []
        for m in rosbag.read_messages(bag):
            if m.msg_type == "sensor_msgs/PointCloud2":
                got_clouds.append(rosbag.parse_pointcloud2(m.data))
            else:
                got_imu.append(rosbag.parse_imu(m.data))
        assert len(got_clouds) == len(clouds)
        for (t_ref, c_ref), (t_got, c_got) in zip(clouds, got_clouds):
            assert abs(t_got - t_ref) < 1e-6
            for f in ("x", "y", "z", "time", "ring"):
                np.testing.assert_array_equal(c_got[f], c_ref[f])
        assert len(got_imu) == 30
        t, gyr, acc = got_imu[0]
        np.testing.assert_allclose(gyr, [0.0, 0.0, 0.1])
        np.testing.assert_allclose(acc, [0.0, 0.0, 9.81])

    def test_livox_custommsg(self, tmp_path):
        rng = np.random.default_rng(1)
        n = 400
        arr = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                 ("offset_time", "u4")])
        arr["x"] = rng.uniform(-10, 10, n)
        arr["y"] = rng.uniform(-10, 10, n)
        arr["z"] = rng.uniform(-2, 2, n)
        arr["offset_time"] = np.linspace(0, 99e6, n).astype(np.uint32)
        bag = str(tmp_path / "livox.bag")
        w = rosbag.BagWriter(bag)
        w.write("/livox/lidar", "livox_ros_driver/CustomMsg", 2000.0,
                rosbag.serialize_livox_custom(2000.0, arr))
        w.close()
        msgs = list(rosbag.read_messages(bag))
        assert len(msgs) == 1
        tb, got = rosbag.parse_livox_custom(msgs[0].data)
        assert abs(tb - 2000.0) < 1e-6
        np.testing.assert_array_equal(got["x"], arr["x"])
        np.testing.assert_array_equal(got["offset_time"], arr["offset_time"])
        # decode path consumes the parsed array directly
        sc = drivers.decode(LidType.LIVOX, got, tb, point_filter_num=1)
        assert len(sc.pts) > 100

    def test_bz2_chunk(self, tmp_path):
        """Reader must decompress bz2 chunks (rosbag's default
        compression for recorded datasets)."""
        rng = np.random.default_rng(2)
        bag = str(tmp_path / "plain.bag")
        _write_demo_bag(bag, rng, n_scans=1)
        # recompress the chunk record as bz2
        with open(bag, "rb") as f:
            f.readline()
            raw = f.read()
        recs = list(rosbag._iter_records(raw))
        out = bytearray(b"#ROSBAG V2.0\n")
        for hdr_dict, data in recs:
            if hdr_dict["op"][0] == rosbag.OP_CHUNK:
                cdata = bz2.compress(data)
                hdr = rosbag._serialize_header({
                    "op": bytes([rosbag.OP_CHUNK]),
                    "compression": b"bz2",
                    "size": struct.pack("<I", len(data)),
                })
            else:
                hdr = rosbag._serialize_header(
                    {k: v for k, v in hdr_dict.items()}
                )
                cdata = data
            out += struct.pack("<I", len(hdr)) + hdr
            out += struct.pack("<I", len(cdata)) + cdata
        bag2 = str(tmp_path / "bz2.bag")
        with open(bag2, "wb") as f:
            f.write(bytes(out))
        msgs = [m for m in rosbag.read_messages(bag2)
                if m.msg_type == "sensor_msgs/PointCloud2"]
        assert len(msgs) == 1
        _, cloud = rosbag.parse_pointcloud2(msgs[0].data)
        assert len(cloud) == 600


class TestConvertBag:
    def test_bag_to_npz_dataset(self, tmp_path):
        import importlib.util

        rng = np.random.default_rng(3)
        bag = str(tmp_path / "seq.bag")
        _write_demo_bag(bag, rng, n_scans=4)
        out = str(tmp_path / "dataset")

        spec = importlib.util.spec_from_file_location(
            "convert_bag",
            os.path.join(os.path.dirname(__file__), "..", "scripts",
                         "convert_bag.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        rc = mod.main([
            bag, out,
            "--lidar-topic", "/velodyne_points",
            "--imu-topic", "/imu/data",
            "--lidar-type", "VELODYNE",
            "--filter-num", "1",
        ])
        assert rc == 0
        imu = np.load(os.path.join(out, "imu.npz"))
        assert imu["t"].shape[0] == 40
        assert (np.diff(imu["t"]) >= 0).all()
        import glob

        scans = sorted(glob.glob(os.path.join(out, "scans", "*.npz")))
        assert len(scans) == 4
        d = np.load(scans[0])
        assert d["pts"].shape[0] > 100
        assert d["pts"].shape[0] == d["offsets"].shape[0]
        assert 0 <= d["offsets"].min() and d["offsets"].max() <= 0.11
