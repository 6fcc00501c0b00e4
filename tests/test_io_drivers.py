"""Sensor decoder + native fast-path + scan sync tests."""

import numpy as np
import pytest

from voxelslam_tpu import native
from voxelslam_tpu.io import drivers
from voxelslam_tpu.io.drivers import LidType


def _velodyne_scan(n=1000, with_time=True, rng=None):
    rng = rng or np.random.default_rng(0)
    fields = [("x", "f4"), ("y", "f4"), ("z", "f4"), ("intensity", "f4")]
    if with_time:
        fields.append(("time", "f4"))
    data = np.zeros(n, dtype=fields)
    ang = np.linspace(0, 2 * np.pi * 0.99, n)
    r = rng.uniform(2, 30, n)
    data["x"] = r * np.cos(-ang)  # clockwise spin
    data["y"] = r * np.sin(-ang)
    data["z"] = rng.uniform(-2, 2, n)
    if with_time:
        data["time"] = np.linspace(0, 0.099, n)
    return data


class TestDecoders:
    def test_velodyne_with_time(self):
        data = _velodyne_scan()
        sc = drivers.decode(LidType.VELODYNE, data, 100.0,
                            blind=0.5, point_filter_num=2)
        assert sc.t_begin == 100.0
        assert len(sc.pts) == len(sc.offsets)
        assert (np.diff(sc.offsets) >= 0).all()  # sorted by time
        assert (np.linalg.norm(sc.pts, axis=1) >= 0.5).all()

    def test_velodyne_absolute_time_normalized(self):
        """Drivers emitting absolute per-point stamps (not
        begin-relative offsets) must be rebased, not culled to the
        2-point placeholder."""
        data = _velodyne_scan()
        abs_data = np.zeros(len(data), dtype=[
            ("x", "f4"), ("y", "f4"), ("z", "f4"), ("time", "f8")])
        for f in ("x", "y", "z"):
            abs_data[f] = data[f]
        t_begin = 1.7e9  # epoch-like
        abs_data["time"] = t_begin + np.linspace(0, 0.099, len(data))
        sc = drivers.decode(LidType.VELODYNE, abs_data, t_begin,
                            blind=0.5, point_filter_num=2)
        assert len(sc.pts) > 100  # not the placeholder
        assert sc.offsets.min() >= 0 and sc.offsets.max() <= 0.11

    def test_velodyne_end_relative_time_normalized(self):
        """Negative (scan-end-relative) offsets are shifted to
        begin-relative."""
        data = _velodyne_scan()
        data["time"] = np.linspace(-0.099, 0.0, len(data))
        sc = drivers.decode(LidType.VELODYNE, data, 100.0,
                            blind=0.5, point_filter_num=2)
        assert len(sc.pts) > 100
        assert sc.offsets.min() >= 0 and sc.offsets.max() <= 0.11

    def test_velodyne_azimuth_fallback(self):
        data = _velodyne_scan(with_time=False)
        sc = drivers.decode(LidType.VELODYNE, data, 100.0, point_filter_num=1)
        # azimuth reconstruction: offsets increase with index
        assert sc.offsets.max() > 0.05
        assert (sc.offsets >= 0).all()

    def test_livox_ns_offsets(self):
        n = 500
        data = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                  ("offset_time", "u4")])
        data["x"] = np.linspace(5, 30, n)
        data["offset_time"] = np.linspace(0, 99e6, n).astype(np.uint32)
        sc = drivers.decode(LidType.LIVOX, data, 7.0, point_filter_num=1)
        assert abs(sc.offsets.max() - 0.099) < 1e-3

    def test_hesai_absolute(self):
        n = 300
        data = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                  ("timestamp", "f8")])
        data["x"] = 10.0
        data["timestamp"] = 1000.0 + np.linspace(0, 0.1, n)
        sc = drivers.decode(LidType.HESAI, data, 1000.0, point_filter_num=1)
        assert sc.offsets.max() <= drivers._MAX_OFFSET

    def test_blind_cull(self):
        n = 100
        data = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
        data["x"][:50] = 0.1  # inside blind radius
        data["x"][50:] = 10.0
        sc = drivers.decode(LidType.TARTANAIR, data, 0.0, blind=0.5,
                            point_filter_num=1)
        assert len(sc.pts) == 50

    def test_empty_scan_placeholder(self):
        data = np.zeros(4, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4")])
        sc = drivers.decode(LidType.TARTANAIR, data, 0.0, blind=1.0,
                            point_filter_num=1)
        assert len(sc.pts) == 2  # reference's 2-dummy-point placeholder


class TestNative:
    def test_build_and_match_numpy(self):
        if native.lib() is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(1)
        n = 2000
        raw = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"),
                                 ("i", "f4"), ("time", "f4")])
        raw["x"] = rng.uniform(-30, 30, n)
        raw["y"] = rng.uniform(-30, 30, n)
        raw["z"] = rng.uniform(-3, 3, n)
        raw["time"] = rng.uniform(0, 0.1, n)
        sc_native = drivers.decode_raw_native(
            LidType.VELODYNE, raw,
            {"x": 0, "y": 4, "z": 8, "t": 16},
            5.0, blind=0.5, point_filter_num=3,
        )
        assert sc_native is not None
        sc_np = drivers.decode(LidType.VELODYNE, raw, 5.0, blind=0.5,
                               point_filter_num=3)
        assert len(sc_native.pts) == len(sc_np.pts)
        np.testing.assert_allclose(
            np.sort(sc_native.offsets), np.sort(sc_np.offsets), atol=1e-6
        )
        np.testing.assert_allclose(
            sc_native.pts.sum(axis=0), sc_np.pts.sum(axis=0), rtol=1e-4
        )

    def test_voxel_centroid_matches_device_average(self):
        """Host centroid reduce == device voxel_average (the keyframe
        program's pre-reduce path, manager._build_keyframe): same
        cells, same centroids up to f32 summation order."""
        L = native.lib()
        if L is None or not hasattr(L, "voxel_centroid"):
            pytest.skip("native voxel_centroid unavailable")
        import jax.numpy as jnp

        from voxelslam_tpu.ops import downsample

        rng = np.random.default_rng(7)
        n, cell = 4096, 0.25
        pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
        host = native.voxel_centroid(pts, cell, n)
        assert isinstance(host, np.ndarray)
        ds = downsample.voxel_average(
            jnp.asarray(pts), jnp.ones(n, bool), cell, n
        )
        dev = np.asarray(ds.pts)[np.asarray(ds.mask)]
        assert len(host) == len(dev)

        def keyed(a):
            k = np.floor(a / cell).astype(np.int64)
            order = np.lexsort((k[:, 2], k[:, 1], k[:, 0]))
            return a[order]

        np.testing.assert_allclose(keyed(host), keyed(dev), atol=1e-4)

    def test_voxel_centroid_overflow(self):
        L = native.lib()
        if L is None or not hasattr(L, "voxel_centroid"):
            pytest.skip("native voxel_centroid unavailable")
        rng = np.random.default_rng(3)
        pts = rng.uniform(-50, 50, (512, 3)).astype(np.float32)
        # 512 well-spread points at a fine cell: > 16 distinct cells
        assert native.voxel_centroid(pts, 0.01, 16) == "overflow"


class TestScanSync:
    def test_sync_releases_when_covered(self):
        sync = drivers.ScanSync()
        sc = drivers.DecodedScan(
            np.zeros((10, 3), np.float32), np.zeros(10, np.float32),
            1.0, 1.1,
        )
        sync.push_scan(sc)
        assert sync.pop() is None  # no imu yet
        for t in np.arange(0.5, 1.05, 0.01):
            sync.push_imu(t, np.zeros(3), np.zeros(3))
        assert sync.pop() is None  # imu not past scan end
        for t in np.arange(1.05, 1.2, 0.01):
            sync.push_imu(t, np.zeros(3), np.zeros(3))
        out = sync.pop()
        assert out is not None
        sc2, ts, gyr, acc = out
        assert ts[-1] >= 1.1

    def test_sync_requires_min_imu(self):
        sync = drivers.ScanSync()
        sc = drivers.DecodedScan(
            np.zeros((10, 3), np.float32), np.zeros(10, np.float32),
            1.0, 1.1,
        )
        sync.push_scan(sc)
        for t in [0.99, 1.2]:
            sync.push_imu(t, np.zeros(3), np.zeros(3))
        assert sync.pop() is None  # dropped: too few imu samples
        assert len(sync.scans) == 0
