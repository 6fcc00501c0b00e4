"""Sensor decoding + scan/IMU synchronization (host shim).

Counterpart of the reference's `Features`/per-sensor handlers
(feature_point.hpp:103-366) and `sync_packages`
(voxelslam.hpp:105-161).  Raw sensor records arrive as numpy
structured arrays (e.g. replayed from npz/rosbag extractions); the
decoders normalize them into (xyz f32, per-point relative offsets,
scan begin time) with the reference's decimation (point_filter_num)
and blind-range culling, preferring the native C++ fast path
(native/decoder.cpp) with a numpy fallback.

Time semantics per sensor (feature_point.hpp):
- LIVOX     : per-point offset_time ns relative to scan begin
- VELODYNE  : float32 `time` seconds; when absent, azimuth
              reconstruction at ω = 3610 deg/s (hpp:101, 200-252)
- OUSTER    : uint32 `t` nanoseconds
- HESAI     : float64 absolute `timestamp` seconds
- ROBOSENSE : float64 absolute; scan stamped by its first point
- TARTANAIR : no per-point time (point_notime)
"""

from __future__ import annotations

from enum import IntEnum
from typing import List, NamedTuple, Optional

import numpy as np

from .. import native


class LidType(IntEnum):
    LIVOX = 0
    VELODYNE = 1
    OUSTER = 2
    HESAI = 3
    ROBOSENSE = 4
    TARTANAIR = 5


class DecodedScan(NamedTuple):
    pts: np.ndarray  # (K, 3) LiDAR-frame
    offsets: np.ndarray  # (K,) seconds from scan begin
    t_begin: float
    t_end: float


_MAX_OFFSET = 0.11  # drop points later than this (voxelslam.hpp:92)


def _np_decode(xyz, offt, blind_sq, filter_num, max_offset):
    xyz = xyz[::max(filter_num, 1)]
    offt = offt[::max(filter_num, 1)]
    r2 = np.sum(xyz * xyz, axis=1)
    ok = (r2 >= blind_sq) & np.isfinite(r2) & (offt >= 0) & (offt <= max_offset)
    xyz = xyz[ok]
    offt = offt[ok]
    order = np.argsort(offt, kind="stable")
    return xyz[order].astype(np.float32), offt[order].astype(np.float32)


def _native_decode(raw: np.ndarray, offs: dict, time_mode: int, t0: float,
                   blind_sq: float, filter_num: int, max_out: int):
    L = native.lib()
    if L is None:
        return None
    raw = np.ascontiguousarray(raw.view(np.uint8)).reshape(len(raw), -1)
    out_xyz = np.empty((max_out, 3), np.float32)
    out_t = np.empty(max_out, np.float32)
    import ctypes

    n = L.decode_points(
        raw.ctypes.data, len(raw), raw.shape[1],
        offs["x"], offs["y"], offs["z"], offs.get("t", 0), time_mode,
        float(t0), float(blind_sq), int(filter_num), _MAX_OFFSET,
        out_xyz.ctypes.data, out_t.ctypes.data, max_out,
    )
    L.sort_by_offset(out_xyz.ctypes.data, out_t.ctypes.data, n)
    return out_xyz[:n], out_t[:n]


def decode(
    lidar_type: LidType,
    data: np.ndarray,
    t_begin: float,
    blind: float = 0.5,
    point_filter_num: int = 3,
    scan_period: float = 0.1,
    max_points: int = 1 << 17,
) -> DecodedScan:
    """Normalize one raw scan.  `data` is a structured numpy array
    whose fields depend on the sensor:
      LIVOX     : x, y, z, offset_time (ns uint32/float)
      VELODYNE  : x, y, z [, time (s f32)]
      OUSTER    : x, y, z, t (ns u32)
      HESAI     : x, y, z, timestamp (abs f64)
      ROBOSENSE : x, y, z, timestamp (abs f64)
      TARTANAIR : x, y, z
    """
    names = data.dtype.names or ()
    bsq = blind * blind
    xyz = np.stack(
        [data["x"], data["y"], data["z"]], axis=1
    ).astype(np.float32)

    if lidar_type == LidType.LIVOX:
        offt = np.asarray(data["offset_time"], np.float64)
        if offt.dtype != np.float64 or offt.max(initial=0) > 10.0:
            offt = offt * 1e-9
        t0, t1 = t_begin, t_begin + scan_period
    elif lidar_type == LidType.VELODYNE:
        if "time" in names:
            offt = np.asarray(data["time"], np.float64)
            # Normalize drivers that emit absolute stamps or
            # end-relative (negative) offsets instead of begin-relative
            # seconds — otherwise the 0 <= offt <= 0.11 cull silently
            # degrades every scan to the 2-point placeholder.
            if offt.size:
                omin = float(offt.min())
                if omin > 1e5:
                    # absolute epoch stamps: rebase to the scan begin
                    offt = offt - min(omin, t_begin)
                elif omin < -1e-6:
                    # end-relative ([-period, 0]): shift to begin-relative
                    offt = offt - omin
        else:
            # azimuth reconstruction fallback (feature_point.hpp:200-252)
            yaw = np.arctan2(xyz[:, 1], xyz[:, 0])
            d = yaw[0] - yaw
            d = np.where(d < 0, d + 2 * np.pi, d)
            offt = d / np.deg2rad(3610.0)
        t0, t1 = t_begin, t_begin + scan_period
    elif lidar_type == LidType.OUSTER:
        offt = np.asarray(data["t"], np.float64) * 1e-9
        t0, t1 = t_begin, t_begin + scan_period
    elif lidar_type in (LidType.HESAI, LidType.ROBOSENSE):
        ts = np.asarray(data["timestamp"], np.float64)
        t0 = float(ts.min()) if lidar_type == LidType.ROBOSENSE else t_begin
        offt = ts - t0
        t1 = t0 + scan_period
    else:  # TARTANAIR: no per-point time (point_notime mode) — the
        # cloud is treated as captured at scan END (the reference skips
        # motion compensation entirely, ekf_imu.hpp:135-136), so the
        # per-point offset is the full scan period and deskew becomes
        # an identity mapping through the scan-end pose.
        offt = np.full(len(xyz), scan_period)
        t0, t1 = t_begin, t_begin + scan_period

    pts, offs = _np_decode(xyz, offt, bsq, point_filter_num, _MAX_OFFSET)
    if len(pts) == 0:
        # empty-scan placeholder (voxelslam.hpp:96-101)
        pts = np.zeros((2, 3), np.float32)
        pts[:, 0] = 100.0
        offs = np.zeros(2, np.float32)
    return DecodedScan(pts[:max_points], offs[:max_points], t0, t1)


def decode_raw_native(
    lidar_type: LidType, raw: np.ndarray, field_offsets: dict,
    t_begin: float, blind: float = 0.5, point_filter_num: int = 3,
    scan_period: float = 0.1, max_points: int = 1 << 17,
) -> Optional[DecodedScan]:
    """Zero-copy native decode of packed binary records (the C++ fast
    path).  `field_offsets`: {"x":0,"y":4,"z":8,"t":16}; returns None
    when the native library is unavailable."""
    mode = {
        LidType.LIVOX: 1,
        LidType.VELODYNE: 0 if "t" in field_offsets else 3,
        LidType.OUSTER: 1,
        LidType.HESAI: 2,
        LidType.ROBOSENSE: 2,
        LidType.TARTANAIR: 3,
    }[lidar_type]
    out = _native_decode(
        raw, field_offsets, mode, t_begin, blind * blind,
        point_filter_num, max_points,
    )
    if out is None:
        return None
    pts, offs = out
    return DecodedScan(pts, offs, t_begin, t_begin + scan_period)


class ScanSync:
    """Pair each decoded scan with its IMU span (sync_packages,
    voxelslam.hpp:105-161): a scan is released once IMU data covers
    its end time; requires > 4 IMU samples in the span.

    Arrival order is NOT assumed: live transports (UDP, multi-queue
    ROS executors) interleave IMU and scan messages out of order
    within the sync window — both buffers re-sort lazily when a
    regression is observed, so the released (scan, imu span) tuples
    are identical to the in-order replay."""

    def __init__(self, min_imu: int = 5, holdback: float = 0.0):
        self.scans: List[DecodedScan] = []
        self.imu_t: List[float] = []
        self.imu_gyr: List[np.ndarray] = []
        self.imu_acc: List[np.ndarray] = []
        self.min_imu = min_imu
        # release margin for out-of-order transports: a scan is held
        # until IMU time reaches t_end + holdback, so a late-arriving
        # sample INSIDE the span (a gap at release time) cannot be
        # missed.  Set to the transport's disorder window; 0 for
        # in-order feeds (the reference's ROS queues are in-order per
        # topic, voxelslam.hpp:105-161).
        self.holdback = holdback
        self._t_prev_end: Optional[float] = None
        self._imu_sorted = True
        self._scans_sorted = True

    def push_imu(self, t: float, gyr, acc):
        t = float(t)
        if self.imu_t and t < self.imu_t[-1]:
            self._imu_sorted = False
        self.imu_t.append(t)
        self.imu_gyr.append(np.asarray(gyr, np.float64))
        self.imu_acc.append(np.asarray(acc, np.float64))

    def push_scan(self, scan: DecodedScan):
        if self.scans and scan.t_begin < self.scans[-1].t_begin:
            self._scans_sorted = False
        self.scans.append(scan)

    def _ensure_sorted(self):
        if not self._imu_sorted:
            order = np.argsort(np.asarray(self.imu_t), kind="stable")
            self.imu_t = [self.imu_t[i] for i in order]
            self.imu_gyr = [self.imu_gyr[i] for i in order]
            self.imu_acc = [self.imu_acc[i] for i in order]
            self._imu_sorted = True
        if not self._scans_sorted:
            self.scans.sort(key=lambda s: s.t_begin)
            self._scans_sorted = True

    def pop(self, final: bool = False) -> Optional[tuple]:
        """Next synchronized (scan, imu_t, imu_gyr, imu_acc) or None.

        `final=True` ignores the holdback margin (end of stream: no
        further messages can fill a gap)."""
        if not self.scans or not self.imu_t:
            return None
        self._ensure_sorted()
        sc = self.scans[0]
        slack = 0.0 if final else self.holdback
        if self.imu_t[-1] < sc.t_end + slack:
            return None
        t_lo = (self._t_prev_end if self._t_prev_end is not None
                else sc.t_begin) - 0.5
        ts = np.asarray(self.imu_t)
        sel = (ts >= t_lo) & (ts <= sc.t_end + 0.05)
        if sel.sum() <= self.min_imu - 1:
            self.scans.pop(0)
            return None
        self.scans.pop(0)
        self._t_prev_end = sc.t_end
        # trim consumed imu history (keep 1 s margin)
        keep_from = np.searchsorted(ts, sc.t_end - 1.0)
        self.imu_t = self.imu_t[keep_from:]
        self.imu_gyr = self.imu_gyr[keep_from:]
        self.imu_acc = self.imu_acc[keep_from:]
        return (
            sc,
            np.asarray(self.imu_t),
            np.stack(self.imu_gyr) if self.imu_gyr else np.zeros((0, 3)),
            np.stack(self.imu_acc) if self.imu_acc else np.zeros((0, 3)),
        )
