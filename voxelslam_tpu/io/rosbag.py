"""Minimal pure-Python ROS1 bag (v2.0) reader + writer.

The reference's entire validation story is rosbag replay
(/root/reference/README.md:41-157); its decoders consume
`sensor_msgs/Imu`, `sensor_msgs/PointCloud2` and
`livox_ros_driver/CustomMsg` from ROS topics
(voxelslam.hpp:52-103, feature_point.hpp:142-366).  This module reads
those message types straight from `.bag` files with no ROS
installation, so `scripts/convert_bag.py` can turn any of the
BASELINE datasets (HILTI site1, MARS HKisland03/AMvalley03,
campus_elevator, jungle_challenge) into the npz replay layout the CLI
ingests.

Bag format (http://wiki.ros.org/Bags/Format/2.0):
  "#ROSBAG V2.0\n" then records of
      <u32 header_len> <header> <u32 data_len> <data>
  header = fields of <u32 len> name=value.
  op=0x03 bag header, 0x05 chunk (holds nested records; compression
  none/bz2/lz4), 0x07 connection, 0x02 message data, 0x04 index,
  0x06 chunk info.

The reader scans sequentially and descends into chunks — index
records are ignored, so truncated/unindexed bags still read.  The
writer emits a single uncompressed chunk; it exists for round-trip
tests and for recording replay logs.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional

import numpy as np

_U32 = struct.Struct("<I")

OP_MSG = 0x02
OP_BAGHDR = 0x03
OP_INDEX = 0x04
OP_CHUNK = 0x05
OP_CHUNKINFO = 0x06
OP_CONNECTION = 0x07


def _parse_header(buf: bytes) -> dict:
    out = {}
    o = 0
    while o < len(buf):
        (n,) = _U32.unpack_from(buf, o)
        o += 4
        f = buf[o : o + n]
        o += n
        k, _, v = f.partition(b"=")
        out[k.decode()] = v
    return out


def _serialize_header(fields: dict) -> bytes:
    parts = []
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        parts.append(_U32.pack(len(f)) + f)
    return b"".join(parts)


@dataclass
class Connection:
    conn_id: int
    topic: str
    msg_type: str
    md5sum: str = ""
    message_definition: str = ""


@dataclass
class RawMessage:
    topic: str
    msg_type: str
    t: float  # record receive time (s)
    data: bytes  # serialized message body


def _iter_records(buf: bytes, offset: int = 0) -> Iterator[tuple]:
    o = offset
    n = len(buf)
    while o + 8 <= n:
        (hlen,) = _U32.unpack_from(buf, o)
        o += 4
        hdr = _parse_header(buf[o : o + hlen])
        o += hlen
        (dlen,) = _U32.unpack_from(buf, o)
        o += 4
        data = buf[o : o + dlen]
        o += dlen
        yield hdr, data


def _decompress(comp: str, data: bytes, size: int) -> bytes:
    if comp in ("none", ""):
        return data
    if comp == "bz2":
        import bz2

        return bz2.decompress(data)
    if comp == "lz4":
        try:
            import lz4.frame  # type: ignore

            return lz4.frame.decompress(data)
        except ImportError as e:
            raise RuntimeError(
                "bag uses lz4 chunks but the lz4 module is unavailable; "
                "re-record with bz2/none compression"
            ) from e
    raise ValueError(f"unknown chunk compression {comp!r}")


def read_messages(
    path: str,
    topics: Optional[set] = None,
    progress: Optional[Callable[[int, int], None]] = None,
) -> Iterator[RawMessage]:
    """Stream RawMessages in file order (== chunk/time order for bags
    written by rosbag record)."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"not a ROS bag v2.0: {magic!r}")
        buf = f.read()

    conns: dict[int, Connection] = {}

    def handle(hdr: dict, data: bytes) -> Iterator[RawMessage]:
        op = hdr["op"][0]
        if op == OP_CONNECTION:
            (cid,) = _U32.unpack_from(hdr["conn"], 0)
            ch = _parse_header(data)
            conns[cid] = Connection(
                conn_id=cid,
                topic=hdr["topic"].decode(),
                msg_type=ch.get("type", b"").decode(),
                md5sum=ch.get("md5sum", b"").decode(),
                message_definition=ch.get(
                    "message_definition", b""
                ).decode(errors="replace"),
            )
        elif op == OP_MSG:
            (cid,) = _U32.unpack_from(hdr["conn"], 0)
            secs, nsecs = struct.unpack_from("<II", hdr["time"], 0)
            c = conns.get(cid)
            if c is None:
                return
            if topics is None or c.topic in topics:
                yield RawMessage(
                    c.topic, c.msg_type, secs + nsecs * 1e-9, data
                )
        elif op == OP_CHUNK:
            comp = hdr["compression"].decode()
            (size,) = _U32.unpack_from(hdr["size"], 0)
            inner = _decompress(comp, data, size)
            for h2, d2 in _iter_records(inner):
                yield from handle(h2, d2)

    done = 0
    total = len(buf)
    for hdr, data in _iter_records(buf):
        yield from handle(hdr, data)
        done += 1
        if progress is not None and done % 64 == 0:
            progress(done, total)


def connections(path: str) -> list:
    """List (topic, msg_type) pairs present in the bag."""
    seen = {}
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#ROSBAG V2.0"):
            raise ValueError(f"not a ROS bag v2.0: {magic!r}")
        buf = f.read()

    def walk(records):
        for hdr, data in records:
            op = hdr["op"][0]
            if op == OP_CONNECTION:
                ch = _parse_header(data)
                seen[hdr["topic"].decode()] = ch.get("type", b"").decode()
            elif op == OP_CHUNK:
                comp = hdr["compression"].decode()
                (size,) = _U32.unpack_from(hdr["size"], 0)
                walk(_iter_records(_decompress(comp, data, size)))

    walk(_iter_records(buf))
    return sorted(seen.items())


# ------------------------------------------------------- deserialization

def _read_string(buf: bytes, o: int) -> tuple[str, int]:
    (n,) = _U32.unpack_from(buf, o)
    o += 4
    return buf[o : o + n].decode(errors="replace"), o + n


def _skip_ros_header(buf: bytes, o: int = 0) -> tuple[float, int]:
    """std_msgs/Header: seq u32, stamp (secs u32, nsecs u32), frame_id
    string.  Returns (stamp seconds, new offset)."""
    seq, secs, nsecs = struct.unpack_from("<III", buf, o)
    o += 12
    _, o = _read_string(buf, o)
    return secs + nsecs * 1e-9, o


def parse_imu(data: bytes) -> tuple[float, np.ndarray, np.ndarray]:
    """sensor_msgs/Imu -> (stamp, gyr (3,), acc (3,))."""
    t, o = _skip_ros_header(data)
    o += 4 * 8 + 9 * 8  # orientation quat + its covariance
    gyr = np.frombuffer(data, np.float64, 3, o)
    o += 3 * 8 + 9 * 8
    acc = np.frombuffer(data, np.float64, 3, o)
    return t, gyr.copy(), acc.copy()


_PF_DTYPES = {
    1: np.int8, 2: np.uint8, 3: np.int16, 4: np.uint16,
    5: np.int32, 6: np.uint32, 7: np.float32, 8: np.float64,
}


def parse_pointcloud2(data: bytes) -> tuple[float, np.ndarray]:
    """sensor_msgs/PointCloud2 -> (stamp, structured array over the
    declared fields; padding between fields preserved via itemsize)."""
    t, o = _skip_ros_header(data)
    height, width = struct.unpack_from("<II", data, o)
    o += 8
    (nf,) = _U32.unpack_from(data, o)
    o += 4
    names, formats, offsets = [], [], []
    for _ in range(nf):
        name, o = _read_string(data, o)
        f_off, dt, cnt = struct.unpack_from("<IBI", data, o)
        o += 9
        base = _PF_DTYPES[dt]
        names.append(name)
        formats.append(base if cnt == 1 else (base, (cnt,)))
        offsets.append(f_off)
    is_bigendian = data[o]
    o += 1
    point_step, row_step = struct.unpack_from("<II", data, o)
    o += 8
    (dlen,) = _U32.unpack_from(data, o)
    o += 4
    if is_bigendian:
        raise ValueError("big-endian PointCloud2 not supported")
    dtype = np.dtype(
        {"names": names, "formats": formats, "offsets": offsets,
         "itemsize": point_step}
    )
    if height > 1 and row_step != width * point_step:
        # organized cloud with per-row padding: de-pad row by row
        # before the flat frombuffer (itemsize=point_step would
        # otherwise stride into the padding and yield garbage points)
        raw = np.frombuffer(data, np.uint8, height * row_step, o)
        raw = raw.reshape(height, row_step)[:, : width * point_step]
        arr = np.frombuffer(raw.tobytes(), dtype, height * width)
        return t, arr.copy()
    n = min(height * width, dlen // point_step)
    arr = np.frombuffer(data, dtype, n, o)
    return t, arr.copy()


def parse_livox_custom(data: bytes) -> tuple[float, np.ndarray]:
    """livox_ros_driver/CustomMsg -> (timebase seconds, structured
    array with x, y, z f32 + offset_time u32 ns + line u8)."""
    _, o = _skip_ros_header(data)
    (timebase,) = struct.unpack_from("<Q", data, o)
    o += 8
    (pnum,) = _U32.unpack_from(data, o)
    o += 4
    o += 1 + 3  # lidar_id + rsvd
    (alen,) = _U32.unpack_from(data, o)
    o += 4
    pt = np.dtype(
        {
            "names": ["offset_time", "x", "y", "z", "reflectivity",
                      "tag", "line"],
            "formats": [np.uint32, np.float32, np.float32, np.float32,
                        np.uint8, np.uint8, np.uint8],
            "offsets": [0, 4, 8, 12, 16, 17, 18],
            "itemsize": 19,
        }
    )
    arr = np.frombuffer(data, pt, min(alen, pnum), o)
    return timebase * 1e-9, arr.copy()


# --------------------------------------------------------------- writer

class BagWriter:
    """Minimal v2.0 writer (one uncompressed chunk, no index records —
    rosbag tools would call it unindexed; `read_messages` above and
    `rosbag reindex` both accept it)."""

    def __init__(self, path: str):
        self.f = open(path, "wb")
        self.f.write(b"#ROSBAG V2.0\n")
        # bag header record padded to 4096 like rosbag does
        hdr = _serialize_header(
            {
                "op": bytes([OP_BAGHDR]),
                "index_pos": struct.pack("<Q", 0),
                "conn_count": _U32.pack(0),
                "chunk_count": _U32.pack(1),
            }
        )
        pad = 4096 - len(hdr) - 8
        self.f.write(_U32.pack(len(hdr)) + hdr)
        self.f.write(_U32.pack(pad) + b" " * pad)
        self._chunk = bytearray()
        self._conns: dict[str, int] = {}

    def _record(self, fields: dict, data: bytes):
        hdr = _serialize_header(fields)
        self._chunk += _U32.pack(len(hdr)) + hdr
        self._chunk += _U32.pack(len(data)) + data

    def connection(self, topic: str, msg_type: str, md5sum: str = "*"):
        if topic in self._conns:
            return self._conns[topic]
        cid = len(self._conns)
        self._conns[topic] = cid
        ch = _serialize_header(
            {
                "topic": topic.encode(),
                "type": msg_type.encode(),
                "md5sum": md5sum.encode(),
                "message_definition": b"",
            }
        )
        self._record(
            {
                "op": bytes([OP_CONNECTION]),
                "conn": _U32.pack(cid),
                "topic": topic.encode(),
            },
            ch,
        )
        return cid

    def write(self, topic: str, msg_type: str, t: float, data: bytes):
        cid = self._conns.get(topic)
        if cid is None:
            cid = self.connection(topic, msg_type)
        secs = int(t)
        nsecs = int(round((t - secs) * 1e9))
        self._record(
            {
                "op": bytes([OP_MSG]),
                "conn": _U32.pack(cid),
                "time": struct.pack("<II", secs, nsecs),
            },
            data,
        )

    def close(self):
        chunk = bytes(self._chunk)
        hdr = _serialize_header(
            {
                "op": bytes([OP_CHUNK]),
                "compression": b"none",
                "size": _U32.pack(len(chunk)),
            }
        )
        self.f.write(_U32.pack(len(hdr)) + hdr)
        self.f.write(_U32.pack(len(chunk)) + chunk)
        self.f.close()


# ----------------------------------------------------- message builders

def serialize_imu(stamp: float, gyr, acc) -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    out = struct.pack("<III", 0, secs, nsecs) + _U32.pack(0)  # header
    out += struct.pack("<4d", 0.0, 0.0, 0.0, 1.0) + b"\0" * 72
    out += struct.pack("<3d", *np.asarray(gyr, np.float64)) + b"\0" * 72
    out += struct.pack("<3d", *np.asarray(acc, np.float64)) + b"\0" * 72
    return out


def serialize_pointcloud2(stamp: float, arr: np.ndarray) -> bytes:
    """Structured array -> PointCloud2 (1 x N, row-major)."""
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    out = struct.pack("<III", 0, secs, nsecs) + _U32.pack(0)
    out += struct.pack("<II", 1, len(arr))
    names = arr.dtype.names
    out += _U32.pack(len(names))
    inv = {np.dtype(v): k for k, v in _PF_DTYPES.items()}
    for nm in names:
        dt, off = arr.dtype.fields[nm][:2]
        out += _U32.pack(len(nm)) + nm.encode()
        out += struct.pack("<IBI", off, inv[dt.base], 1)
    raw = arr.tobytes()
    out += b"\0"  # little-endian
    out += struct.pack("<II", arr.dtype.itemsize, len(raw))
    out += _U32.pack(len(raw)) + raw
    out += b"\1"  # is_dense
    return out


def serialize_livox_custom(timebase: float, arr: np.ndarray) -> bytes:
    out = struct.pack("<III", 0, int(timebase),
                      int(round((timebase % 1.0) * 1e9))) + _U32.pack(0)
    out += struct.pack("<Q", int(round(timebase * 1e9)))
    out += _U32.pack(len(arr))
    out += bytes(4)  # lidar_id + rsvd
    out += _U32.pack(len(arr))
    pt = np.dtype(
        {
            "names": ["offset_time", "x", "y", "z", "reflectivity",
                      "tag", "line"],
            "formats": [np.uint32, np.float32, np.float32, np.float32,
                        np.uint8, np.uint8, np.uint8],
            "offsets": [0, 4, 8, 12, 16, 17, 18],
            "itemsize": 19,
        }
    )
    packed = np.zeros(len(arr), pt)
    for nm in pt.names:
        if nm in (arr.dtype.names or ()):
            packed[nm] = arr[nm]
    out += packed.tobytes()
    return out
