"""Live transport binding: length-prefixed sensor records over a
socket/FIFO → `VoxelSLAM.run_live` feed tuples.

The reference is an online ROS node whose subscribers receive
sensor_msgs over TCPROS (imu_handler/pcl_handler callbacks,
voxelslam.hpp:52-103).  This module is the transport-level
equivalent without ROS: a producer (driver, bag player, another
process) writes framed IMU/scan records to a Unix or TCP socket; the
SLAM process reads them as they arrive and feeds `run_live`, which
does the sync/holdback work (ScanSync = sync_packages,
voxelslam.hpp:105-161).

Wire format (little-endian, self-delimiting):

    frame   := kind:u8  len:u32  payload[len]
    kind I  := imu;  payload = 7 × f64  (t, gyr xyz, acc xyz)
    kind S  := scan; payload = f64 t_begin, f64 t_end, u32 n,
                               n × 4 × f32 rows (x, y, z, offset)
    kind E  := end-of-stream; payload empty

Use `FeedWriter` on the producer side, `read_feed` (a generator of
`run_live` messages) on the consumer side; `serve_feed`/`connect`
wrap socket setup.  `python -m voxelslam_tpu.cli run --listen ADDR`
and `... cli play DATASET --connect ADDR` are the end-to-end pair.
"""

from __future__ import annotations

import os
import socket
import struct
from typing import Iterator, Tuple

import numpy as np

from .drivers import DecodedScan

KIND_IMU = ord("I")
KIND_SCAN = ord("S")
KIND_END = ord("E")

_HDR = struct.Struct("<BI")
_IMU = struct.Struct("<7d")
_SCAN_HDR = struct.Struct("<ddI")


class FeedWriter:
    """Frame sensor records onto any object with .write (socket
    makefile, pipe, file)."""

    def __init__(self, fileobj):
        self._f = fileobj

    def imu(self, t: float, gyr, acc) -> None:
        payload = _IMU.pack(float(t), *map(float, gyr), *map(float, acc))
        self._f.write(_HDR.pack(KIND_IMU, len(payload)))
        self._f.write(payload)

    def scan(self, pts: np.ndarray, offsets: np.ndarray,
             t_begin: float, t_end: float) -> None:
        rows = np.empty((len(pts), 4), np.float32)
        rows[:, :3] = pts
        rows[:, 3] = offsets
        body = rows.tobytes()
        self._f.write(_HDR.pack(
            KIND_SCAN, _SCAN_HDR.size + len(body)
        ))
        self._f.write(_SCAN_HDR.pack(float(t_begin), float(t_end),
                                     len(pts)))
        self._f.write(body)

    def end(self) -> None:
        self._f.write(_HDR.pack(KIND_END, 0))
        self._f.flush()

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        try:
            self._f.close()
        except OSError:
            pass


def _read_exact(f, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = f.read(n - len(buf))
        if not chunk:
            raise EOFError(
                f"transport stream truncated ({len(buf)}/{n} bytes)"
            )
        buf += chunk
    return buf


def read_feed(fileobj) -> Iterator[Tuple[str, object]]:
    """Yield `run_live` feed messages from a framed byte stream until
    an end-of-stream frame or EOF.  EOF at a frame BOUNDARY is a
    normal end (producer died / closed without the E frame); EOF
    inside a frame raises (corrupt transport)."""
    while True:
        try:
            hdr = fileobj.read(_HDR.size)
        except (OSError, ValueError):
            return
        if not hdr:
            return
        if len(hdr) < _HDR.size:
            hdr += _read_exact(fileobj, _HDR.size - len(hdr))
        kind, ln = _HDR.unpack(hdr)
        if kind == KIND_END:
            return
        payload = _read_exact(fileobj, ln)
        if kind == KIND_IMU:
            v = _IMU.unpack(payload)
            yield ("imu", (v[0], np.asarray(v[1:4]), np.asarray(v[4:7])))
        elif kind == KIND_SCAN:
            t_begin, t_end, n = _SCAN_HDR.unpack(
                payload[: _SCAN_HDR.size]
            )
            rows = np.frombuffer(
                payload, np.float32, count=n * 4, offset=_SCAN_HDR.size
            ).reshape(n, 4)
            yield ("scan", DecodedScan(
                pts=rows[:, :3].copy(),
                offsets=rows[:, 3].copy(),
                t_begin=t_begin, t_end=t_end,
            ))
        else:
            raise ValueError(f"unknown transport frame kind {kind:#x}")


def _parse_addr(addr: str):
    """'host:port' → TCP; anything else → Unix-domain socket path."""
    if ":" in addr and not os.path.sep in addr:
        host, port = addr.rsplit(":", 1)
        return (socket.AF_INET, (host or "127.0.0.1", int(port)))
    return (socket.AF_UNIX, addr)


def serve_feed(addr: str, timeout: float | None = None):
    """Listen on `addr`, accept ONE producer, return (feed, close).
    `feed` is a `run_live`-shaped message generator; call `close()`
    when done (also closes the listener)."""
    fam, target = _parse_addr(addr)
    if fam == socket.AF_UNIX and os.path.exists(target):
        os.unlink(target)
    srv = socket.socket(fam, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(target)
    srv.listen(1)
    if timeout is not None:
        srv.settimeout(timeout)
    conn, _ = srv.accept()
    conn.settimeout(None)
    f = conn.makefile("rb")

    def close():
        for o in (f, conn, srv):
            try:
                o.close()
            except OSError:
                pass
        if fam == socket.AF_UNIX and os.path.exists(target):
            os.unlink(target)

    return read_feed(f), close


def connect(addr: str, timeout: float = 30.0) -> FeedWriter:
    """Producer side: connect to a serving SLAM process."""
    import time

    fam, target = _parse_addr(addr)
    deadline = time.time() + timeout
    last = None
    while time.time() < deadline:
        s = socket.socket(fam, socket.SOCK_STREAM)
        try:
            s.connect(target)
            return FeedWriter(s.makefile("wb"))
        except OSError as e:  # listener may not be up yet
            last = e
            s.close()
            time.sleep(0.1)
    raise ConnectionError(f"could not connect to {addr}: {last}")


def play_dataset(dataset: str, writer: FeedWriter,
                 rate: float = 0.0) -> int:
    """Stream a converted dataset (cli convert / convert_bag.py
    layout) through a FeedWriter in arrival-time order — scans are
    published at their sweep END time like a real driver.  rate > 0
    paces wall-clock at `rate`× real time; 0 = as fast as possible.
    Returns the number of scans sent."""
    import glob
    import time

    imu = np.load(os.path.join(dataset, "imu.npz"))
    scan_files = sorted(glob.glob(os.path.join(dataset, "scans", "*.npz")))
    scans = []
    for fp in scan_files:
        d = np.load(fp)
        scans.append((float(d["t_end"]), float(d["t_begin"]),
                      d["pts"], d["offsets"]))
    msgs = [(float(imu["t"][i]), "imu", i) for i in range(len(imu["t"]))]
    msgs += [(t_end, "scan", k) for k, (t_end, *_rest) in enumerate(scans)]
    msgs.sort(key=lambda m: (m[0], m[1] == "scan"))
    t_wall0, t_msg0 = time.time(), msgs[0][0] if msgs else 0.0
    n_scans = 0
    for t, kind, i in msgs:
        if rate > 0:
            lead = (t - t_msg0) / rate - (time.time() - t_wall0)
            if lead > 0:
                time.sleep(lead)
        if kind == "imu":
            writer.imu(imu["t"][i], imu["gyr"][i], imu["acc"][i])
        else:
            t_end, t_begin, pts, offsets = scans[i]
            writer.scan(pts, offsets, t_begin, t_end)
            writer.flush()
            n_scans += 1
    writer.end()
    return n_scans
