"""Session persistence — the multi-map checkpoint/resume formats.

File-compatible counterpart of the reference's `FileReaderWriter`
(voxelslam.cpp:154-450):

- `alidarState.txt`  : one line per scan, 8/20/26 columns
  `t px py pz qx qy qz qw [vx vy vz bgx bgy bgz bax bay baz gx gy gz
  [v6 x6]]` (save_pose, voxelslam.cpp:176-198; reader
  voxelslam.hpp:217-255).
- `edge.txt`         : shared inter-session loop edges
  `name1 name2 id1 id2 tx ty tz qx qy qz qw`
  (pgo_edges_io, voxelslam.cpp:201-275).
- per-scan clouds    : the reference writes one binary PCD per scan
  (save_pcd, 163-174); we write the same data as a single compressed
  `scans.npz` (pts + mask + counts) by default and offer a minimal
  PCD writer/reader for interop with the reference's output.

`load_session` rebuilds keyframe clouds from the stored scans the way
`previous_map_read` does (acsize/mgsize batching, voxelslam.cpp:
307-448), so saved sessions can be re-entered for multi-session
relocalization.
"""

from __future__ import annotations

import os
import struct
from typing import List, Optional

import numpy as np


def _quat_from_R(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        x, y, z, w = q
    return np.asarray([x, y, z, w])


def _R_from_quat(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    n = x * x + y * y + z * z + w * w
    s = 2.0 / max(n, 1e-12)
    return np.asarray(
        [
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ]
    )


# ------------------------------------------------------- alidarState.txt

def save_lidar_state(path: str, scan_poses: List[dict]):
    """Write the 26-column trajectory file (save_pose format)."""
    with open(path, "w") as f:
        for sp in scan_poses:
            q = _quat_from_R(np.asarray(sp["R"]))
            row = [f"{sp['t']:.6f}"]
            row += [f"{v:.7f}" for v in np.asarray(sp["p"])]
            row += [f"{v:.7f}" for v in q]
            for key in ("v", "bg", "ba", "g"):
                row += [f"{v:.7f}" for v in np.asarray(sp.get(key, np.zeros(3)))]
            v6 = np.asarray(sp.get("v6", np.full(6, 1e-6)))
            row += [f"{v:.7g}" for v in v6]
            f.write(" ".join(row) + "\n")


def load_lidar_state(path: str) -> List[dict]:
    """Read alidarState.txt (8, 20 or 26 columns — read_lidarstate,
    voxelslam.hpp:217-255)."""
    out = []
    with open(path) as f:
        for line in f:
            nums = [float(x) for x in line.split()]
            if len(nums) < 8:
                continue
            sp = dict(
                t=nums[0],
                p=np.asarray(nums[1:4]),
                R=_R_from_quat(np.asarray(nums[4:8])),
            )
            if len(nums) >= 20:
                sp["v"] = np.asarray(nums[8:11])
                sp["bg"] = np.asarray(nums[11:14])
                sp["ba"] = np.asarray(nums[14:17])
                sp["g"] = np.asarray(nums[17:20])
            if len(nums) >= 26:
                sp["v6"] = np.asarray(nums[20:26])
            out.append(sp)
    return out


# --------------------------------------------------------------- edge.txt

def save_edges(path: str, edges: List[dict], keep_absent: List[str] = ()):
    """Write inter-session loop edges.  Each edge dict:
    {name1, name2, id1, id2, R (3,3), t (3,), [v6 (6,)]}.

    The first 11 columns match the reference's edge.txt exactly
    (pgo_edges_io, voxelslam.cpp:255-275); when the edge carries a
    hessian-derived noise v6 it is appended as 6 extra columns — the
    reference's stringstream reader ignores trailing columns, so the
    file stays interchange-compatible both ways."""
    with open(path, "w") as f:
        for line in keep_absent:
            f.write(line.rstrip("\n") + "\n")
        for e in edges:
            q = _quat_from_R(np.asarray(e["R"]))
            t = np.asarray(e["t"])
            row = (
                f"{e['name1']} {e['name2']} {e['id1']} {e['id2']} "
                f"{t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}"
            )
            if e.get("v6") is not None:
                row += "".join(f" {v:.7g}" for v in np.asarray(e["v6"]))
            f.write(row + "\n")


def load_edges(path: str, known_names: List[str], bagname: str = ""):
    """Read edge.txt; returns (edges for known session pairs, absent
    lines to preserve) — mirrors pgo_edges_io read orientation
    handling (voxelslam.cpp:206-252)."""
    edges, absent = [], []
    if not os.path.exists(path):
        return edges, absent
    with open(path) as f:
        for line in f:
            sts = line.split()
            if len(sts) < 11:
                continue
            try:
                m = [known_names.index(sts[0]), known_names.index(sts[1])]
            except ValueError:
                if sts[0] != bagname and sts[1] != bagname:
                    absent.append(line)
                continue
            id1, id2 = int(sts[2]), int(sts[3])
            t = np.asarray([float(x) for x in sts[4:7]])
            q = np.asarray([float(x) for x in sts[7:11]])
            R = _R_from_quat(q)
            v6 = (
                np.asarray([float(x) for x in sts[11:17]])
                if len(sts) >= 17 else None
            )
            if m[0] <= m[1]:
                edges.append(dict(m1=m[0], m2=m[1], id1=id1, id2=id2,
                                  R=R, t=t, v6=v6))
            else:
                # inverted measurement; the diagonal noise approximates
                # its own rotation, keep it as-is
                edges.append(
                    dict(m1=m[1], m2=m[0], id1=id2, id2=id1,
                         R=R.T, t=-R.T @ t, v6=v6)
                )
    return edges, absent


# ------------------------------------------------------------ scan clouds

def save_scans_npz(path: str, scan_poses: List[dict]):
    """Store per-scan body-frame clouds compactly (replaces the
    reference's one-PCD-per-scan layout).  Clouds spilled to disk by
    the loop layer re-materialize through utils.spill."""
    from ..utils.spill import fetch_scan

    clouds = [fetch_scan(sp) for sp in scan_poses]
    pts = np.stack([c[0] for c in clouds]).astype(np.float16)
    mask = np.stack([c[1] for c in clouds])
    np.savez_compressed(path, pts=pts, mask=mask)


def load_scans_npz(path: str):
    d = np.load(path)
    return d["pts"].astype(np.float32), d["mask"]


# ------------------------------------------------------------ PCD interop

def save_pcd(path: str, pts: np.ndarray):
    """Minimal binary PCD writer (x y z intensity), layout-compatible
    with the reference's per-scan output (save_pcd, 163-174)."""
    n = pts.shape[0]
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
        "TYPE F F F F\nCOUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA binary\n"
    )
    data = np.zeros((n, 4), np.float32)
    data[:, :3] = pts
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())


def load_pcd(path: str) -> np.ndarray:
    """Minimal binary/ascii PCD reader (x y z [...])."""
    with open(path, "rb") as f:
        raw = f.read()
    head_end = raw.find(b"DATA")
    header = raw[:head_end].decode(errors="ignore").splitlines()
    fields, sizes, types, counts, n = [], [], [], [], 0
    for line in header:
        kv = line.split()
        if not kv:
            continue
        if kv[0] == "FIELDS":
            fields = kv[1:]
        elif kv[0] == "SIZE":
            sizes = [int(x) for x in kv[1:]]
        elif kv[0] == "TYPE":
            types = kv[1:]
        elif kv[0] == "POINTS":
            n = int(kv[1])
    mode_line = raw[head_end : raw.find(b"\n", head_end)].decode()
    body = raw[raw.find(b"\n", head_end) + 1 :]
    if "ascii" in mode_line:
        arr = np.loadtxt(body.decode().splitlines(), dtype=np.float32)
        return arr[:, :3].reshape(n, -1)[:, :3]
    stride = sum(sizes)
    arr = np.frombuffer(body[: n * stride], dtype=np.uint8).reshape(n, stride)
    out = np.zeros((n, 3), np.float32)
    off = 0
    got = 0
    for fld, sz in zip(fields, sizes):
        if fld in ("x", "y", "z") and sz == 4:
            out[:, "xyz".index(fld)] = arr[:, off : off + 4].copy().view(np.float32)[:, 0]
            got += 1
        off += sz
    return out


# ------------------------------------------------------------- sessions

def save_session(dirpath: str, scan_poses: List[dict]):
    """Full session checkpoint: trajectory + scan clouds."""
    os.makedirs(dirpath, exist_ok=True)
    save_lidar_state(os.path.join(dirpath, "alidarState.txt"), scan_poses)
    sp0 = scan_poses[0] if scan_poses else {}
    if sp0.get("pts") is not None or sp0.get("spill") is not None:
        save_scans_npz(os.path.join(dirpath, "scans.npz"), scan_poses)


def load_session(dirpath: str) -> List[dict]:
    """Reload a saved session (previous_map_read counterpart):
    trajectory + clouds, ready for keyframe/descriptor rebuild."""
    sps = load_lidar_state(os.path.join(dirpath, "alidarState.txt"))
    npz = os.path.join(dirpath, "scans.npz")
    if os.path.exists(npz):
        pts, mask = load_scans_npz(npz)
        for i, sp in enumerate(sps[: len(pts)]):
            sp["pts"] = pts[i]
            sp["mask"] = mask[i]
    return sps
