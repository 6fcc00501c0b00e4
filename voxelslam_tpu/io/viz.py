"""Visualization export — the observability plane.

The reference publishes seven PointCloud2 topics + TF for RViz
(ResultOutput, voxelslam.cpp:5-152; plugin VoxelSLAMPointCloud2).
Standalone TPU deployments have no ROS; the equivalent plane is
file export (PLY point clouds + trajectory) plus optional user
callbacks.  PLY files open in any viewer (CloudCompare/meshlab/
Open3D), and the exporter mirrors the reference's channels:

  map_scan  — current scan in world frame
  map_path  — trajectory polyline
  map_cmap  — sliding-window local map
  map_pmap  — global map (chunked like voxelslam.cpp:96-151)
  map_true  — per-session trajectories
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional

import numpy as np


def write_ply(path: str, pts: np.ndarray, colors: Optional[np.ndarray] = None):
    """Binary little-endian PLY point cloud."""
    n = len(pts)
    has_c = colors is not None
    header = [
        "ply", "format binary_little_endian 1.0", f"element vertex {n}",
        "property float x", "property float y", "property float z",
    ]
    if has_c:
        header += [
            "property uchar red", "property uchar green", "property uchar blue"
        ]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if has_c:
            rec = np.zeros(
                n, dtype=[("xyz", "f4", 3), ("rgb", "u1", 3)]
            )
            rec["xyz"] = pts.astype(np.float32)
            rec["rgb"] = colors.astype(np.uint8)
            f.write(rec.tobytes())
        else:
            f.write(pts.astype(np.float32).tobytes())


def trajectory_ply(path: str, positions: np.ndarray,
                   sessions: Optional[np.ndarray] = None):
    """Trajectory as a colored point strip (one color per session)."""
    palette = np.asarray(
        [[230, 60, 60], [60, 160, 230], [80, 200, 100], [230, 180, 50],
         [180, 90, 220], [240, 130, 40]], np.uint8
    )
    if sessions is None:
        colors = np.tile(palette[0], (len(positions), 1))
    else:
        colors = palette[np.asarray(sessions) % len(palette)]
    write_ply(path, positions, colors)


class VizExporter:
    """Channel-style exporter; call sites mirror the reference's
    publishers.  `every` throttles per-channel write frequency."""

    def __init__(self, out_dir: str, every: int = 10,
                 chunk_points: int = 5_000_000):
        self.dir = out_dir
        self.every = max(every, 1)
        self.chunk = chunk_points
        self._n = {}
        os.makedirs(out_dir, exist_ok=True)

    def _due(self, channel: str) -> bool:
        c = self._n.get(channel, 0)
        self._n[channel] = c + 1
        return c % self.every == 0

    def scan(self, pts_world: np.ndarray):
        if self._due("map_scan"):
            write_ply(os.path.join(self.dir, "map_scan.ply"), pts_world)

    def stream_frame(self, pts_world: np.ndarray,
                     positions: Optional[np.ndarray] = None):
        """Live-watch channel (cli `--viz-stream`): update
        map_scan.ply / map_path.ply IN PLACE (a viewer polling the
        files sees the run progress, like the reference's /map_scan
        and /map_path topics) AND append a numbered frame under
        frames/ so a finished run can be replayed."""
        c = self._n.get("stream", 0)
        self._n["stream"] = c + 1
        if c % self.every:
            return
        write_ply(os.path.join(self.dir, "map_scan.ply"), pts_world)
        fdir = os.path.join(self.dir, "frames")
        os.makedirs(fdir, exist_ok=True)
        write_ply(os.path.join(fdir, f"scan_{c:05d}.ply"), pts_world)
        if positions is not None and len(positions):
            trajectory_ply(
                os.path.join(self.dir, "map_path.ply"),
                np.asarray(positions),
            )

    def clear(self, channel: str = "all"):
        """Clear-on-empty semantic (VoxelSLAMPointCloud2::
        processMessage, voxelslam_pc2.cpp:155-158; README.md:163-172):
        the reference's RViz plugin wipes an accumulating display when
        an empty cloud arrives — used after a loop correction moves
        the world frame and every previously-published point is stale.

        File-export equivalent: world-frame channel files are
        truncated to empty clouds, accumulated map_pmap chunks are
        removed, and the numbered frame stream gets an explicit empty
        `*_clear.ply` marker so a replaying client wipes at exactly
        the right frame."""
        import glob as _glob

        empty = np.zeros((0, 3), np.float32)
        if channel in ("map_pmap", "all"):
            for f in _glob.glob(os.path.join(self.dir, "map_pmap_*.ply")):
                os.remove(f)
        if channel in ("stream", "all"):
            c = self._n.get("stream", 0)
            fdir = os.path.join(self.dir, "frames")
            if os.path.isdir(fdir):
                write_ply(
                    os.path.join(fdir, f"scan_{c:05d}_clear.ply"), empty
                )
        for ch in ("map_scan", "map_cmap"):
            if channel in (ch, "all"):
                p = os.path.join(self.dir, f"{ch}.ply")
                if os.path.exists(p):
                    write_ply(p, empty)

    def local_map(self, pts_world: np.ndarray):
        if self._due("map_cmap"):
            write_ply(os.path.join(self.dir, "map_cmap.ply"), pts_world)

    def path(self, positions: np.ndarray, sessions=None):
        if self._due("map_path"):
            trajectory_ply(
                os.path.join(self.dir, "map_path.ply"), positions, sessions
            )

    def global_map(self, clouds: Iterable[np.ndarray]):
        """Chunked global map export with decimation when large
        (pub_pmap chunking, voxelslam.cpp:96-151)."""
        total = 0
        parts: List[np.ndarray] = []
        idx = 0
        for c in clouds:
            parts.append(c)
            total += len(c)
            if total >= self.chunk:
                merged = np.concatenate(parts)
                write_ply(
                    os.path.join(self.dir, f"map_pmap_{idx}.ply"), merged
                )
                idx += 1
                parts, total = [], 0
        if parts:
            merged = np.concatenate(parts)
            if len(merged):
                write_ply(
                    os.path.join(self.dir, f"map_pmap_{idx}.ply"), merged
                )
