"""Telemetry + viz export tests."""

import os

import numpy as np

from voxelslam_tpu.io import viz
from voxelslam_tpu.utils import telemetry


class TestTelemetry:
    def test_stage_stats(self):
        t = telemetry.Telemetry()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        t.count("x", 3)
        snap = t.snapshot()
        assert snap["x"] == 3
        assert "a.mean_ms" in snap
        assert t.stages["a"].count == 2
        assert "host_rss_gb" in snap
        assert snap["host_rss_gb"] > 0
        assert "a" in t.report()


class TestViz:
    def test_ply_roundtrip_shapes(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        p = str(tmp_path / "x.ply")
        viz.write_ply(p, pts)
        raw = open(p, "rb").read()
        assert b"element vertex 50" in raw
        body = raw[raw.find(b"end_header\n") + 11:]
        back = np.frombuffer(body, np.float32).reshape(50, 3)
        np.testing.assert_allclose(back, pts)

    def test_exporter_channels(self, tmp_path):
        ex = viz.VizExporter(str(tmp_path), every=1)
        rng = np.random.default_rng(1)
        ex.scan(rng.normal(size=(10, 3)))
        ex.path(rng.normal(size=(20, 3)), sessions=np.zeros(20, int))
        ex.local_map(rng.normal(size=(10, 3)))
        ex.global_map([rng.normal(size=(10, 3)), rng.normal(size=(10, 3))])
        files = os.listdir(tmp_path)
        assert "map_scan.ply" in files
        assert "map_path.ply" in files
        assert "map_cmap.ply" in files
        assert any(f.startswith("map_pmap") for f in files)


def test_viz_clear_on_empty(tmp_path):
    """Clear-on-empty (voxelslam_pc2.cpp:155-158): after a loop
    correction, clear() truncates world-frame channels, removes
    accumulated pmap chunks, and drops an empty marker frame."""
    import numpy as np
    from voxelslam_tpu.io import viz

    ex = viz.VizExporter(str(tmp_path), every=1, chunk_points=10)
    rng = np.random.default_rng(2)
    ex.scan(rng.normal(size=(10, 3)))
    ex.local_map(rng.normal(size=(10, 3)))
    ex.global_map([rng.normal(size=(10, 3)), rng.normal(size=(10, 3))])
    ex.stream_frame(rng.normal(size=(10, 3)))
    assert any(f.startswith("map_pmap") for f in os.listdir(tmp_path))

    ex.clear()
    files = os.listdir(tmp_path)
    assert not any(f.startswith("map_pmap") for f in files)
    for ch in ("map_scan.ply", "map_cmap.ply"):
        raw = open(tmp_path / ch, "rb").read()
        assert b"element vertex 0" in raw, ch
    marks = [f for f in os.listdir(tmp_path / "frames")
             if f.endswith("_clear.ply")]
    assert len(marks) == 1
    raw = open(tmp_path / "frames" / marks[0], "rb").read()
    assert b"element vertex 0" in raw


def test_viz_stream_frames(tmp_path):
    """--viz-stream support: stream_frame updates map_scan.ply in
    place and appends numbered frames so a run can be watched."""
    import numpy as np
    from voxelslam_tpu.io import viz

    ex = viz.VizExporter(str(tmp_path), every=2)
    for i in range(6):
        pts = np.random.default_rng(i).normal(size=(50, 3))
        ex.stream_frame(pts, positions=np.zeros((i + 1, 3)))
    frames = sorted((tmp_path / "frames").glob("scan_*.ply"))
    assert len(frames) == 3  # every=2 over 6 calls
    assert (tmp_path / "map_scan.ply").exists()
    assert (tmp_path / "map_path.ply").exists()
