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


class TestCloudSpill:
    """Long-run RSS bounding: clouds spill to disk once consumed and
    re-materialize through the accessors (reference streams PCDs out
    and frees, voxelslam.cpp:163-174)."""

    def test_store_roundtrip(self, tmp_path):
        from voxelslam_tpu.utils import spill

        st = spill.CloudSpill(str(tmp_path / "s.bin"))
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        mask = rng.random(64) < 0.5
        rid = st.put(pts, mask)
        back, bmask = st.get(rid)
        assert back.shape == (64, 3) and bmask.sum() == mask.sum()
        np.testing.assert_allclose(
            np.sort(back[bmask], axis=0), np.sort(pts[mask], axis=0),
            atol=2e-3,  # f16 storage
        )

    def test_spill_mode_precision(self, tmp_path):
        """Adaptive-int16 mode (default) must hold ~1 mm error on a
        60 m-range cloud where f16 degrades to 3.1 cm ulp; f32 is
        lossless.  Guards the round-5 spill-precision audit (the
        reference spills full-precision PCDs, voxelslam.cpp:163-174)."""
        from voxelslam_tpu.utils import spill

        rng = np.random.default_rng(3)
        pts = (rng.uniform(-1, 1, (256, 3)) * 60.0).astype(np.float32)
        mask = np.ones(256, bool)
        errs = {}
        for mode in ("i16", "f16", "f32"):
            st = spill.CloudSpill(str(tmp_path / f"{mode}.bin"),
                                  mode=mode)
            back, _ = st.get(st.put(pts, mask))
            errs[mode] = float(np.abs(back - pts).max())
            st.close()
        assert errs["f32"] == 0.0
        assert errs["i16"] < 1.1e-3, errs
        assert errs["f16"] > 5e-3, errs  # why the default moved off f16

    def test_scan_spill_fetch(self, tmp_path):
        from voxelslam_tpu.utils import spill

        st = spill.CloudSpill(str(tmp_path / "s.bin"))
        sp = dict(pts=np.ones((8, 3), np.float32),
                  mask=np.ones(8, bool))
        assert spill.spill_scan(st, sp)
        assert sp["pts"] is None
        p, m = spill.fetch_scan(sp)
        assert m.all() and np.allclose(p, 1.0)
        # idempotent / RAM path
        sp2 = dict(pts=np.zeros((4, 3), np.float32),
                   mask=np.zeros(4, bool))
        p2, m2 = spill.fetch_scan(sp2)
        assert p2 is sp2["pts"]

    def test_manager_spills_old_scans(self, tmp_path):
        import sys
        sys.path.insert(0, "tests")
        from test_loop_policies import _mgr, _pose_dict

        mgr = _mgr(spill_dir=str(tmp_path))
        n = 40
        for i in range(n):
            mgr.push_scan_pose(_pose_dict(np.eye(3), [0.5 * i, 0, 0]))
        sess = mgr.sessions[0]
        lag = mgr._spill_lag
        assert all(s["pts"] is None for s in sess[: n - lag])
        assert all(s["pts"] is not None for s in sess[n - lag:])
        from voxelslam_tpu.utils.spill import fetch_scan
        p, m = fetch_scan(sess[0])
        assert p.shape == (8, 3)
        # save_session works from spilled state
        from voxelslam_tpu.io import serialization
        serialization.save_session(str(tmp_path / "sess"), sess)
        back = serialization.load_session(str(tmp_path / "sess"))
        assert len(back) == n and back[0]["pts"].shape == (8, 3)

    def test_keyframe_spill_roundtrip(self, tmp_path):
        from voxelslam_tpu.loop import manager
        from voxelslam_tpu.utils import spill

        st = spill.CloudSpill(str(tmp_path / "k.bin"))
        rng = np.random.default_rng(1)
        cloud = rng.normal(size=(32, 3)).astype(np.float32)
        cm = rng.random(32) < 0.8
        k = manager.Keyframe(0, 0, 0, np.eye(3), np.zeros(3),
                             cloud.copy(), cm.copy())
        k.spill(st)
        assert k.cloud is None
        kc, km = k.get_cloud()
        assert km.sum() == cm.sum()
        np.testing.assert_allclose(
            np.sort(kc[km], axis=0), np.sort(cloud[cm], axis=0),
            atol=2e-3,
        )
