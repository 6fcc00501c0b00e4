"""Streaming input runner: interleaved, out-of-order IMU/scan messages
through ScanSync (run_live) must produce the same trajectory as the
batch replay path (sync_packages + callbacks, voxelslam.hpp:105-161,
voxelslam.cpp:52-161)."""

import random

import numpy as np
import pytest

from voxelslam_tpu.core import synthetic
from voxelslam_tpu.io import drivers
from voxelslam_tpu.slam import VoxelSLAM
from test_e2e import small_config


def _simulate():
    traj = synthetic.Trajectory(
        amp=np.array([1.2, 0.9, 0.2]), ramp=1.5, t_start=1.0
    )
    dirs = synthetic.lidar_dirs(
        n_lines=20, n_cols=80, fov_v=55.0, fov_h=140.0
    )
    return synthetic.simulate(
        n_scans=25, traj=traj, dirs=dirs, t0=0.5, seed=7
    )


def _messages(data):
    """All sensor messages stamped by arrival time (scan arrives at its
    end time, like a driver publishing a completed sweep)."""
    msgs = []
    for i in range(len(data.imu_t)):
        msgs.append((
            float(data.imu_t[i]), "imu",
            (data.imu_t[i], data.imu_gyr[i], data.imu_acc[i]),
        ))
    for sc in data.scans:
        msgs.append((
            float(sc.t_end), "scan",
            drivers.DecodedScan(sc.points, sc.offsets, sc.t_begin,
                                sc.t_end),
        ))
    msgs.sort(key=lambda m: m[0])
    return msgs


def _local_shuffle(msgs, seed=3, block=6):
    """Permute within fixed blocks: bounded-displacement disorder, the
    live-transport (UDP / multi-queue executor) arrival pattern."""
    rng = random.Random(seed)
    out = list(msgs)
    for i in range(0, len(out) - block, block):
        seg = out[i : i + block]
        rng.shuffle(seg)
        out[i : i + block] = seg
    return out


@pytest.mark.slow
def test_live_stream_matches_batch():
    data = _simulate()
    cfg = small_config()

    a = VoxelSLAM(cfg)
    a.run_synthetic(data)
    ts_a, _, ps_a = a.frontend.trajectory()

    msgs = _local_shuffle(_messages(data))
    b = VoxelSLAM(cfg)
    # feed in two chunks: run_live must be resumable mid-stream.
    # holdback covers the disorder window so a gapped IMU span can
    # never release early.
    mid = len(msgs) // 2
    b.run_live(((k, p) for _, k, p in msgs[:mid]), holdback=0.1)
    b.run_live((k, p) for _, k, p in msgs[mid:])
    b.drain_live()
    ts_b, _, ps_b = b.frontend.trajectory()

    assert len(ts_a) == len(ts_b), (len(ts_a), len(ts_b))
    assert np.allclose(ts_a, ts_b, atol=1e-9)
    err = float(np.abs(np.asarray(ps_a) - np.asarray(ps_b)).max())
    assert err < 1e-4, f"live vs batch trajectory diverged: {err}"


def test_scan_sync_out_of_order_units():
    """ScanSync releases identical tuples for in-order and locally
    shuffled arrivals."""
    rng = np.random.default_rng(5)
    imu_t = np.arange(0.0, 1.0, 0.01)
    gyr = rng.normal(size=(len(imu_t), 3))
    acc = rng.normal(size=(len(imu_t), 3))
    scans = [
        drivers.DecodedScan(
            np.zeros((4, 3), np.float32), np.zeros(4, np.float32),
            0.1 * k, 0.1 * k + 0.1,
        )
        for k in range(2, 8)
    ]

    def drive(order):
        sync = drivers.ScanSync(holdback=0.1)
        rel = []
        for kind, payload in order:
            if kind == "imu":
                sync.push_imu(*payload)
            else:
                sync.push_scan(payload)
            while True:
                out = sync.pop()
                if out is None:
                    break
                rel.append(out)
        while True:
            out = sync.pop(final=True)
            if out is None:
                break
            rel.append(out)
        return rel

    msgs = [("imu", (t, g, a)) for t, g, a in zip(imu_t, gyr, acc)]
    for sc in scans:
        msgs.insert(
            int(np.searchsorted(imu_t, sc.t_end) + 1), ("scan", sc)
        )
    rel_in = drive(msgs)
    shuffled = _local_shuffle(msgs, seed=11, block=5)
    rel_sh = drive(shuffled)
    assert len(rel_in) == len(rel_sh) == len(scans)
    for (s1, t1, g1, a1), (s2, t2, g2, a2) in zip(rel_in, rel_sh):
        assert s1.t_begin == s2.t_begin
        # the COVERING span must be identical; trailing samples past
        # t_end legitimately vary with arrival order (the consumer
        # packs only [t_prev, t_end])
        k1 = int(np.searchsorted(t1, s1.t_end, side="right"))
        k2 = int(np.searchsorted(t2, s2.t_end, side="right"))
        assert t1[0] == t2[0], "span start differs"
        assert np.array_equal(t1[:k1], t2[:k2])
        assert np.array_equal(g1[:k1], g2[:k2])
        assert np.array_equal(a1[:k1], a2[:k2])
