"""Pose-graph measurement persistence + loop accept policies.

Covers the round-3 fidelity fixes:

- sequential between-measurements are captured ONCE at ScanPose
  arrival and retained across solves (the reference adds each
  BetweenFactor once, voxelslam.cpp:1915-1917, and ISAM2 keeps it,
  2090-2098) — never regenerated from PGO-corrected poses;
- cross-session RE-links are gated by drift / travel-since-last-link
  (the reference's jours[id] bookkeeping, voxelslam.cpp:2043-2054);
- one keyframe can close one loop PER SESSION (same-session accept
  must not shadow a simultaneous cross-session link,
  voxelslam.cpp:1987-2069).
"""

import numpy as np
import pytest

from voxelslam_tpu.core import so3
from voxelslam_tpu.loop import btc, database, icp, manager


def _mgr(**kw):
    p = btc.BtcParams(line_filter_enable=False, voxel_init_num=5)
    sp = database.SearchParams(skip_near_num=2)
    args = dict(
        win_size=3, kf_downsample=0.15, min_kf_rot_deg=1e9,
        min_kf_trans=1e9,  # no automatic keyframes: tests drive directly
        db_capacity=1 << 12, kf_capacity=64,
    )
    args.update(kw)
    return manager.LoopManager(p, sp, **args)


def _pose_dict(R, p, v6=1e-4):
    return dict(
        t=0.0, R=np.asarray(R, np.float64), p=np.asarray(p, np.float64),
        v=np.zeros(3), bg=np.zeros(3), ba=np.zeros(3),
        g=np.asarray([0.0, 0.0, -9.8]), v6=np.full(6, v6),
        pts=np.zeros((8, 3), np.float32), mask=np.zeros(8, bool),
    )


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _drifted_circuit(n=40, yaw_bias=0.004, step=0.5):
    """Ground-truth square circuit + odometry chain with a small yaw
    bias per step (the classic drift that loop closure must absorb).

    Returns (gt_R, gt_p, est_R, est_p)."""
    gt_R, gt_p = [np.eye(3)], [np.zeros(3)]
    for i in range(1, n):
        turn = _rotz(2 * np.pi / n)
        gt_R.append(gt_R[-1] @ turn)
        gt_p.append(gt_p[-1] + gt_R[-2] @ np.array([step, 0, 0]))
    est_R, est_p = [np.eye(3)], [np.zeros(3)]
    for i in range(1, n):
        Rm = gt_R[i - 1].T @ gt_R[i] @ _rotz(yaw_bias)  # biased odometry
        tm = gt_R[i - 1].T @ (gt_p[i] - gt_p[i - 1])
        est_R.append(est_R[-1] @ Rm)
        est_p.append(est_p[-1] + est_R[-2] @ tm)
    return gt_R, gt_p, est_R, est_p


class TestPersistentMeasurements:
    def test_measurements_captured_at_arrival(self):
        mgr = _mgr()
        rng = np.random.default_rng(3)
        Rs = [np.eye(3)]
        ps = [np.zeros(3)]
        for i in range(5):
            Rs.append(Rs[-1] @ _rotz(0.1))
            ps.append(ps[-1] + rng.normal(size=3))
            mgr.push_scan_pose(_pose_dict(Rs[-1], ps[-1]))
        mgr.push_scan_pose(_pose_dict(Rs[0], ps[0]))
        sess = mgr.sessions[0]
        # stored measurement equals the arrival-time relative pose
        for i in range(1, len(sess)):
            a, b = sess[i - 1], sess[i]
            assert np.allclose(b["odom_Rm"], a["R"].T @ b["R"], atol=1e-12)
        # corrupt the poses (simulating a PGO write-back) — the graph
        # must still be assembled from the STORED measurements
        stored = [(s["odom_Rm"].copy(), s["odom_tm"].copy())
                  for s in sess[1:]]
        for s in sess:
            s["R"] = s["R"] @ _rotz(0.3)
            s["p"] = s["p"] + 1.0
        g, _ = mgr._graph_arrays()
        Rm = np.asarray(g.Rm)
        tm = np.asarray(g.tm)
        for i, (R0, t0) in enumerate(stored):
            assert np.allclose(Rm[i], R0, atol=1e-6)
            assert np.allclose(tm[i], t0, atol=1e-6)

    def test_two_optimizations_keep_odometry_info(self):
        """Two successive solves on a drifted circuit: after the first
        write-back the sequential edges keep NON-zero residuals (the
        bent chain is not re-baptized as truth), and the final ATE
        beats the measurement-regenerating behavior."""
        n = 40
        gt_R, gt_p, est_R, est_p = _drifted_circuit(n)

        def run(regenerate: bool):
            mgr = _mgr()
            for R, p in zip(est_R, est_p):
                mgr.push_scan_pose(_pose_dict(R, p, v6=1e-2))
            sess = mgr.sessions[0]
            # fabricate keyframes at both ends for _optimize bookkeeping
            cloud = np.zeros((16, 3), np.float32)
            cmask = np.zeros(16, bool)
            kf_t = manager.Keyframe(0, 0, 0, sess[0]["R"], sess[0]["p"],
                                    cloud, cmask)
            kf_q = manager.Keyframe(0, 1, n - 1, sess[-1]["R"],
                                    sess[-1]["p"], cloud, cmask)
            mgr.keyframes = [kf_t, kf_q]

            def add_loop(i, j):
                # true relative measurement between scans i and j
                Rm = gt_R[i].T @ gt_R[j]
                tm = gt_R[i].T @ (gt_p[j] - gt_p[i])
                mgr.loop_edges.append(manager.LoopEdge(
                    s1=0, s2=0, scan1=i, scan2=j,
                    R=Rm, t=tm, v6=np.full(6, 1e-6),
                ))

            add_loop(0, n - 1)
            mgr._optimize(kf_q, kf_t)
            if regenerate:
                # old behavior: measurements regenerated from the
                # (now corrected) poses before the next solve
                for s in sess[1:]:
                    prev = sess[s["scan_idx"] - 1]
                    s["odom_Rm"] = prev["R"].T @ s["R"]
                    s["odom_tm"] = prev["R"].T @ (s["p"] - prev["p"])
            else:
                # sequential residuals after write-back must be
                # non-zero somewhere: the solve bent the chain away
                # from the stored odometry
                res = []
                for s in sess[1:]:
                    prev = sess[s["scan_idx"] - 1]
                    res.append(np.linalg.norm(
                        s["odom_tm"]
                        - prev["R"].T @ (s["p"] - prev["p"])
                    ))
                assert max(res) > 1e-6, "solve left all residuals zero?"
            add_loop(0, n // 2)
            mgr._optimize(kf_q, kf_t)
            errs = [np.linalg.norm(s["p"] - gt_p[s["scan_idx"]])
                    for s in sess]
            return float(np.sqrt(np.mean(np.square(errs))))

        ate_stored = run(regenerate=False)
        ate_regen = run(regenerate=True)
        assert ate_stored <= ate_regen + 1e-9, (
            f"stored {ate_stored:.4f} vs regenerated {ate_regen:.4f}"
        )
        assert ate_stored < 0.5


class TestRelinkPolicy:
    def _two_session_mgr(self):
        mgr = _mgr()
        for i in range(6):
            mgr.push_scan_pose(
                _pose_dict(np.eye(3), [0.5 * i, 0.0, 0.0])
            )
        mgr.new_session()
        for i in range(6):
            mgr.push_scan_pose(
                _pose_dict(np.eye(3), [0.5 * i, 0.1, 0.0])
            )
        cloud = np.zeros((16, 3), np.float32)
        cmask = np.zeros(16, bool)
        tgt = manager.Keyframe(0, 0, 2, np.eye(3),
                               np.array([1.0, 0.0, 0.0]), cloud, cmask)
        kf = manager.Keyframe(1, 1, 5, np.eye(3),
                              np.array([2.5, 0.1, 0.0]), cloud, cmask)
        mgr.keyframes = [tgt, kf]
        return mgr, kf, tgt

    def test_poisoned_relink_rejected(self):
        mgr, kf, tgt = self._two_session_mgr()
        # sessions already linked; last link at the current keyframe's
        # jour -> near-zero travel since
        mgr._merged_sessions.add((0, 1))
        kf_jour = mgr.sessions[1][kf.first_scan]["jour"]
        mgr._link_jour[(0, 1)] = kf_jour
        # poisoned ICP: implies ~3 m drift over ~0 travel
        Rm = np.eye(3)
        tm = kf.p0 - tgt.p0 + np.array([3.0, 0.0, 0.0])
        pushed, _ = mgr._gate_and_push_edge(kf, Rm, tm, tgt)
        assert not pushed
        assert len(mgr.loop_edges) == 0

    def test_plausible_relink_accepted_and_resets_travel(self):
        mgr, kf, tgt = self._two_session_mgr()
        mgr._merged_sessions.add((0, 1))
        mgr._link_jour[(0, 1)] = 0.0  # linked long ago: 2.5 m travel
        Rm = np.eye(3)
        tm = kf.p0 - tgt.p0 + np.array([0.05, 0.0, 0.0])
        pushed, _ = mgr._gate_and_push_edge(kf, Rm, tm, tgt)
        assert pushed
        assert len(mgr.loop_edges) == 1
        kf_jour = mgr.sessions[1][kf.first_scan]["jour"]
        assert mgr._link_jour[(0, 1)] == pytest.approx(kf_jour)

    def test_first_link_bypasses_gate(self):
        mgr, kf, tgt = self._two_session_mgr()
        Rm = np.eye(3)
        tm = kf.p0 - tgt.p0 + np.array([0.4, 0.0, 0.0])
        pushed, want = mgr._gate_and_push_edge(kf, Rm, tm, tgt)
        assert pushed and want  # first cross-session link optimizes
        assert mgr.g_update_pending


class TestOneEdgePerSession:
    def test_same_and_cross_session_edges_from_one_keyframe(
        self, monkeypatch
    ):
        """A keyframe whose candidates verify against BOTH its own
        session and a previous session pushes one edge per session
        (reference SearchLoop per session, voxelslam.cpp:1987-2069)."""
        mgr, kf, tgt_cross = self._setup(monkeypatch)
        raw = np.zeros((64, 3), np.float32)
        ev = mgr._process_keyframe(kf, raw, np.ones(64, bool))
        sess_pairs = {(e.s1, e.s2) for e in mgr.loop_edges}
        assert (0, 1) in sess_pairs, "cross-session edge missing"
        assert (1, 1) in sess_pairs, "same-session edge missing"
        assert ev is not None  # first link forces an optimization

    def _setup(self, monkeypatch):
        mgr = _mgr()
        for i in range(8):
            mgr.push_scan_pose(
                _pose_dict(np.eye(3), [0.5 * i, 0.0, 0.0])
            )
        mgr.new_session()
        for i in range(8):
            mgr.push_scan_pose(
                _pose_dict(np.eye(3), [0.5 * i, 0.05, 0.0])
            )
        cloud = np.zeros((64, 3), np.float32)
        cmask = np.ones(64, bool)
        tgt_cross = manager.Keyframe(
            0, 0, 2, np.eye(3), np.array([1.0, 0.0, 0.0]), cloud, cmask
        )
        tgt_same = manager.Keyframe(
            1, 1, 1, np.eye(3), np.array([0.5, 0.05, 0.0]), cloud, cmask
        )
        kf = manager.Keyframe(
            1, 2, 7, np.eye(3), np.array([3.5, 0.05, 0.0]), cloud, cmask
        )
        mgr.keyframes = [tgt_cross, tgt_same, kf]

        import numpy as _np
        from voxelslam_tpu.loop import database as _dbm
        from voxelslam_tpu.loop import icp as _icpm

        # stub the fused device program (manager.keyframe_program): the
        # candidates verify against BOTH sessions with init transforms
        # consistent with the estimates (drift ~0 → every plausibility
        # gate passes); the host accept/edge policy is what's under test
        n = mgr.n_icp
        frame = _np.full(n, -1, _np.int32)
        frame[:2] = [0, 1]
        Rc = _np.tile(_np.eye(3, dtype=_np.float32), (n, 1, 1))
        tc = _np.zeros((n, 3), _np.float32)
        tc[0] = kf.p0 - tgt_cross.p0
        tc[1] = kf.p0 - tgt_same.p0
        cands = _dbm.LoopCandidates(
            frame=frame, score=_np.where(frame >= 0, 1.0, -1.0),
            R=Rc, t=tc, votes=_np.full(n, 10, _np.int32),
        )
        rs = _icpm.IcpResult(
            R=Rc, t=tc,
            accepted=_np.ones(n, bool),
            converged=_np.ones(n, bool),
            min_eig=_np.full(n, 100.0, _np.float32),
            match_count=_np.full(n, 64, _np.int32),
        )

        def fake_program(db_state, raw_pts, raw_mask, count, frame_id,
                         session_id, **kw):
            return db_state, raw_pts, raw_mask, cands, rs

        monkeypatch.setattr(manager, "keyframe_program", fake_program)
        return mgr, kf, tgt_cross


class TestComponents:
    def test_session_components_partition(self):
        """components() partitions sessions by accepted loop edges —
        the basis for multi-session ATE scoring (only the component
        containing session 0 shares the ground-truth frame)."""
        mgr = _mgr()
        for _ in range(4):
            for i in range(3):
                mgr.push_scan_pose(
                    _pose_dict(np.eye(3), [0.5 * i, 0.0, 0.0])
                )
            mgr.new_session()
        # 5 sessions exist (4 pushed + the trailing empty one)
        assert mgr.components() == [[0], [1], [2], [3], [4]]
        mgr.loop_edges.append(manager.LoopEdge(
            s1=0, s2=2, scan1=0, scan2=0,
            R=np.eye(3), t=np.zeros(3), v6=np.full(6, 1e-4),
        ))
        mgr.loop_edges.append(manager.LoopEdge(
            s1=3, s2=1, scan1=0, scan2=0,
            R=np.eye(3), t=np.zeros(3), v6=np.full(6, 1e-4),
        ))
        comps = mgr.components()
        assert [0, 2] in comps and [1, 3] in comps and [4] in comps


class TestWitnessTimeout:
    """Witness-mode fallback: a held first link that is never
    contradicted commits with inflated noise after
    `witness_timeout_kfs` keyframes — a world with exactly one genuine
    cross view (corridor between rooms) must not strand true merges;
    an aliased world with disagreeing candidates must never commit."""

    def _two_sessions(self, timeout=3):
        mgr = _mgr(relocal_witnesses=2, witness_timeout_kfs=timeout)
        for i in range(8):
            mgr.push_scan_pose(_pose_dict(np.eye(3), [0.5 * i, 0, 0]))
        mgr.new_session()
        for i in range(8):
            mgr.push_scan_pose(
                _pose_dict(np.eye(3), [0.5 * i, 0, 30.0])
            )
        cloud = np.zeros((16, 3), np.float32)
        cm = np.ones(16, bool)
        tgt = manager.Keyframe(
            0, 0, 2, np.eye(3), np.array([1.0, 0, 0]), cloud, cm
        )
        kf = manager.Keyframe(
            1, 1, 2, np.eye(3), np.array([1.0, 0, 30.0]), cloud, cm
        )
        mgr.keyframes = [tgt, kf]
        return mgr, kf, tgt

    def test_single_witness_commits_after_timeout(self):
        mgr, kf, tgt = self._two_sessions(timeout=3)
        pushed, _ = mgr._gate_and_push_edge(
            kf, np.eye(3), np.zeros(3), tgt
        )
        assert not pushed and (0, 1) in mgr._candidate_links
        # the holding keyframe's own resolve ages the hold once, then
        # two more quiet keyframes pass...
        for _ in range(3):
            need, t = mgr._age_candidate_links()
            assert not need
        # ...the timeout'th quiet keyframe commits
        need, t = mgr._age_candidate_links()
        assert need and t is tgt
        assert (0, 1) in mgr._merged_sessions
        assert (0, 1) not in mgr._candidate_links
        mgr._apply_pending_links()
        cross = [e for e in mgr.loop_edges if e.s1 != e.s2]
        assert len(cross) == 1
        # committed with x100-inflated noise (base 1e-4 -> 1e-2)
        assert cross[0].v6.max() >= 9e-3
        # the rigid connect snapped session 1 onto session 0's frame
        d = np.linalg.norm(
            mgr.sessions[1][2]["p"] - mgr.sessions[0][2]["p"]
        )
        assert d < 1e-6, d

    def test_disagreeing_candidates_never_commit(self):
        mgr, kf, tgt = self._two_sessions(timeout=3)
        for k in range(8):
            # aliased world: candidates keep arriving with inconsistent
            # transforms — each replaces the hold and restarts the clock
            Rm = _rotz(0.5 if k % 2 else -0.5)
            pushed, _ = mgr._gate_and_push_edge(
                kf, Rm, np.zeros(3), tgt
            )
            assert not pushed
            need, _ = mgr._age_candidate_links()
            assert not need
        assert (0, 1) not in mgr._merged_sessions
        assert not mgr.loop_edges

    def test_timeout_disabled_holds_forever(self):
        mgr, kf, tgt = self._two_sessions(timeout=0)
        pushed, _ = mgr._gate_and_push_edge(
            kf, np.eye(3), np.zeros(3), tgt
        )
        assert not pushed
        for _ in range(50):
            need, _ = mgr._age_candidate_links()
            assert not need
        assert (0, 1) not in mgr._merged_sessions


class TestPoisonedLinkRecovery:
    def test_two_witnesses_outvote_bad_first_link(self):
        """A first cross-session link with a bad ICP yaw poisons the
        merged frame; later GOOD loops then all show huge drift and
        the relink gate rejects them forever.  Two consecutive
        rejections that imply the SAME frame correction must replace
        the pair's edges, rigidly re-connect, and re-solve."""
        mgr = _mgr()
        n = 8
        for i in range(n):
            mgr.push_scan_pose(
                _pose_dict(np.eye(3), [0.6 * i, 0.0, 0.0], v6=1e-4)
            )
        mgr.new_session()
        # session 1 follows the same true route, estimated in the
        # usual reset frame (z + 30)
        for i in range(n):
            mgr.push_scan_pose(
                _pose_dict(np.eye(3), [0.6 * i, 0.0, 30.0], v6=1e-4)
            )
        cloud = np.zeros((16, 3), np.float32)
        cm = np.ones(16, bool)

        def kfp(si, fs):
            s = mgr.sessions[si][fs]
            return manager.Keyframe(si, si * 10 + fs, fs,
                                    s["R"].copy(), s["p"].copy(),
                                    cloud, cm)

        # TRUE relative transform between matching scans: identity
        # (both sessions traverse the same poses).  Bad first link:
        # yaw off by 0.3 rad.
        bad_R = _rotz(0.3)
        kf1 = kfp(1, 2)
        tgt1 = kfp(0, 2)
        pushed, want = mgr._gate_and_push_edge(
            kf1, bad_R, np.zeros(3), tgt1
        )
        assert pushed and want
        mgr._optimize(kf1, tgt1)
        # frame is now poisoned: session 1 rotated ~0.3 rad about the
        # connect point
        p_err = np.linalg.norm(
            mgr.sessions[1][6]["p"] - mgr.sessions[0][6]["p"]
        )
        assert p_err > 0.3, "bad link should poison the frame"

        # two good loops at other keyframes (exact identity measure)
        kf2, tgt2 = kfp(1, 5), kfp(0, 5)
        pushed, _ = mgr._gate_and_push_edge(
            kf2, np.eye(3), np.zeros(3), tgt2
        )
        assert not pushed, "first good relink must be gated"
        kf3, tgt3 = kfp(1, 6), kfp(0, 6)
        pushed, want = mgr._gate_and_push_edge(
            kf3, np.eye(3), np.zeros(3), tgt3
        )
        assert pushed and want, "agreeing witness must trigger replace"
        mgr._optimize(kf3, tgt3)
        pair_edges = [e for e in mgr.loop_edges
                      if {e.s1, e.s2} == {0, 1}]
        assert len(pair_edges) == 2, "poisoned edge must be dropped"
        for i in range(n):
            d = np.linalg.norm(
                mgr.sessions[1][i]["p"] - mgr.sessions[0][i]["p"]
            )
            assert d < 0.2, f"pose {i} still off by {d:.2f} m"
