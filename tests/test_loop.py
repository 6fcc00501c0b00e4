"""Loop-closure layer tests: pose-graph GN/PCG, plane ICP, BTC
descriptors + database search on synthetic keyframes."""

import numpy as np
import jax
import jax.numpy as jnp

from voxelslam_tpu.core import so3, synthetic
from voxelslam_tpu.loop import btc, database, icp, posegraph


def _rand_rot(rng, scale=1.0):
    return np.asarray(so3.exp(jnp.asarray(rng.normal(size=3) * scale, jnp.float32)))


class TestPoseGraph:
    def _chain_graph(self, rng, N=40, drift=0.002, with_loop=True):
        """Ground-truth circle trajectory; odometry edges with small
        bias (drift); one loop edge closing start-end."""
        ang = np.linspace(0, 2 * np.pi, N)
        Rg = [np.asarray(so3.exp(jnp.asarray([0, 0, a], jnp.float32))) for a in ang]
        pg = np.stack([5 * np.cos(ang), 5 * np.sin(ang), 0 * ang], axis=1)

        E = N  # N-1 odom + 1 loop (padded)
        ei = np.zeros(E, np.int32)
        ej = np.zeros(E, np.int32)
        Rm = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        tm = np.zeros((E, 3), np.float32)
        w = np.ones((E, 6), np.float32)
        ev = np.zeros(E, bool)
        for k in range(N - 1):
            ei[k], ej[k] = k, k + 1
            Rm[k] = Rg[k].T @ Rg[k + 1] @ _rand_rot(rng, drift)
            tm[k] = Rg[k].T @ (pg[k + 1] - pg[k]) + rng.normal(size=3) * drift
            w[k] = 1e4
            ev[k] = True
        if with_loop:
            ei[N - 1], ej[N - 1] = 0, N - 1
            Rm[N - 1] = Rg[0].T @ Rg[N - 1]
            tm[N - 1] = Rg[0].T @ (pg[N - 1] - pg[0])
            w[N - 1] = 1e6
            ev[N - 1] = True

        # initial values: integrate noisy odometry (accumulates drift)
        R0 = [np.eye(3, dtype=np.float32)]
        p0 = [pg[0].astype(np.float32)]
        R0[0] = Rg[0].astype(np.float32)
        for k in range(N - 1):
            R0.append(R0[-1] @ Rm[k])
            p0.append(p0[-1] + R0[-2] @ tm[k])
        g = posegraph.PoseGraph(
            R=jnp.asarray(np.stack(R0)), p=jnp.asarray(np.stack(p0)),
            pose_valid=jnp.ones(N, bool),
            ei=jnp.asarray(ei), ej=jnp.asarray(ej),
            Rm=jnp.asarray(Rm), tm=jnp.asarray(tm), w=jnp.asarray(w),
            edge_valid=jnp.asarray(ev),
            anchor=jnp.asarray(np.arange(N) == 0),
        )
        return g, np.stack(Rg), pg

    def test_loop_closure_reduces_drift(self):
        rng = np.random.default_rng(0)
        g, Rg, pg = self._chain_graph(rng)
        drift_before = np.linalg.norm(np.asarray(g.p) - pg, axis=1).max()
        R, p, chi2, _ = posegraph.optimize(g, n_iters=10, cg_iters=60)
        drift_after = np.linalg.norm(np.asarray(p) - pg, axis=1).max()
        assert drift_after < 0.55 * drift_before
        # anchored pose unchanged
        np.testing.assert_allclose(np.asarray(p)[0], pg[0], atol=1e-3)

    def test_perfect_edges_zero_residual(self):
        rng = np.random.default_rng(1)
        g, Rg, pg = self._chain_graph(rng, drift=0.0)
        R, p, chi2, _ = posegraph.optimize(g, n_iters=5, cg_iters=40)
        assert float(chi2) < 1e-3

    def test_disconnected_components_each_anchored(self):
        """Two session chains with no cross edges: each component must
        hold its own gauge (anchor mask), not drift or collapse."""
        rng = np.random.default_rng(8)
        N = 10  # per chain
        R = np.tile(np.eye(3, dtype=np.float32), (2 * N, 1, 1))
        p = np.zeros((2 * N, 3), np.float32)
        p[:N, 0] = np.arange(N)
        p[N:, 0] = np.arange(N)
        p[N:, 2] = 30.0  # second session offset
        ei, ej, Rm, tm = [], [], [], []
        for base in (0, N):
            for i in range(N - 1):
                ei.append(base + i)
                ej.append(base + i + 1)
                Rm.append(np.eye(3, dtype=np.float32))
                tm.append(p[base + i + 1] - p[base + i]
                          + rng.normal(size=3).astype(np.float32) * 0.01)
        E = len(ei)
        anchor = np.zeros(2 * N, bool)
        anchor[0] = anchor[N] = True
        g = posegraph.PoseGraph(
            R=jnp.asarray(R), p=jnp.asarray(p),
            pose_valid=jnp.ones(2 * N, bool),
            ei=jnp.asarray(np.asarray(ei, np.int32)),
            ej=jnp.asarray(np.asarray(ej, np.int32)),
            Rm=jnp.asarray(np.stack(Rm)), tm=jnp.asarray(np.stack(tm)),
            w=jnp.full((E, 6), 1e4, jnp.float32),
            edge_valid=jnp.ones(E, bool),
            anchor=jnp.asarray(anchor),
        )
        Ro, po, chi2, _ = posegraph.optimize(g, n_iters=5, cg_iters=40)
        po = np.asarray(po)
        assert np.isfinite(po).all()
        # both anchors held
        np.testing.assert_allclose(po[0], p[0], atol=1e-3)
        np.testing.assert_allclose(po[N], p[N], atol=1e-3)
        # chains stay near their odometry (no gauge collapse)
        assert np.abs(po - p).max() < 0.2


class TestIcp:
    def test_recovers_transform(self):
        rng = np.random.default_rng(2)
        # plane cells from a room: centers + normals
        M = 300
        ctr = []
        nrm = []
        for _ in range(M):
            axis = rng.integers(0, 3)
            n = np.zeros(3); n[axis] = rng.choice([-1, 1])
            c = rng.uniform(-5, 5, 3); c[axis] = rng.choice([-3.0, 3.0])
            ctr.append(c); nrm.append(n)
        ctr = np.asarray(ctr, np.float32)
        nrm = np.asarray(nrm, np.float32)
        R_true = _rand_rot(rng, 0.1)
        t_true = rng.normal(size=3) * 0.5
        src_c = ((ctr - t_true) @ R_true).astype(np.float32)  # inverse map
        src_n = (nrm @ R_true).astype(np.float32)
        res = icp.icp_plane(
            jnp.asarray(src_c), jnp.asarray(src_n), jnp.ones(M, bool),
            jnp.asarray(ctr), jnp.asarray(nrm), jnp.ones(M, bool),
            jnp.eye(3, dtype=jnp.float32) , jnp.zeros(3, jnp.float32),
            icp_eigval=10.0,
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.t), t_true, atol=2e-2)
        dR = so3.log(jnp.asarray(R_true.T, jnp.float32) @ res.R)
        assert np.abs(np.asarray(dR)).max() < 2e-2

    def test_hessian_noise_scales_with_geometry(self):
        """hdiag (the GN Hessian diagonal exported for loop-edge
        noise, voxelslam.cpp:1761-1765) must grow with the match
        geometry: a strong loop (many well-spread plane cells) gets a
        tighter v6 than a weak one (few cells)."""
        from voxelslam_tpu.loop.manager import LoopManager

        def room(rng, M):
            ctr, nrm = [], []
            for _ in range(M):
                axis = rng.integers(0, 3)
                n = np.zeros(3); n[axis] = rng.choice([-1, 1])
                c = rng.uniform(-5, 5, 3); c[axis] = rng.choice([-3.0, 3.0])
                ctr.append(c); nrm.append(n)
            return (np.asarray(ctr, np.float32), np.asarray(nrm, np.float32))

        res = {}
        for label, M in (("strong", 300), ("weak", 40)):
            rng = np.random.default_rng(5)
            ctr, nrm = room(rng, M)
            r = icp.icp_plane(
                jnp.asarray(ctr), jnp.asarray(nrm), jnp.ones(M, bool),
                jnp.asarray(ctr), jnp.asarray(nrm), jnp.ones(M, bool),
                jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
                icp_eigval=3.0,
            )
            assert bool(r.accepted)
            res[label] = np.asarray(r.hdiag)
        assert (res["strong"] > res["weak"]).all()
        v6s = LoopManager._edge_noise(res["strong"])
        v6w = LoopManager._edge_noise(res["weak"])
        assert (v6s < v6w).all(), (v6s, v6w)
        assert np.isfinite(v6s).all() and (v6s > 0).all()

    def test_weak_edge_moves_solution_less(self):
        """PGO weights differ across accepts: two CONFLICTING loop
        measurements on the same pose pair (one fixed-weight saying
        y=0, one variable saying y=0.5) split the pose by their
        relative information — a weak-geometry accept must barely move
        the solution while a strong one mostly wins."""
        N = 12
        shift = np.asarray([0.0, 0.5, 0.0], np.float32)

        def solve(loop_w):
            E = N + 1
            ei = np.zeros(E, np.int32); ej = np.zeros(E, np.int32)
            Rm = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
            tm = np.zeros((E, 3), np.float32)
            w = np.ones((E, 6), np.float32)
            ev = np.zeros(E, bool)
            for k in range(N - 1):
                ei[k], ej[k] = k, k + 1
                tm[k] = [1.0, 0.0, 0.0]
                w[k] = 1e2
                ev[k] = True
            # reference edge: last pose on the chain axis (y = 0)
            ei[N - 1], ej[N - 1] = 0, N - 1
            tm[N - 1] = np.asarray([N - 1.0, 0, 0], np.float32)
            w[N - 1] = 1e2
            ev[N - 1] = True
            # contested edge: claims the last pose sits `shift` off
            ei[N], ej[N] = 0, N - 1
            tm[N] = np.asarray([N - 1.0, 0, 0], np.float32) + shift
            w[N] = loop_w
            ev[N] = True
            p0 = np.stack(
                [np.arange(N), np.zeros(N), np.zeros(N)], axis=1
            ).astype(np.float32)
            g = posegraph.PoseGraph(
                R=jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                      (N, 1, 1))),
                p=jnp.asarray(p0),
                pose_valid=jnp.ones(N, bool),
                ei=jnp.asarray(ei), ej=jnp.asarray(ej),
                Rm=jnp.asarray(Rm), tm=jnp.asarray(tm),
                w=jnp.asarray(w), edge_valid=jnp.asarray(ev),
                anchor=jnp.asarray(np.arange(N) == 0),
            )
            _, p, _, _ = posegraph.optimize(g, n_iters=5, cg_iters=60)
            return float(np.asarray(p)[N - 1, 1])

        strong = solve(1e4)  # tight noise (big information)
        weak = solve(1e0)
        assert strong > 5 * max(weak, 1e-9), (strong, weak)
        assert strong > 0.35  # strong edge mostly wins (w 100:1)
        assert weak < 0.1  # weak edge barely moves (w 1:100)

    def test_rejects_degenerate(self):
        """Single-plane geometry: normal matrix rank-1 ⇒ rejected."""
        rng = np.random.default_rng(3)
        M = 100
        ctr = np.stack([rng.uniform(-5, 5, M), rng.uniform(-5, 5, M),
                        np.zeros(M)], axis=1).astype(np.float32)
        nrm = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (M, 1))
        res = icp.icp_plane(
            jnp.asarray(ctr), jnp.asarray(nrm), jnp.ones(M, bool),
            jnp.asarray(ctr), jnp.asarray(nrm), jnp.ones(M, bool),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            icp_eigval=10.0,
        )
        assert not bool(res.accepted)


def _keyframe_cloud(rng, R=np.eye(3), t=np.zeros(3), n_per=20000,
                    n_poles=40):
    """Dense room cloud in the keyframe's local frame: planes plus
    compact vertical 'pole' features (the corner anchors BTC keys on
    in real scans — uniform plane sampling alone has no repeatable
    occupancy corners)."""
    world = synthetic.make_room(size=(14.0, 10.0, 5.0), n_boxes=8, seed=5)
    pts = []
    m = world.center.shape[0]
    # area-proportional sampling (uniform surface density, like a
    # real scan) — equal per-plane counts starve the big walls below
    # the voxel_init_num gate and overweight tiny box faces
    areas = 4.0 * np.linalg.norm(world.u, axis=1) * np.linalg.norm(world.v, axis=1)
    counts = np.maximum((n_per * areas / areas.sum()).astype(int), 8)
    for i in range(m):
        k = counts[i]
        uv = rng.uniform(-1, 1, (k, 2))
        pts.append(world.center[i] + uv[:, :1] * world.u[i] + uv[:, 1:] * world.v[i])
    # fixed pole features (deterministic world structure)
    rng_w = np.random.default_rng(1234)
    for _ in range(n_poles):
        x, y = rng_w.uniform(-6, 6), rng_w.uniform(-4, 4)
        z0, z1 = -2.5, rng_w.uniform(-1.0, 2.0)
        k = 150
        z = rng.uniform(z0, z1, k)
        jitter = rng.normal(0, 0.02, (k, 2))
        pts.append(np.stack([x + jitter[:, 0], y + jitter[:, 1], z], axis=1))
    pts = np.concatenate(pts)
    local = (pts - t) @ R  # p_local = Rᵀ(p_w − t) with R = world R of kf
    return local.astype(np.float32)


class TestBtc:
    def test_extract_shapes_and_validity(self):
        rng = np.random.default_rng(4)
        pts = _keyframe_cloud(rng)
        p = btc.BtcParams(line_filter_enable=False)
        planes, desc = btc.extract(
            jnp.asarray(pts), jnp.ones(pts.shape[0], bool), p
        )
        assert int(jnp.sum(planes.valid)) > 20
        n_desc = int(jnp.sum(desc.valid))
        assert n_desc > 50
        sides = np.asarray(desc.sides)[np.asarray(desc.valid)]
        assert (sides[:, 0] <= sides[:, 1] + 1e-4).all()
        assert (sides[:, 1] <= sides[:, 2] + 1e-4).all()
        # sides within configured bounds (scaled by 1/0.2)
        assert (sides[:, 2] <= p.desc_max_len / p.side_resolution + 1e-3).all()

    def test_loop_detection_same_place(self):
        """Two keyframes of the same scene from different poses: the
        search must find the loop and recover the relative transform."""
        rng = np.random.default_rng(6)
        p = btc.BtcParams(line_filter_enable=False, n_proj=4, max_triangles=2048)
        sp = database.SearchParams(skip_near_num=30)
        db = database.Database(p, capacity_desc=1 << 14, capacity_kf=64)

        pts0 = _keyframe_cloud(rng)
        planes0, desc0 = btc.extract(
            jnp.asarray(pts0), jnp.ones(pts0.shape[0], bool), p
        )
        db.add(desc0, planes0, 0)

        # observer pose offset for the query keyframe
        R_off = _rand_rot(rng, 0.05)
        t_off = rng.normal(size=3) * 1.0
        pts1 = _keyframe_cloud(rng, R=R_off, t=t_off)
        planes1, desc1 = btc.extract(
            jnp.asarray(pts1), jnp.ones(pts1.shape[0], bool), p
        )
        cand = database.search(db, desc1, planes1, 40, sp)
        assert int(cand.frame[0]) == 0, f"loop not found: {cand}"
        assert float(cand.score[0]) > 0.4
        # T_loop maps query-local points to target-local (= world) frame
        pw = pts1 @ np.asarray(cand.R[0]).T + np.asarray(cand.t[0])
        pw_true = pts1 @ R_off.T + t_off
        err = np.linalg.norm(pw - pw_true, axis=1)
        assert np.median(err) < 0.5

    def test_skip_near_gate_is_per_session(self):
        """A fresh session must match a previous session's most recent
        keyframes (relocalization) even when the global frame-id gap is
        below skip_near_num — the gate applies same-session only
        (reference: per-session STDescManager, skip_near disabled for
        frozen sessions, voxelslam.cpp:401,1869)."""
        rng = np.random.default_rng(11)
        p = btc.BtcParams(line_filter_enable=False, n_proj=4, max_triangles=2048)
        sp = database.SearchParams(skip_near_num=30)
        db = database.Database(p, capacity_desc=1 << 14, capacity_kf=64)

        pts0 = _keyframe_cloud(rng)
        planes0, desc0 = btc.extract(
            jnp.asarray(pts0), jnp.ones(pts0.shape[0], bool), p
        )
        db.add(desc0, planes0, 5, session_id=0)  # session 0, frame 5

        R_off = _rand_rot(rng, 0.05)
        t_off = rng.normal(size=3) * 1.0
        pts1 = _keyframe_cloud(rng, R=R_off, t=t_off)
        planes1, desc1 = btc.extract(
            jnp.asarray(pts1), jnp.ones(pts1.shape[0], bool), p
        )
        # query frame 6, gap 1 << skip_near_num, but session 1
        cand = database.search(db, desc1, planes1, 6, sp, query_session=1)
        assert int(cand.frame[0]) == 5, "cross-session match blocked by skip_near"
        # same query from session 0 must be blocked
        cand0 = database.search(db, desc1, planes1, 6, sp, query_session=0)
        assert int(cand0.frame[0]) == -1

    def test_no_false_loop_different_place(self):
        rng = np.random.default_rng(7)
        p = btc.BtcParams(line_filter_enable=False, n_proj=4, max_triangles=2048)
        sp = database.SearchParams()
        db = database.Database(p, capacity_desc=1 << 14, capacity_kf=64)
        pts0 = _keyframe_cloud(rng)
        planes0, desc0 = btc.extract(
            jnp.asarray(pts0), jnp.ones(pts0.shape[0], bool), p
        )
        db.add(desc0, planes0, 0)
        # a different room
        rng2 = np.random.default_rng(99)
        world2 = synthetic.make_room(size=(7.0, 16.0, 3.0), n_boxes=3, seed=42)
        pts2 = []
        m = world2.center.shape[0]
        for i in range(m):
            uv = rng2.uniform(-1, 1, (4000 // m, 2))
            pts2.append(world2.center[i] + uv[:, :1] * world2.u[i] + uv[:, 1:] * world2.v[i])
        pts2 = np.concatenate(pts2).astype(np.float32)
        planes2, desc2 = btc.extract(
            jnp.asarray(pts2), jnp.ones(pts2.shape[0], bool), p
        )
        cand = database.search(db, desc2, planes2, 40, sp)
        assert float(cand.score[0]) < 0.5 or int(cand.frame[0]) == -1


class TestIcpOverlapGate:
    def _constellation(self, rng, n=60):
        ctr, nrm = [], []
        for _ in range(n):
            axis = rng.integers(0, 3)
            v = np.zeros(3); v[axis] = rng.choice([-1, 1])
            c = rng.uniform(-4, 4, 3); c[axis] = rng.choice([-2.0, 2.0])
            ctr.append(c); nrm.append(v)
        return (np.asarray(ctr, np.float32), np.asarray(nrm, np.float32))

    def test_aliased_partial_match_rejected(self):
        """An aliased match (only the shared constellation fits, the
        rest of the query cloud has no counterpart — e.g. the two
        ends of a corridor) must be rejected by the overlap-fraction
        gate even though the fit is converged and well-conditioned.
        This false positive was MEASURED: the stress corpus pushed a
        cross-session edge joining the corridor's two mouths (28 m
        apart in truth) and poisoned the merge."""
        rng = np.random.default_rng(5)
        tc, tn = self._constellation(rng)
        # query: the same constellation (identity fit), PLUS 2x as
        # many cells with no counterpart (the room behind the door)
        extra_c = rng.uniform(-4, 4, (120, 3)).astype(np.float32)
        extra_c[:, 1] += 9.0  # beyond the p2p gate of any target
        extra_n = np.zeros((120, 3), np.float32)
        extra_n[:, 2] = 1.0
        sc = np.concatenate([tc, extra_c])
        sn = np.concatenate([tn, extra_n])
        M, Q = len(tc), len(sc)
        kw = dict(icp_eigval=3.0)
        args = (
            jnp.asarray(sc), jnp.asarray(sn), jnp.ones(Q, bool),
            jnp.asarray(tc), jnp.asarray(tn), jnp.ones(M, bool),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        )
        res_off = icp.icp_plane(*args, min_match_frac=0.0, **kw)
        assert bool(res_off.accepted), (
            "without the gate the aliased fit passes (the bug)"
        )
        res_on = icp.icp_plane(*args, min_match_frac=0.35, **kw)
        assert not bool(res_on.accepted), (
            "overlap gate must reject the aliased partial match"
        )

    def test_true_match_passes_gate(self):
        rng = np.random.default_rng(6)
        tc, tn = self._constellation(rng, n=120)
        res = icp.icp_plane(
            jnp.asarray(tc), jnp.asarray(tn), jnp.ones(len(tc), bool),
            jnp.asarray(tc), jnp.asarray(tn), jnp.ones(len(tc), bool),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            icp_eigval=3.0, min_match_frac=0.35,
        )
        assert bool(res.accepted)
