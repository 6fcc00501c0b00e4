"""Loop-closure manager: keyframes, detection, PGO, map rebuild.

Host-side counterpart of the reference's loop thread
(`thd_loop_closure`, voxelslam.cpp:1806-2228) around the device
programs of btc/database/icp/posegraph.  Responsibilities:

- consume marginalized ScanPoses from the odometry front-end
  (`buf_lba2loop` equivalent) and append sequential odometry edges
  with their hessian-derived v6 noise (voxelslam.cpp:1909-1926);
- build keyframes: skip near-static scans (<5°, <0.1 m), merge
  win_size scans into a downsampled cloud in the base scan's local
  frame (voxelslam.cpp:1931-1977);
- BTC extract + database search per keyframe across all sessions,
  ICP-verify candidates (icp_normal), apply the same-/cross-session
  accept-and-optimize policies (voxelslam.cpp:1997-2069);
- on accepted optimization: batch pose-graph solve (replacing ISAM2,
  voxelslam.cpp:2090-2098), write back scan/keyframe poses, and hand
  the rigid correction dx of the latest pose to the front-end for its
  map rebuild (`loop_update` handshake, voxelslam.cpp:1478, 2168).

Multi-session: each session keeps its own scan-pose list; cross-
session loop edges merge sessions into one graph (build_graph,
voxelslam.cpp:1741-1802), which is how relocalization against
offline maps works (SURVEY.md §2.11).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core import so3
from ..ops import downsample
from . import btc, database, icp, posegraph


@dataclass
class Keyframe:
    session: int
    id: int  # global keyframe index (database frame id)
    first_scan: int  # index of base scan within its session
    R0: np.ndarray  # base pose (world)
    p0: np.ndarray
    cloud: np.ndarray  # (P, 3) local-frame merged cloud
    cloud_mask: np.ndarray
    jour: float = 0.0
    loadable: bool = False  # mid-term reload candidate (kf.exist)


@dataclass
class LoopEdge:
    s1: int  # session of target (earlier) keyframe
    s2: int  # session of query
    scan1: int  # scan index (within session s1)
    scan2: int
    R: np.ndarray  # measured relative: p_w1 = R p_w2... stored as
    t: np.ndarray  # x1⁻¹ ∘ x2 convention (between-factor i=scan1)
    v6: np.ndarray


class LoopManager:
    def __init__(
        self,
        btc_params: btc.BtcParams,
        search_params: database.SearchParams,
        win_size: int = 10,
        kf_downsample: float = 0.1,
        kf_max_points: int = 16384,
        icp_eigval: float = 10.0,
        min_kf_rot_deg: float = 5.0,
        min_kf_trans: float = 0.1,
        db_capacity: int = 1 << 17,
        kf_capacity: int = 2048,
        ratio_drift: float = 0.05,
        curr_halt: int = 10,
        prev_halt: int = 10,
    ):
        self.ratio_drift = ratio_drift
        self.curr_halt = curr_halt
        self.prev_halt = prev_halt
        self.p = btc_params
        self.sp = search_params
        self.win_size = win_size
        self.kf_downsample = kf_downsample
        self.kf_max_points = kf_max_points
        self.icp_eigval = icp_eigval
        self.min_kf_rot = np.deg2rad(min_kf_rot_deg)
        self.min_kf_trans = min_kf_trans

        self.db = database.Database(
            btc_params, capacity_desc=db_capacity, capacity_kf=kf_capacity
        )
        # per-session scan poses: list of dicts (R, p, v, v6, t)
        self.sessions: List[List[dict]] = [[]]
        self.keyframes: List[Keyframe] = []
        self.loop_edges: List[LoopEdge] = []
        self._pending: List[dict] = []  # scans waiting to form a keyframe
        self._last_kf_pose: Optional[tuple] = None
        self.n_loops_found = 0
        self.n_optimizations = 0
        self._since_opt = 10**9  # accepted loops since last optimization
        self._merged_sessions = set()  # session pairs already linked
        # per-linked-pair travel stamp: current-session jour at the
        # last ACCEPTED link — re-links are gated by
        # drift / travel-since-link < ratio_drift (the reference's
        # jours[id] bookkeeping, voxelslam.cpp:2043-2054)
        self._link_jour: dict = {}
        self.g_update_pending = False  # cross-session merge -> gravity
        #                                refresh in the window BA

    # ---------------------------------------------------------- sessions

    @property
    def session(self) -> int:
        return len(self.sessions) - 1

    def new_session(self):
        """reset_flag handling (voxelslam.cpp:1856-1887)."""
        self.sessions.append([])
        self._pending = []
        self._last_kf_pose = None

    # ------------------------------------------------------------- scans

    def nearest_loadable(self, pos: np.ndarray, radius: float = 10.0):
        """One loadable keyframe within radius of `pos` (the per-scan
        keyframe_loading query); marks it loaded."""
        for k in self.keyframes:
            if k.loadable and np.linalg.norm(k.p0 - pos) < radius:
                k.loadable = False
                return k
        return None

    def push_scan_pose(self, sp: dict) -> Optional[dict]:
        """Feed one marginalized ScanPose (R, p, v, v6, t, pts, mask).

        Returns a loop event dict when a pose-graph optimization ran:
        {"dx_R", "dx_p", "kf_clouds": [...]} for the front-end's
        loop_update; else None.
        """
        sess = self.sessions[-1]
        sp = dict(sp)
        sp["scan_idx"] = len(sess)
        # cumulative travel (jour) for drift/span policies
        if sess:
            prev = sess[-1]
            sp["jour"] = prev["jour"] + float(
                np.linalg.norm(sp["p"] - prev["p"])
            )
            # sequential between-measurement captured ONCE at arrival
            # time (the reference adds each BetweenFactor exactly once
            # with the odometry measurement, voxelslam.cpp:1915-1917,
            # and ISAM2 retains it across solves, 2090-2098).  Graph
            # assembly must use THIS, never the current (possibly
            # PGO-corrected) poses — regenerating measurements from a
            # bent chain makes every past correction zero-residual
            # "truth" and destroys the odometry information.
            sp["odom_Rm"] = prev["R"].T @ sp["R"]
            sp["odom_tm"] = prev["R"].T @ (sp["p"] - prev["p"])
        else:
            sp["jour"] = 0.0
        sess.append(sp)

        # keyframe gating: skip near-static scans (voxelslam.cpp:1932-1939)
        if self._last_kf_pose is not None:
            R_last, p_last = self._last_kf_pose
            # host-side rotation angle (a device so3.log here costs a
            # full tunnel round-trip PER SCAN on the axon device)
            ctheta = 0.5 * (np.trace(R_last.T @ sp["R"]) - 1.0)
            rot = float(np.arccos(np.clip(ctheta, -1.0, 1.0)))
            tra = float(np.linalg.norm(sp["p"] - p_last))
            if rot < self.min_kf_rot and tra < self.min_kf_trans:
                return None
        self._last_kf_pose = (sp["R"], sp["p"])
        self._pending.append(sp)
        if len(self._pending) < self.win_size:
            return None

        kf = self._build_keyframe(self._pending)
        self._pending = []
        return self._process_keyframe(kf)

    # --------------------------------------------------------- keyframes

    def _build_keyframe(self, scans: List[dict]) -> Keyframe:
        """Merge scans into the base scan's local frame + downsample
        (voxelslam.cpp:1944-1965)."""
        base = scans[0]
        R0, p0 = base["R"], base["p"]
        pts_local = []
        for s in scans:
            pts = s["pts"][s["mask"]]
            pw = pts @ s["R"].T + s["p"]
            pts_local.append((pw - p0) @ R0)
        pts_local = np.concatenate(pts_local).astype(np.float32)
        n = len(pts_local)
        P = self.kf_max_points
        pad = np.zeros((P, 3), np.float32)
        msk = np.zeros(P, bool)
        k = min(n, P)
        pad[:k] = pts_local[:k]
        msk[:k] = True
        ds = downsample.voxel_average(
            jnp.asarray(pad), jnp.asarray(msk), self.kf_downsample, P
        )
        kf = Keyframe(
            session=self.session,
            id=len(self.keyframes),
            first_scan=base["scan_idx"],
            R0=R0,
            p0=p0,
            cloud=np.asarray(ds.pts),
            cloud_mask=np.asarray(ds.mask),
        )
        self.keyframes.append(kf)
        return kf

    def _process_keyframe(self, kf: Keyframe) -> Optional[dict]:
        planes, desc = btc.extract(
            jnp.asarray(kf.cloud), jnp.asarray(kf.cloud_mask), self.p
        )
        cands = database.search(
            self.db, desc, planes, kf.id, self.sp, query_session=kf.session
        )
        self.db.add(desc, planes, kf.id, session_id=kf.session)

        # ICP-verify candidates in descending score order, accepting
        # AT MOST ONE PER TARGET SESSION — the reference runs
        # SearchLoop per session and can push one edge per session for
        # the same keyframe (voxelslam.cpp:1987-2069), so a
        # same-session accept never shadows a simultaneous
        # cross-session link (relocalization exactly when maps overlap).
        frames = np.asarray(cands.frame)
        accepted = []  # (IcpResult, target Keyframe)
        done_sessions = set()
        for ci in range(frames.shape[0]):
            frame = int(frames[ci])
            if frame < 0:
                break  # sorted by score: rest are below threshold
            cand_tgt = self.keyframes[frame]
            if cand_tgt.session in done_sessions:
                continue
            tgt_planes = btc.PlaneCloud(
                center=self.db.kf_plane_c[frame],
                normal=self.db.kf_plane_n[frame],
                valid=self.db.kf_plane_v[frame],
            )
            r = icp.icp_plane(
                planes.center, planes.normal, planes.valid,
                tgt_planes.center, tgt_planes.normal, tgt_planes.valid,
                cands.R[ci], cands.t[ci], icp_eigval=self.icp_eigval,
            )
            if bool(r.accepted):
                self.n_loops_found += 1
                accepted.append((r, cand_tgt))
                done_sessions.add(cand_tgt.session)
        if not accepted:
            return None

        need = False
        opt_tgt = None
        for res, tgt in accepted:
            pushed, want_opt = self._gate_and_push_edge(
                kf, np.asarray(res.R), np.asarray(res.t), tgt
            )
            if pushed and want_opt:
                need = True
                opt_tgt = tgt
        if not need:
            return None
        self._since_opt = 0
        return self._optimize(kf, opt_tgt)

    def _gate_and_push_edge(
        self, kf: Keyframe, Rm: np.ndarray, tm: np.ndarray, tgt: Keyframe
    ) -> tuple:
        """Apply the accept/optimize policies to one verified loop
        (voxelslam.cpp:1997-2069) and push the edge if plausible.

        Loop edge between base scans: T maps query-local -> target-
        local, i.e. x_tgt ∘ T ≈ x_qry  ⇒  between(scan_tgt, scan_qry)
        measurement = T.  Returns (edge_pushed, wants_optimize)."""
        v6 = np.full(6, 1e-4, np.float32)
        # drift = discrepancy between measured and estimated relative
        # pose
        p_pred = tgt.R0 @ tm + tgt.p0
        drift = float(np.linalg.norm(p_pred - kf.p0))
        self.last_drift = drift
        same = tgt.session == kf.session
        pair = (min(tgt.session, kf.session), max(tgt.session, kf.session))
        kf_jour = self.sessions[kf.session][kf.first_scan]["jour"]
        if same:
            q = self.sessions[kf.session]
            span = abs(
                q[kf.first_scan]["jour"] - q[tgt.first_scan]["jour"]
            ) + 1e-6
            if drift / span > self.ratio_drift and drift > 1.0:
                return False, False  # implausible same-session loop
        elif pair in self._merged_sessions:
            # RE-link of an already-connected session: gate by
            # drift / travel-since-last-link < ratio_drift (the
            # reference's drift/jours[id] < 0.05, voxelslam.cpp:
            # 2043-2054) — a bad cross-session ICP accept must not
            # enter the graph with fixed 1e-4 noise.  Small absolute
            # drifts pass outright (travel right after a link is ~0).
            travel = kf_jour - self._link_jour.get(pair, 0.0)
            if drift / max(travel, 1e-6) > self.ratio_drift and drift > 0.1:
                return False, False
        first_link = (not same) and pair not in self._merged_sessions
        self.loop_edges.append(
            LoopEdge(
                s1=tgt.session, s2=kf.session,
                scan1=tgt.first_scan, scan2=kf.first_scan,
                R=Rm, t=tm, v6=v6,
            )
        )
        self._since_opt += 1
        if first_link:
            self._merged_sessions.add(pair)
            self.g_update_pending = True  # g refresh (g_update=2)
        if not same:
            self._link_jour[pair] = kf_jour
        halt = self.curr_halt if same else self.prev_halt
        want = first_link or (
            drift > (0.10 if same else 0.25) and self._since_opt > halt
        )
        return True, want

    # --------------------------------------------------------------- PGO

    def _graph_arrays(self):
        """Assemble all sessions' chains + loop edges into one padded
        PoseGraph (build_graph, voxelslam.cpp:1741-1802)."""
        offsets = []
        n = 0
        for sess in self.sessions:
            offsets.append(n)
            n += len(sess)
        Rs = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
        ps = np.zeros((n, 3), np.float32)
        for off, sess in zip(offsets, self.sessions):
            for i, s in enumerate(sess):
                Rs[off + i] = s["R"]
                ps[off + i] = s["p"]
        ei, ej, Rm, tm, w = [], [], [], [], []
        for off, sess in zip(offsets, self.sessions):
            for i in range(len(sess) - 1):
                a, b = sess[i], sess[i + 1]
                ei.append(off + i)
                ej.append(off + i + 1)
                # stored odometry measurement (captured at arrival in
                # push_scan_pose); the fallback covers poses injected
                # outside that path (defensive only)
                if "odom_Rm" in b:
                    Rm.append(b["odom_Rm"])
                    tm.append(b["odom_tm"])
                else:
                    Rm.append(a["R"].T @ b["R"])
                    tm.append(a["R"].T @ (b["p"] - a["p"]))
                w.append(1.0 / np.maximum(b["v6"], 1e-8))
        for e in self.loop_edges:
            ei.append(offsets[e.s1] + e.scan1)
            ej.append(offsets[e.s2] + e.scan2)
            Rm.append(e.R)
            tm.append(e.t)
            w.append(1.0 / np.maximum(e.v6, 1e-8))
        E = len(ei)
        # One anchor per connected component of sessions (PGO_Edges
        # connect/tras, loop_refine.hpp:163-267): a disconnected
        # session's chain has no gauge otherwise.  Union-find over
        # sessions linked by loop edges; anchor each root session's
        # first pose.
        parent = list(range(len(self.sessions)))

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for e in self.loop_edges:
            ra, rb = find(e.s1), find(e.s2)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        anchor = np.zeros(n, bool)
        for si, (off, sess) in enumerate(zip(offsets, self.sessions)):
            if sess and find(si) == si:
                anchor[off] = True
        g = posegraph.PoseGraph(
            R=jnp.asarray(Rs), p=jnp.asarray(ps),
            pose_valid=jnp.ones(n, bool),
            ei=jnp.asarray(np.asarray(ei, np.int32)),
            ej=jnp.asarray(np.asarray(ej, np.int32)),
            Rm=jnp.asarray(np.stack(Rm).astype(np.float32)),
            tm=jnp.asarray(np.stack(tm).astype(np.float32)),
            w=jnp.asarray(np.stack(w).astype(np.float32)),
            edge_valid=jnp.ones(E, bool),
            anchor=jnp.asarray(anchor),
        )
        return g, offsets

    def _optimize(self, kf: Keyframe, tgt: Keyframe) -> dict:
        """Solve the pose graph and write back (voxelslam.cpp:2088-2175)."""
        g, offsets = self._graph_arrays()
        R, p, chi2 = posegraph.optimize(g)
        R = np.asarray(R)
        p = np.asarray(p)
        self.n_optimizations += 1

        # rigid correction of the CURRENT session's latest scan
        sess = self.sessions[-1]
        off = offsets[-1]
        last = len(sess) - 1
        R_old = sess[last]["R"]
        p_old = sess[last]["p"]
        R_new = R[off + last]
        p_new = p[off + last]
        dx_R = R_new @ R_old.T
        dx_p = p_new - dx_R @ p_old

        # write back all poses (set_state semantics incl. velocity
        # rotation, loop_refine.hpp:36-43)
        for o, s_list in zip(offsets, self.sessions):
            for i, s in enumerate(s_list):
                rot = R[o + i] @ s["R"].T
                s["v"] = rot @ s["v"]
                s["R"] = R[o + i]
                s["p"] = p[o + i]
        for k in self.keyframes:
            o = offsets[k.session]
            k.R0 = R[o + k.first_scan]
            k.p0 = p[o + k.first_scan]

        # recent keyframes for the front-end map rebuild (last 5,
        # voxelslam.cpp:2131-2150); older ones become mid-term reload
        # candidates (kd_keyframes registration, voxelslam.cpp:2152-2167)
        recent = self.keyframes[-5:]
        for k in self.keyframes[:-5]:
            k.loadable = True
        return dict(
            dx_R=dx_R, dx_p=dx_p,
            kf_clouds=[
                (k.cloud, k.cloud_mask, k.R0, k.p0) for k in recent
            ],
            chi2=float(chi2),
            target_session=tgt.session,
        )
