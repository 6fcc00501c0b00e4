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
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import so3
from ..ops import downsample
from ..utils import spill as _spill
from . import btc, database, icp, posegraph


@partial(
    jax.jit,
    static_argnames=(
        "p", "sp", "capacity_kf", "n_icp", "icp_eigval",
        "icp_min_match_frac", "kf_ds", "m_out"
    ),
    donate_argnums=(0,),
)
def keyframe_program(
    db: database.DbState,
    raw_pts: jnp.ndarray,  # (m_out, 3) merged local cloud, pre-downsample
    raw_mask: jnp.ndarray,  # (m_out,)
    count,  # () int32 descriptor write offset
    frame_id,  # () int32 keyframe id
    session_id,  # () int32
    *,
    p: btc.BtcParams,
    sp: database.SearchParams,
    capacity_kf: int,
    n_icp: int,
    icp_eigval: float,
    icp_min_match_frac: float,
    kf_ds: float,
    m_out: int,
):
    """The ENTIRE per-keyframe loop path as one device program:
    downsample → BTC extract → database search → db append → ICP-verify
    the top `n_icp` candidates.  One dispatch + one small fetch per
    keyframe — running these stages eagerly costs a ~30 ms tunnel
    round-trip PER OP on the axon device (seconds per keyframe).

    Returns (new_db, ds_pts, ds_mask, candidates, icp_results); the
    accept/edge policies stay on the host (manager._process_keyframe).
    """
    if kf_ds > 0:
        ds = downsample.voxel_average(raw_pts, raw_mask, kf_ds, m_out)
        ds_pts, ds_mask = ds.pts, ds.mask
    else:
        # kf_ds <= 0: the merged cloud was already voxel-averaged on
        # the host (native.voxel_centroid) — skip the device sort
        # (~9 ms/keyframe of serialized device time at m_out=16384)
        ds_pts, ds_mask = raw_pts, raw_mask
    planes, desc = btc.extract(ds_pts, ds_mask, p)
    cands = database.search_state(
        db, capacity_kf, desc, planes, frame_id, sp,
        query_session=session_id,
    )
    new_db = database.add_state(db, desc, planes, count, frame_id, session_id)

    def one(ci):
        f = jnp.clip(cands.frame[ci], 0)
        return icp.icp_plane(
            planes.center, planes.normal, planes.valid,
            db.kf_plane_c[f], db.kf_plane_n[f], db.kf_plane_v[f],
            cands.R[ci], cands.t[ci], icp_eigval=icp_eigval,
            min_match_frac=icp_min_match_frac,
            # placeholder lanes start converged: a keyframe with no
            # candidate above threshold pays zero ICP iterations
            valid=cands.frame[ci] >= 0,
        )

    rs = jax.vmap(one)(jnp.arange(n_icp))
    return new_db, ds_pts, ds_mask, cands, rs


@dataclass
class Keyframe:
    session: int
    id: int  # global keyframe index (database frame id)
    first_scan: int  # index of base scan within its session
    R0: np.ndarray  # base pose (world)
    p0: np.ndarray
    cloud: Optional[np.ndarray]  # (P, 3) local-frame merged cloud
    cloud_mask: Optional[np.ndarray]
    jour: float = 0.0
    loadable: bool = False  # mid-term reload candidate (kf.exist)
    _spill: Optional[tuple] = None  # (CloudSpill, record id)

    def get_cloud(self):
        """(cloud, mask), materializing from the spill store if the
        RAM copy was dropped (utils/spill.py)."""
        if self.cloud is not None:
            return self.cloud, self.cloud_mask
        store, rid = self._spill
        return store.get(rid)

    def spill(self, store) -> None:
        if store is None or self.cloud is None:
            return
        self._spill = (store, store.put(self.cloud, self.cloud_mask))
        self.cloud = None
        self.cloud_mask = None


class _SessChain:
    """Per-session numpy mirror of the scan-pose chain, grown on
    arrival (amortized O(1) append).  PGO graph assembly reads ONLY
    these arrays — a solve is a concat + pad instead of a Python walk
    over every scan dict (the reference keeps its chain incremental
    inside ISAM2 for the same reason, voxelslam.cpp:2090-2098).  The
    scan-pose dicts remain the source of truth for every other
    consumer; all three pose-mutation paths (append, rigid connect,
    PGO writeback) update both."""

    __slots__ = ("cap", "n", "R", "p", "v", "g", "Rm", "tm", "w")

    def __init__(self, cap: int = 256):
        self.cap = cap
        self.n = 0
        self.R = np.zeros((cap, 3, 3))
        self.p = np.zeros((cap, 3))
        self.v = np.zeros((cap, 3))
        self.g = np.zeros((cap, 3))
        # row i: the sequential between-measurement INTO scan i
        # (row 0 unused) and its information weight
        self.Rm = np.zeros((cap, 3, 3))
        self.tm = np.zeros((cap, 3))
        self.w = np.zeros((cap, 6))

    def _grow(self):
        new_cap = self.cap * 2
        for name in self.__slots__[2:]:
            a = getattr(self, name)
            b = np.zeros((new_cap,) + a.shape[1:], a.dtype)
            b[: self.n] = a[: self.n]
            setattr(self, name, b)
        self.cap = new_cap

    def append(self, sp: dict):
        if self.n == self.cap:
            self._grow()
        i = self.n
        self.R[i] = sp["R"]
        self.p[i] = sp["p"]
        self.v[i] = sp.get("v", 0.0)
        self.g[i] = sp.get("g", 0.0)
        if "odom_Rm" in sp:
            self.Rm[i] = sp["odom_Rm"]
            self.tm[i] = sp["odom_tm"]
            self.w[i] = 1.0 / np.maximum(sp["v6"], 1e-8)
        self.n = i + 1

    def rigid(self, G_R: np.ndarray, G_p: np.ndarray):
        """Apply a rigid frame move to every pose (component connect)."""
        n = self.n
        if n == 0:
            return
        self.R[:n] = np.einsum("ij,njk->nik", G_R, self.R[:n])
        self.p[:n] = self.p[:n] @ G_R.T + G_p
        self.v[:n] = self.v[:n] @ G_R.T
        self.g[:n] = self.g[:n] @ G_R.T

    def set_poses(self, R_new: np.ndarray, p_new: np.ndarray):
        """PGO writeback: install solved poses, rotating v/g by the
        per-scan orientation delta (set_state semantics,
        loop_refine.hpp:36-43).  Returns the rotated (v, g) so the
        caller can sync the scan-pose dicts without re-deriving."""
        n = self.n
        rot = np.einsum("nij,nkj->nik", R_new, self.R[:n])
        v_new = np.einsum("nij,nj->ni", rot, self.v[:n])
        g_new = np.einsum("nij,nj->ni", rot, self.g[:n])
        self.R[:n] = R_new
        self.p[:n] = p_new
        self.v[:n] = v_new
        self.g[:n] = g_new
        return v_new, g_new


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
        icp_min_match_frac: float = 0.35,
        min_kf_rot_deg: float = 5.0,
        min_kf_trans: float = 0.1,
        db_capacity: int = 1 << 17,
        kf_capacity: int = 2048,
        ratio_drift: float = 0.05,
        curr_halt: int = 10,
        prev_halt: int = 10,
        n_icp: Optional[int] = None,
        relocal_witnesses: int = 1,
        kf_inflight: int = 1,
        witness_timeout_kfs: int = 8,
        spill_dir: Optional[str] = None,
    ):
        self.ratio_drift = ratio_drift
        # cross-session merge policy: 1 = commit on the first
        # verified link (reference behavior); >=2 = require that many
        # pairwise-consistent links (robust to perceptual aliasing)
        self.relocal_witnesses = relocal_witnesses
        # fallback for stranded true merges: a held candidate that is
        # never contradicted commits with inflated noise after this
        # many subsequent keyframes (0 disables)
        self.witness_timeout_kfs = witness_timeout_kfs
        self.curr_halt = curr_halt
        self.prev_halt = prev_halt
        self.p = btc_params
        self.sp = search_params
        self.win_size = win_size
        self.kf_downsample = kf_downsample
        self.kf_max_points = kf_max_points
        # host-side keyframe downsample: voxel-average the merged
        # cloud with the native centroid reducer so the device program
        # compiles WITHOUT its sort-based downsample stage (kf_ds=0).
        # Decided once at construction — kf_ds is a static program
        # argument, so per-keyframe switching would compile two
        # programs.  Fallback: no native lib -> device path unchanged.
        try:
            from .. import native as _nat

            L = _nat.lib()
            self._host_kf_ds = bool(
                kf_downsample > 0 and L is not None
                and hasattr(L, "voxel_centroid")
            )
        except Exception:
            self._host_kf_ds = False
        self._kf_ds_device = 0.0 if self._host_kf_ds else float(
            kf_downsample
        )
        self.icp_eigval = icp_eigval
        self.icp_min_match_frac = icp_min_match_frac
        # candidates ICP-verified in-program per keyframe
        self.n_icp = n_icp if n_icp else search_params.candidate_num
        self.min_kf_rot = np.deg2rad(min_kf_rot_deg)
        self.min_kf_trans = min_kf_trans

        self.db = database.Database(
            btc_params, capacity_desc=db_capacity, capacity_kf=kf_capacity
        )
        # per-session scan poses: list of dicts (R, p, v, v6, t)
        self.sessions: List[List[dict]] = [[]]
        # numpy mirrors for O(1)-per-scan PGO graph assembly
        self._chains: List[_SessChain] = [_SessChain()]
        # disk spill for long-run RSS (reference streams PCDs out and
        # frees, voxelslam.cpp:163-174): scan clouds spill once older
        # than the keyframe-builder lag; keyframe clouds spill from
        # _optimize once out of the recent window
        self.spill_dir = spill_dir
        self._spill_store = None
        self._spill_lag = win_size * 2 + 4
        self._spill_cursors: List[int] = [0]
        self.keyframes: List[Keyframe] = []
        self.loop_edges: List[LoopEdge] = []
        self._pending: List[dict] = []  # scans waiting to form a keyframe
        # in-flight keyframe device programs (FIFO).  `kf_inflight` is
        # how many may be outstanding before push_scan_pose resolves
        # the oldest: at 1 the resolve happens one keyframe (~10 scans)
        # after dispatch, which still blocks behind the frontend's
        # in-flight batch queue (~2 batches of device time, measured
        # ~9 ms/scan amortized on the full-system bench); at 2 the
        # program has ~20 scans of device time and the resolve is a
        # pure transfer.  Loop corrections arrive one keyframe later —
        # the same staleness the async writeback already tolerates.
        self.kf_inflight = max(1, int(kf_inflight))
        # Each entry: [kf, device_outs, barrier_seq|None, host_outs|None].
        # `barrier_seq` is the frontend's newest dispatched-batch seq at
        # keyframe-dispatch time: the device executes programs in
        # dispatch order, so once any batch with seq > barrier_seq has
        # RESOLVED, this keyframe program is certainly finished and its
        # outputs can ride the SAME jax.device_get as that batch
        # (co-resolve) — one tunnel round-trip instead of a separate
        # ~30-50 ms RPC per keyframe (the dominant full-system host
        # cost, BENCH_r04 kf_resolve 55.6 ms).  A prefetch THREAD was
        # tried and reverted (commit 5149a32): the tunnel transport
        # serializes a second thread's device_get against the steady
        # resolve stream.  Riding the one existing RPC avoids that.
        self._kf_queue: List[list] = []
        # co-resolve wiring (set by VoxelSLAM): callable returning the
        # frontend's newest dispatch seq.  None = standalone manager,
        # every resolve falls back to its own device_get.
        self.fe_seq = None
        # lag=1: co-resolve with the first batch dispatched AFTER the
        # keyframe program (guaranteed done, zero added wait).  lag=0:
        # ride the barrier batch itself — the get additionally waits
        # for the keyframe program's own execution (~20 ms device time
        # that a later resolve would absorb anyway); fresher events.
        self.co_resolve_lag = 1
        self._co_requested: List[list] = []
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
        # first cross-session links whose rigid connect is still
        # pending: (LoopEdge, kf, tgt, move_sessions|None) — applied
        # at the next _optimize, BEFORE the GN solve
        # (see _apply_pending_links)
        self._pending_links: list = []
        # held first-link candidates per unmerged pair (witness mode)
        self._candidate_links: dict = {}
        # last REJECTED relink per pair: (G_R, G_p, edge, kf, tgt) —
        # two consecutive rejections agreeing on the same frame
        # correction outvote a poisoned stored link (see
        # _gate_and_push_edge)
        self._rejected_relink: dict = {}
        self.g_update_pending = False  # cross-session merge -> gravity
        #                                refresh in the window BA
        # replay of SAVED sessions (previous_map_read): keyframes +
        # descriptors are rebuilt but no loop detection runs — the
        # inter-session links come from edge.txt via
        # install_prior_edges, never from re-verification
        self.replay_mode = False
        # host-cost attribution (sub-stages of the orchestrator's
        # `loop` stage); VoxelSLAM points this at the frontend's
        # Telemetry so one table covers the whole system
        from ..utils.telemetry import Telemetry

        self.telemetry = Telemetry()

    # ---------------------------------------------------------- sessions

    @property
    def session(self) -> int:
        return len(self.sessions) - 1

    def flush_pending(self) -> Optional[dict]:
        """Resolve ALL in-flight keyframes (end of stream / before PGO
        assembly at finish).  With kf_inflight > 1 several may resolve;
        their correction events compose — the combined frontend
        correction is returned (later events already operate on
        manager poses corrected by earlier ones)."""
        events = []
        while self._kf_queue:
            e = self._resolve_keyframe()
            if e is not None:
                events.append(e)
        return self._compose_events(events)

    @staticmethod
    def _compose_events(events: List[dict]) -> Optional[dict]:
        """Compose dx_2 ∘ dx_1 (applied left to right on frontend
        poses); later events already operate on manager poses corrected
        by earlier ones."""
        if not events:
            return None
        if len(events) == 1:
            return events[0]
        import numpy as _np

        R = _np.asarray(events[0]["dx_R"], _np.float32)
        p = _np.asarray(events[0]["dx_p"], _np.float32)
        for e in events[1:]:
            R2 = _np.asarray(e["dx_R"], _np.float32)
            p2 = _np.asarray(e["dx_p"], _np.float32)
            R, p = R2 @ R, R2 @ p + p2
        out = dict(events[-1])
        out["dx_R"], out["dx_p"] = R, p
        return out

    # ------------------------------------------------------ co-resolve

    def co_query(self, resolved_seq: int):
        """Called by the frontend JUST BEFORE its batch device_get:
        return the device outputs of every in-flight keyframe whose
        program is covered by the batch being resolved (see _kf_queue
        comment), so they transfer in the same RPC.  None when nothing
        qualifies (the common non-keyframe batch)."""
        ready = [
            e for e in self._kf_queue
            if e[3] is None and e[2] is not None
            and resolved_seq >= e[2] + self.co_resolve_lag
        ]
        self._co_requested = ready
        return [e[1] for e in ready] or None

    def co_deliver(self, host_outs) -> None:
        """Frontend hands back the host values fetched by co_query."""
        for e, h in zip(self._co_requested, host_outs):
            e[3] = h
        if self._co_requested:
            self.telemetry.count("kf_coresolved", len(self._co_requested))
        self._co_requested = []

    def resolve_ready(self) -> Optional[dict]:
        """Fold every keyframe whose outputs already sit on the host
        (co-resolved) — free, and fresher than waiting for the next
        keyframe build.  Returns the composed loop event, if any."""
        events = []
        while self._kf_queue and self._kf_queue[0][3] is not None:
            e = self._resolve_keyframe()
            if e is not None:
                events.append(e)
        return self._compose_events(events)

    def install_prior_edges(self, edges: List[dict]) -> int:
        """Install inter-session loop edges loaded from a saved
        edge.txt (previous_map_read's edge path, voxelslam.cpp:307-448):
        the linked sessions enter the graph ALREADY merged — components
        share one anchor and re-verification is never needed.  Each
        dict: {m1, m2, id1, id2, R, t, [v6]} with m* = loop-manager
        session indices and id* = scan indices within the session."""
        n_installed = 0
        for e in edges:
            s1, s2 = int(e["m1"]), int(e["m2"])
            if s1 >= len(self.sessions) or s2 >= len(self.sessions):
                continue
            n1, n2 = len(self.sessions[s1]), len(self.sessions[s2])
            if n1 == 0 or n2 == 0:
                continue
            v6 = e.get("v6")
            v6 = (
                np.full(6, 1e-4, np.float32) if v6 is None
                else np.asarray(v6, np.float32)
            )
            self.loop_edges.append(LoopEdge(
                s1=s1, s2=s2,
                scan1=min(int(e["id1"]), n1 - 1),
                scan2=min(int(e["id2"]), n2 - 1),
                R=np.asarray(e["R"], np.float64),
                t=np.asarray(e["t"], np.float64),
                v6=v6,
            ))
            pair = (min(s1, s2), max(s1, s2))
            self._merged_sessions.add(pair)
            self._link_jour[pair] = self.sessions[s2][-1]["jour"]
            n_installed += 1
        return n_installed

    def new_session(self):
        """reset_flag handling (voxelslam.cpp:1856-1887)."""
        # resolve the old session's in-flight keyframes first: their
        # PGO writeback corrections target that session's latest pose,
        # not the new (reset) one — the events are dropped (the
        # frontend map was just wiped anyway) but manager poses are
        # corrected.
        while self._kf_queue:
            self._resolve_keyframe()
        self.sessions.append([])
        self._chains.append(_SessChain())
        self._spill_cursors.append(0)
        self._pending = []
        self._last_kf_pose = None

    # ------------------------------------------------------------- scans

    def _store(self):
        if self._spill_store is None:
            import os as _os

            self._spill_store = _spill.CloudSpill(
                _os.path.join(self.spill_dir, f"clouds_{id(self):x}.bin")
            )
        return self._spill_store

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
        self._chains[-1].append(sp)
        if self.spill_dir is not None:
            with self.telemetry.stage("spill"):
                store = self._store()
                cur = self._spill_cursors[-1]
                hi = len(sess) - self._spill_lag
                while cur < hi:
                    _spill.spill_scan(store, sess[cur])
                    cur += 1
                self._spill_cursors[-1] = cur

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

        with self.telemetry.stage("kf_build"):
            kf, raw_pts, raw_mask = self._build_keyframe(self._pending)
        self._pending = []
        # dispatch-and-defer: fold keyframes whose outputs were already
        # co-resolved (free — they rode a batch device_get), then, only
        # if `kf_inflight` programs are still outstanding, force-resolve
        # the oldest with its own device_get (the pre-co-resolve
        # behavior; resolving immediately would block on the frontend
        # batch dispatched just before this drain).
        events = []
        while self._kf_queue and self._kf_queue[0][3] is not None:
            e = self._resolve_keyframe()
            if e is not None:
                events.append(e)
        if len(self._kf_queue) >= self.kf_inflight:
            e = self._resolve_keyframe()
            if e is not None:
                events.append(e)
        with self.telemetry.stage("kf_dispatch"):
            self._dispatch_keyframe(kf, raw_pts, raw_mask)
        return self._compose_events(events)

    # --------------------------------------------------------- keyframes

    def _build_keyframe(self, scans: List[dict]):
        """Merge scans into the base scan's local frame (host numpy —
        the downsample runs inside keyframe_program on device;
        voxelslam.cpp:1944-1965)."""
        base = scans[0]
        R0, p0 = base["R"], base["p"]
        pts_local = []
        for s in scans:
            p_full, m_full = _spill.fetch_scan(s)
            pts = p_full[m_full]
            pw = pts @ s["R"].T + s["p"]
            pts_local.append((pw - p0) @ R0)
        pts_local = np.concatenate(pts_local).astype(np.float32)
        n = len(pts_local)
        P = self.kf_max_points
        if n > P:  # even subsample (plain truncation drops whole scans)
            pts_local = pts_local[np.linspace(0, n - 1, P).astype(int)]
            n = P
        if self._host_kf_ds and n:
            # voxel-average here (native, ~0.3 ms) instead of inside
            # the device program (~9 ms of sort at m_out=16384); the
            # cap above bounds uniques <= P so overflow cannot occur
            from .. import native as _nat

            red = _nat.voxel_centroid(
                pts_local[:n], self.kf_downsample, P
            )
            if isinstance(red, np.ndarray):
                pts_local, n = red, len(red)
        pad = np.zeros((P, 3), np.float32)
        msk = np.zeros(P, bool)
        pad[:n] = pts_local
        msk[:n] = True
        kf = Keyframe(
            session=self.session,
            id=len(self.keyframes),
            first_scan=base["scan_idx"],
            R0=R0,
            p0=p0,
            cloud=pad,  # replaced by the downsampled cloud in
            cloud_mask=msk,  # _process_keyframe
        )
        self.keyframes.append(kf)
        return kf, pad, msk

    def _process_keyframe(self, kf: Keyframe, raw_pts: np.ndarray,
                          raw_mask: np.ndarray) -> Optional[dict]:
        """Synchronous keyframe processing (tests / offline): dispatch,
        then drain the whole queue so the returned event corresponds to
        the keyframe just dispatched (with older entries queued, a
        single resolve would return a DIFFERENT keyframe's event)."""
        self._dispatch_keyframe(kf, raw_pts, raw_mask)
        event = None
        while self._kf_queue:
            event = self._resolve_keyframe() or event
        return event

    def warmup(self) -> None:
        """Compile the per-keyframe device program before the first
        real keyframe needs it.  The program otherwise compiles inside
        the steady stream (~15 s observed on the tunneled TPU even with
        the persistent cache) — the single largest stall of the full
        system (BENCH_r03 stage `loop` max 14.8 s).  Mirrors the
        reference's design where the loop thread never blocks odometry
        (voxelslam.cpp:2617-2619).  A scratch DbState is donated so the
        live database is untouched."""
        if getattr(self, "_warmed", False):
            return
        self._warmed = True
        scratch = database.empty_state(
            self.p, self.db.capacity, self.db.capacity_kf
        )
        P = self.kf_max_points
        outs = keyframe_program(
            scratch,
            jnp.zeros((P, 3), jnp.float32), jnp.zeros((P,), bool),
            np.int32(0), np.int32(0), np.int32(0),
            p=self.p, sp=self.sp, capacity_kf=self.db.capacity_kf,
            n_icp=self.n_icp, icp_eigval=float(self.icp_eigval),
            icp_min_match_frac=float(self.icp_min_match_frac),
            kf_ds=self._kf_ds_device, m_out=self.kf_max_points,
        )
        # force execution to finish (block_until_ready does not
        # synchronize on the tunneled axon device); the compile itself
        # completed synchronously at dispatch
        jax.device_get(outs[2])

    def _dispatch_keyframe(self, kf: Keyframe, raw_pts: np.ndarray,
                           raw_mask: np.ndarray) -> None:
        assert len(self._kf_queue) < self.kf_inflight, (
            "keyframe dispatched with the in-flight queue full — "
            "resolve first"
        )
        T = self.p.max_triangles
        self.db.check_capacity(T, kf.id)
        new_db, ds_pts, ds_mask, cands_d, rs_d = keyframe_program(
            self.db.state, jnp.asarray(raw_pts), jnp.asarray(raw_mask),
            np.int32(self.db.count), np.int32(kf.id), np.int32(kf.session),
            p=self.p, sp=self.sp, capacity_kf=self.db.capacity_kf,
            n_icp=self.n_icp, icp_eigval=float(self.icp_eigval),
            icp_min_match_frac=float(self.icp_min_match_frac),
            kf_ds=self._kf_ds_device, m_out=self.kf_max_points,
        )
        self.db.state = new_db
        self.db.count += T
        self.db.n_kf = max(self.db.n_kf, kf.id + 1)
        barrier = self.fe_seq() if self.fe_seq is not None else None
        self._kf_queue.append(
            [kf, (ds_pts, ds_mask, cands_d, rs_d), barrier, None]
        )

    def _resolve_keyframe(self) -> Optional[dict]:
        """Fold the in-flight keyframe's results: accept/edge policies
        + possible PGO.  Called from the NEXT keyframe's dispatch and
        from flush_pending() (PGO assembly / finish)."""
        if not self._kf_queue:
            return None
        kf, outs, _barrier, host = self._kf_queue.pop(0)
        # one transfer for everything the host decides on — or zero,
        # when the outputs already rode a batch resolve (co_query)
        with self.telemetry.stage("kf_resolve"):
            if host is None:
                host = jax.device_get(outs)
            ds_pts, ds_mask, cands, rs = host
        kf.cloud = np.asarray(ds_pts)
        kf.cloud_mask = np.asarray(ds_mask)
        if self.replay_mode:
            return None  # descriptor/keyframe rebuild only

        # Accept candidates in descending score order, AT MOST ONE PER
        # TARGET SESSION — the reference runs SearchLoop per session and
        # can push one edge per session for the same keyframe
        # (voxelslam.cpp:1987-2069), so a same-session accept never
        # shadows a simultaneous cross-session link (relocalization
        # exactly when maps overlap).  ICP already ran in-program for
        # the top n_icp candidates.
        accepted = []  # (candidate row, target Keyframe)
        done_sessions = set()
        import os as _os
        _dbg = _os.environ.get("VOXELSLAM_LOOP_DEBUG")
        for ci in range(self.n_icp):
            frame = int(cands.frame[ci])
            if frame < 0:
                break  # sorted by score: rest are below threshold
            cand_tgt = self.keyframes[frame]
            if _dbg:
                print(
                    f"[loop-dbg] kf s{kf.session}:{kf.first_scan} cand"
                    f" {ci} -> s{cand_tgt.session}:"
                    f"{cand_tgt.first_scan} acc="
                    f"{bool(rs.accepted[ci])} conv="
                    f"{bool(rs.converged[ci])} eig="
                    f"{float(rs.min_eig[ci]):.1f} cnt="
                    f"{int(rs.match_count[ci])}"
                )
            if cand_tgt.session in done_sessions:
                continue
            if bool(rs.accepted[ci]):
                self.n_loops_found += 1
                accepted.append((ci, cand_tgt))
                done_sessions.add(cand_tgt.session)
        need = False
        opt_tgt = None
        for ci, tgt in accepted:
            hd = None if rs.hdiag is None else np.asarray(rs.hdiag[ci])
            pushed, want_opt = self._gate_and_push_edge(
                kf, np.asarray(rs.R[ci]), np.asarray(rs.t[ci]), tgt,
                hdiag=hd,
            )
            if pushed and want_opt:
                need = True
                opt_tgt = tgt
        t_need, t_tgt = self._age_candidate_links()
        if t_need and not need:
            need = True
            opt_tgt = t_tgt
        if not need:
            return None
        self._since_opt = 0
        return self._optimize(kf, opt_tgt)

    def _age_candidate_links(self) -> tuple:
        """Witness-mode fallback: every resolved keyframe ages the held
        first-link candidates; a hold that reaches `witness_timeout_kfs`
        without a contradicting candidate (which would have REPLACED it
        and restarted the clock) commits as a single-witness merge with
        its noise inflated x100 — a stranded true merge eventually
        lands, weakly weighted, instead of holding forever.  Returns
        (wants_optimize, target_keyframe)."""
        if not self._candidate_links or self.witness_timeout_kfs <= 0:
            return False, None
        need = False
        opt_tgt = None
        for pair in list(self._candidate_links):
            cand = self._candidate_links[pair]
            if pair in self._merged_sessions:  # merged by another path
                del self._candidate_links[pair]
                continue
            cand["age"] += 1
            if cand["age"] < self.witness_timeout_kfs:
                continue
            del self._candidate_links[pair]
            e, ckf, ctgt = cand["edge"], cand["kf"], cand["tgt"]
            e.v6 = np.clip(e.v6 * 100.0, 1e-6, 10.0).astype(np.float32)
            print(
                f"[voxelslam-tpu] witness timeout: committing "
                f"single-witness link s{e.s1}<-s{e.s2} with inflated "
                f"noise after {self.witness_timeout_kfs} keyframes"
            )
            self._pending_links.append((e, ckf, ctgt, None))
            self._merged_sessions.add(pair)
            self.g_update_pending = True
            self._link_jour[pair] = (
                self.sessions[ckf.session][ckf.first_scan]["jour"]
            )
            need = True
            opt_tgt = opt_tgt or ctgt
        return need, opt_tgt

    @staticmethod
    def _edge_noise(hdiag) -> np.ndarray:
        """Per-edge noise from the ICP Gauss-Newton Hessian diagonal:
        v6 = 1/|diag(H)| with floor/ceiling, the reference's
        hessian-derived noise (voxelslam.cpp:1761-1765, 2058-2069).
        Falls back to the old constant when no Hessian is available
        (stubbed programs / legacy callers)."""
        if hdiag is None:
            return np.full(6, 1e-4, np.float32)
        d = np.abs(np.asarray(hdiag, np.float64))
        return np.clip(1.0 / np.maximum(d, 1e-12), 1e-6, 1.0).astype(
            np.float32
        )

    def _gate_and_push_edge(
        self, kf: Keyframe, Rm: np.ndarray, tm: np.ndarray, tgt: Keyframe,
        hdiag: Optional[np.ndarray] = None,
    ) -> tuple:
        """Apply the accept/optimize policies to one verified loop
        (voxelslam.cpp:1997-2069) and push the edge if plausible.

        Loop edge between base scans: T maps query-local -> target-
        local, i.e. x_tgt ∘ T ≈ x_qry  ⇒  between(scan_tgt, scan_qry)
        measurement = T.  Returns (edge_pushed, wants_optimize)."""
        v6 = self._edge_noise(hdiag)
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
                # Poisoned-link escape hatch: if the FIRST link's ICP
                # yaw was wrong (accepted at a weakly-constrained
                # site), every later GOOD loop shows huge drift and
                # is rejected here forever.  Two independent
                # rejections that imply the SAME frame correction
                # outvote the stored link: replace the pair's edges,
                # rigidly re-connect the keyframe's session, and
                # force a solve.
                pred_R = tgt.R0 @ Rm
                pred_p = tgt.R0 @ tm + tgt.p0
                G_R = pred_R @ kf.R0.T
                G_p = pred_p - G_R @ kf.p0
                prev = self._rejected_relink.get(pair)
                ok = False
                if prev is not None:
                    pR, pp, pedge, pkf, ptgt = prev
                    c = (np.trace(pR.T @ G_R) - 1.0) / 2.0
                    dang = float(np.arccos(np.clip(c, -1.0, 1.0)))
                    dpos = float(np.linalg.norm(
                        (G_R @ kf.p0 + G_p) - (pR @ kf.p0 + pp)
                    ))
                    ok = dang < 0.09 and dpos < 3.0
                if not ok:
                    print(
                        f"[voxelslam-tpu] relink s{tgt.session}<-s"
                        f"{kf.session} REJECTED drift {drift:.2f} "
                        f"travel {travel:.2f}"
                    )
                    self._rejected_relink[pair] = (
                        G_R, G_p,
                        LoopEdge(
                            s1=tgt.session, s2=kf.session,
                            scan1=tgt.first_scan, scan2=kf.first_scan,
                            R=Rm, t=tm, v6=v6,
                        ),
                        kf, tgt,
                    )
                    return False, False
                # consistent pair of witnesses: drop the poisoned
                # edges, queue both agreeing edges + a rigid
                # re-connect of the keyframe's session chain
                del self._rejected_relink[pair]
                self.loop_edges = [
                    e for e in self.loop_edges
                    if (min(e.s1, e.s2), max(e.s1, e.s2)) != pair
                ]
                # current edge FIRST with an explicit move of the
                # keyframe's session chain (the component test would
                # be defeated by any remaining multi-hop connection);
                # the witness edge then appends plainly
                self._pending_links.append((
                    LoopEdge(
                        s1=tgt.session, s2=kf.session,
                        scan1=tgt.first_scan, scan2=kf.first_scan,
                        R=Rm, t=tm, v6=v6,
                    ),
                    kf, tgt, {kf.session},
                ))
                self._pending_links.append((pedge, pkf, ptgt, set()))
                self._link_jour[pair] = kf_jour
                return True, True
        first_link = (not same) and pair not in self._merged_sessions
        yaw = float(np.degrees(np.arctan2(Rm[1, 0], Rm[0, 0])))
        print(
            f"[voxelslam-tpu] loop edge s{tgt.session}:{tgt.first_scan}"
            f" <- s{kf.session}:{kf.first_scan} yaw {yaw:+.1f} deg"
            f" |t| {float(np.linalg.norm(tm)):.2f} drift {drift:.2f}"
            f"{' FIRST-LINK' if first_link else ''}"
        )
        edge = LoopEdge(
            s1=tgt.session, s2=kf.session,
            scan1=tgt.first_scan, scan2=kf.first_scan,
            R=Rm, t=tm, v6=v6,
        )
        if first_link and self.relocal_witnesses > 1:
            # Witness-based relocalization (PCM-style pairwise
            # consistency): a FIRST cross-session link has no prior —
            # any single match, including a perceptual alias (two
            # similar rooms), is self-consistent.  Commit the merge
            # only when TWO independent cross-links imply the same
            # rigid frame correction.
            pred_R = tgt.R0 @ Rm
            pred_p = tgt.R0 @ tm + tgt.p0
            G_R = pred_R @ kf.R0.T
            G_p = pred_p - G_R @ kf.p0
            prev = self._candidate_links.get(pair)
            agree = False
            if prev is not None:
                pR, pp = prev["G_R"], prev["G_p"]
                c = (np.trace(pR.T @ G_R) - 1.0) / 2.0
                dang = float(np.arccos(np.clip(c, -1.0, 1.0)))
                dpos = float(np.linalg.norm(
                    (G_R @ kf.p0 + G_p) - (pR @ kf.p0 + pp)
                ))
                agree = dang < 0.09 and dpos < 1.5
            if not agree:
                # hold (or replace a disagreeing hold — the timeout
                # clock restarts; age starts at -1 because this same
                # keyframe's resolve ages every hold by one)
                self._candidate_links[pair] = dict(
                    G_R=G_R, G_p=G_p, edge=edge, kf=kf, tgt=tgt,
                    age=-1,
                )
                print(
                    f"[voxelslam-tpu] first-link s{tgt.session}<-"
                    f"s{kf.session} HELD (awaiting consistent witness)"
                )
                return False, False
            del self._candidate_links[pair]
            self._pending_links.append((edge, kf, tgt, None))
            self._pending_links.append(
                (prev["edge"], prev["kf"], prev["tgt"], set())
            )
        elif first_link:
            # defer the append: the rigid component connect must see
            # the partition WITHOUT this edge (_apply_pending_links)
            self._pending_links.append((edge, kf, tgt, None))
        else:
            self.loop_edges.append(edge)
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

    def components(self) -> list:
        """Connected components of sessions under the accepted loop
        edges — the partition behind the per-component PGO anchors.
        Sessions in the component containing session 0 share session
        0's (ground-truth-aligned) frame after a solve; other
        components live in their own z-offset frames until a
        cross-session loop links them."""
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
        groups = {}
        for si in range(len(self.sessions)):
            groups.setdefault(find(si), []).append(si)
        return sorted(groups.values())

    def _graph_arrays(self, extra_edges=()):
        """Assemble all sessions' chains + loop edges into one padded
        PoseGraph (build_graph, voxelslam.cpp:1741-1802).

        Vectorized over the per-session numpy mirrors (_SessChain):
        poses and sequential measurements are slices, never a Python
        walk over scan dicts — at 10k scans assembly is ~1 ms instead
        of seconds, keeping per-loop-event PGO viable on long runs the
        way ISAM2's incrementality does for the reference.

        `extra_edges`: HBA hessian edges ({scan1: (sess, idx),
        scan2: (sess, idx), R, t, v6} dicts) appended at finish — the
        final top-down solve passes them here instead of unpacking and
        re-padding the device graph."""
        offsets = []
        n = 0
        for c in self._chains:
            offsets.append(n)
            n += c.n
        if n:
            Rs = np.concatenate(
                [c.R[: c.n] for c in self._chains if c.n]
            ).astype(np.float32)
            ps = np.concatenate(
                [c.p[: c.n] for c in self._chains if c.n]
            ).astype(np.float32)
        else:
            Rs = np.zeros((0, 3, 3), np.float32)
            ps = np.zeros((0, 3), np.float32)
        ei_l, ej_l, Rm_l, tm_l, w_l = [], [], [], [], []
        for off, c in zip(offsets, self._chains):
            if c.n >= 2:
                idx = np.arange(c.n - 1, dtype=np.int32)
                ei_l.append(off + idx)
                ej_l.append(off + idx + 1)
                Rm_l.append(c.Rm[1 : c.n])
                tm_l.append(c.tm[1 : c.n])
                w_l.append(c.w[1 : c.n])
        if self.loop_edges:
            ei_l.append(np.asarray(
                [offsets[e.s1] + e.scan1 for e in self.loop_edges],
                np.int32,
            ))
            ej_l.append(np.asarray(
                [offsets[e.s2] + e.scan2 for e in self.loop_edges],
                np.int32,
            ))
            Rm_l.append(np.stack([e.R for e in self.loop_edges]))
            tm_l.append(np.stack([e.t for e in self.loop_edges]))
            w_l.append(1.0 / np.maximum(
                np.stack([e.v6 for e in self.loop_edges]), 1e-8
            ))
        for e in extra_edges:
            s1, i1 = e["scan1"]
            s2, i2 = e["scan2"]
            ei_l.append(np.asarray([offsets[s1] + i1], np.int32))
            ej_l.append(np.asarray([offsets[s2] + i2], np.int32))
            Rm_l.append(np.asarray(e["R"])[None])
            tm_l.append(np.asarray(e["t"])[None])
            w_l.append(1.0 / np.maximum(
                np.asarray(e["v6"], np.float64)[None], 1e-8
            ))
        if ei_l:
            ei = np.concatenate(ei_l)
            ej = np.concatenate(ej_l)
            Rm = np.concatenate(Rm_l)
            tm = np.concatenate(tm_l)
            w = np.concatenate(w_l)
        else:
            ei = np.zeros(0, np.int32)
            ej = np.zeros(0, np.int32)
            Rm = np.zeros((0, 3, 3))
            tm = np.zeros((0, 3))
            w = np.zeros((0, 6))
        E_real = len(ei)
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
        for e in extra_edges:
            ra, rb = find(e["scan1"][0]), find(e["scan2"][0])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        anchor = np.zeros(n, bool)
        for si, (off, sess) in enumerate(zip(offsets, self.sessions)):
            if sess and find(si) == si:
                anchor[off] = True
        # pad poses/edges to size buckets so posegraph.optimize (jitted)
        # compiles once per bucket instead of once per keyframe-count —
        # the graph grows every scan, and an unpadded jit would
        # recompile the GN+PCG program at every optimization
        N = max(256, 1 << int(np.ceil(np.log2(n))))
        E = max(512, 1 << int(np.ceil(np.log2(max(E_real, 1)))))
        Rs_p = np.tile(np.eye(3, dtype=np.float32), (N, 1, 1))
        Rs_p[:n] = Rs
        ps_p = np.zeros((N, 3), np.float32)
        ps_p[:n] = ps
        ei_p = np.zeros(E, np.int32)
        ej_p = np.zeros(E, np.int32)
        Rm_p = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        tm_p = np.zeros((E, 3), np.float32)
        w_p = np.zeros((E, 6), np.float32)
        if E_real:
            ei_p[:E_real] = ei
            ej_p[:E_real] = ej
            Rm_p[:E_real] = Rm
            tm_p[:E_real] = tm
            w_p[:E_real] = w
        pose_valid = np.zeros(N, bool)
        pose_valid[:n] = True
        edge_valid = np.zeros(E, bool)
        edge_valid[:E_real] = True
        anchor_p = np.zeros(N, bool)
        anchor_p[:n] = anchor
        g = posegraph.PoseGraph(
            R=jnp.asarray(Rs_p), p=jnp.asarray(ps_p),
            pose_valid=jnp.asarray(pose_valid),
            ei=jnp.asarray(ei_p), ej=jnp.asarray(ej_p),
            Rm=jnp.asarray(Rm_p), tm=jnp.asarray(tm_p),
            w=jnp.asarray(w_p),
            edge_valid=jnp.asarray(edge_valid),
            anchor=jnp.asarray(anchor_p),
        )
        return g, offsets

    def _apply_pending_links(self):
        """Rigid component connect for first cross-session links (the
        reference's PGO_Edges connect/tras, loop_refine.hpp:163-267).

        A first link joins two components whose frames differ by a
        LARGE rigid transform (sessions restart z+30·k and with an
        arbitrary yaw): fed raw to GN+PCG, that correction must
        propagate hop-by-hop through every sequential edge — 8×50
        capped iterations leave the offset SMEARED along the chains
        (measured: z ramps of ~70 m inside one session).  Instead,
        rigidly move the newer component onto the older frame using
        the verified loop measurement itself, THEN let GN polish the
        (now small) residuals."""
        while self._pending_links:
            edge, kf, tgt, move_override = self._pending_links.pop(0)
            mv = None
            G_R = G_p = None
            # predicted query pose from the measurement:
            # x_qry ≈ x_tgt ∘ T  (T = edge.R, edge.t)
            pred_R = tgt.R0 @ edge.R
            pred_p = tgt.R0 @ edge.t + tgt.p0
            if move_override is not None:
                if move_override:  # explicit set of sessions to move
                    mv = set(move_override)
                    G_R = pred_R @ kf.R0.T
                    G_p = pred_p - G_R @ kf.p0
                # empty set: plain edge append, no move
            else:
                comps = self.components()  # partition WITHOUT this edge
                comp_kf = next(c for c in comps if kf.session in c)
                comp_tgt = next(c for c in comps if tgt.session in c)
                if comp_kf is not comp_tgt:
                    if min(comp_kf) > min(comp_tgt):
                        mv = set(comp_kf)
                        G_R = pred_R @ kf.R0.T
                        G_p = pred_p - G_R @ kf.p0
                    else:  # keep the anchor component fixed
                        mv = set(comp_tgt)
                        G_R = (kf.R0 @ edge.R.T) @ tgt.R0.T
                        G_p = (kf.p0 - kf.R0 @ edge.R.T @ edge.t
                               - G_R @ tgt.p0)
            if mv:
                for si in mv:
                    ch = self._chains[si]
                    ch.rigid(G_R, G_p)
                    for i, s in enumerate(self.sessions[si]):
                        s["R"] = ch.R[i].copy()
                        s["p"] = ch.p[i].copy()
                        s["v"] = ch.v[i].copy()
                        s["g"] = ch.g[i].copy()
                for k in self.keyframes:
                    if k.session in mv:
                        k.R0 = G_R @ k.R0
                        k.p0 = G_R @ k.p0 + G_p
            self.loop_edges.append(edge)

    def write_back(self, R: np.ndarray, p: np.ndarray, offsets) -> None:
        """Install solved PGO poses into the chains, scan-pose dicts,
        and keyframes (set_state incl. velocity/gravity rotation,
        loop_refine.hpp:36-43) — vectorized per session; the dict sync
        assigns precomputed rows only."""
        for o, ch, s_list in zip(offsets, self._chains, self.sessions):
            nn = ch.n
            if nn == 0:
                continue
            v_new, g_new = ch.set_poses(R[o : o + nn], p[o : o + nn])
            for i, s in enumerate(s_list):
                s["R"] = R[o + i]
                s["p"] = p[o + i]
                s["v"] = v_new[i]
                s["g"] = g_new[i]
        for k in self.keyframes:
            o = offsets[k.session]
            k.R0 = R[o + k.first_scan]
            k.p0 = p[o + k.first_scan]

    def _optimize(self, kf: Keyframe, tgt: Keyframe) -> dict:
        """Solve the pose graph and write back (voxelslam.cpp:2088-2175)."""
        with self.telemetry.stage("pgo"):
            return self._optimize_impl(kf, tgt)

    def _optimize_impl(self, kf: Keyframe, tgt: Keyframe) -> dict:
        sess0 = self.sessions[-1]
        # capture the current session's tail BEFORE the rigid connect:
        # the returned dx must cover connect + GN polish so the
        # front-end map correction sees the full transform
        R_old = sess0[-1]["R"].copy() if sess0 else np.eye(3)
        p_old = sess0[-1]["p"].copy() if sess0 else np.zeros(3)
        self._apply_pending_links()
        g, offsets = self._graph_arrays()
        R, p, chi2, _ = posegraph.optimize(g)
        R = np.asarray(R)
        p = np.asarray(p)
        self.n_optimizations += 1

        # rigid correction of the CURRENT session's latest scan,
        # relative to its pose BEFORE the rigid connect + solve
        sess = self.sessions[-1]
        off = offsets[-1]
        last = len(sess) - 1
        R_new = R[off + last]
        p_new = p[off + last]
        dx_R = R_new @ R_old.T
        dx_p = p_new - dx_R @ p_old

        # write back all poses (set_state semantics incl. velocity
        # rotation, loop_refine.hpp:36-43)
        self.write_back(R, p, offsets)

        # recent keyframes for the front-end map rebuild (last 5,
        # voxelslam.cpp:2131-2150); older ones become mid-term reload
        # candidates (kd_keyframes registration, voxelslam.cpp:2152-2167)
        recent = self.keyframes[-5:]
        for k in self.keyframes[:-5]:
            k.loadable = True
        if self.spill_dir is not None:
            # old keyframe clouds spill to disk (mid-term reload and
            # finish-time HBA re-materialize through get_cloud)
            store = self._store()
            for k in self.keyframes[:-24]:
                k.spill(store)
        return dict(
            dx_R=dx_R, dx_p=dx_p,
            kf_clouds=[
                k.get_cloud() + (k.R0, k.p0) for k in recent
            ],
            chi2=float(chi2),
            target_session=tgt.session,
        )
