"""Hierarchical global bundle adjustment (HBA).

Counterpart of the reference's global-mapping thread + top-down pass
(`thd_globalmapping`/`HBA_add_edge`/`topDownProcess`,
voxelslam.cpp:2230-2595; `OctreeGBA`, loop_refine.hpp:269-537).

Bottom-up: windows of `win` keyframes (stride `stride`) run a
LiDAR-only BA — keyframe clouds scatter into a coarse temporary voxel
map (GBA parameters), plane voxels become eigen-factors, and
`lidar_ba` refines the window poses coarse→fine.  The final window
Hessian yields pairwise BetweenFactor edges with
v6 = 1/|H(6i+k, 6j+k)| (voxelslam.cpp:2405-2427), plus a merged
submap.  Submaps repeat the same BA at the next level.

Top-down: one pose graph over all scans with sequential + loop +
hessian edges (topDownProcess, voxelslam.cpp:2231-2317), solved by
the batch GN/PCG of loop/posegraph.py.

Windows are independent — where the reference runs them serially on
a background thread, here each window is one jitted device program
invocation and the host just sweeps the list.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import state
from ..lba import lidar_factor as lf
from ..lba import optimizer as opt
from ..map import voxelmap
from ..map.voxelmap import MapParams


class HbaParams(NamedTuple):
    map_params: MapParams  # coarse GBA map (voxel_size 2-15, loose gates)
    fine_params: MapParams  # odometry-grade refinement pass
    win: int = 10
    stride: int = 5
    max_ba_voxels: int = 2048
    max_iter_coarse: int = 2
    max_iter_fine: int = 2
    scatter_passes: int = 2


def default_params(gba_voxel=2.0, gba_min_eigen=0.1, odo_voxel=1.0,
                   odo_min_eigen=0.0025, capacity=1 << 15) -> HbaParams:
    coarse = MapParams(
        capacity=capacity, voxel_size=gba_voxel,
        min_eigen_value=gba_min_eigen, plane_thre_inv=(0.25,) * 4,
    )
    fine = MapParams(
        capacity=capacity, voxel_size=odo_voxel,
        min_eigen_value=odo_min_eigen, plane_thre_inv=(0.25,) * 4,
    )
    return HbaParams(map_params=coarse, fine_params=fine)


class WindowEdges(NamedTuple):
    """Hessian-derived pairwise edges of one BA window."""

    ei: jnp.ndarray  # (Epairs,) local indices i < j
    ej: jnp.ndarray
    Rm: jnp.ndarray  # (Epairs, 3, 3) relative measurements
    tm: jnp.ndarray
    v6: jnp.ndarray  # (Epairs, 6) noise diag
    valid: jnp.ndarray


def _window_ba_once(pts, mask, R, p, params: MapParams, max_vox, iters,
                    passes):
    """One scatter→recut→harvest→BA pass over a window of clouds."""
    W = pts.shape[0]
    dtype = pts.dtype
    vm = voxelmap.empty(params, W, dtype)
    var = jnp.broadcast_to(
        jnp.eye(3, dtype=dtype) * 1e-4, pts.shape[:2] + (3, 3)
    )
    scratch = None
    for _ in range(passes):
        vm, scratch, _, _ = voxelmap.scatter(
            vm, pts, var, R, p, mask, jnp.zeros((), dtype), params
        )
        vm, _ = voxelmap.recut(vm, scratch, params)
    factors = lf.harvest(vm, scratch, params, max_vox)
    xs = state.identity(dtype)
    xs = jax.tree.map(lambda a: jnp.broadcast_to(a, (W,) + a.shape), xs)
    xs = xs._replace(R=R, p=p)
    res = opt.lidar_ba(xs, factors, max_iter=iters)
    return res.xs.R, res.xs.p, res.hess, jnp.sum(factors.valid)


@partial(jax.jit, static_argnames=("hp",))
def window_ba(
    pts: jnp.ndarray,  # (W, P, 3) keyframe clouds, local frames
    mask: jnp.ndarray,  # (W, P)
    R: jnp.ndarray,  # (W, 3, 3) keyframe poses
    p: jnp.ndarray,  # (W, 3)
    hp: HbaParams,
):
    """Coarse→fine window BA + hessian edge extraction
    (HBA_add_edge, voxelslam.cpp:2320-2482)."""
    W = pts.shape[0]
    dtype = pts.dtype
    R1, p1, _, _ = _window_ba_once(
        pts, mask, R, p, hp.map_params, hp.max_ba_voxels,
        hp.max_iter_coarse, hp.scatter_passes,
    )
    R2, p2, hess, n_fact = _window_ba_once(
        pts, mask, R1, p1, hp.fine_params, hp.max_ba_voxels,
        hp.max_iter_fine, hp.scatter_passes,
    )

    # pairwise hessian edges for all i<j (voxelslam.cpp:2405-2427)
    ii, jj = np.triu_indices(W, k=1)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)

    def edge(i, j):
        vals = jnp.stack([hess[6 * i + k, 6 * j + k] for k in range(6)])
        ok = jnp.all(jnp.abs(vals) >= 1e-6)
        v6 = 1.0 / jnp.maximum(jnp.abs(vals), 1e-12)
        Rm = jnp.swapaxes(R2[i], -1, -2) @ R2[j]
        tm = jnp.einsum("ji,j->i", R2[i], p2[j] - p2[i])
        return Rm, tm, v6, ok

    Rm, tm, v6, ok = jax.vmap(edge)(ii, jj)
    edges = WindowEdges(ei=ii, ej=jj, Rm=Rm, tm=tm, v6=v6, valid=ok)
    return R2, p2, edges, n_fact


class GlobalMapper:
    """Host-side bottom-up sweep + submap level
    (thd_globalmapping, voxelslam.cpp:2485-2595).

    Bottom-up runs CONTINUOUSLY like the reference's background
    thread: the orchestrator calls `bottom_up_incremental` between
    scans, which processes at most one ready window (≥ win keyframes
    past the per-session cursor) per call — bounded work per scan, and
    finish() only has to drain the leftover windows instead of
    sweeping the whole trajectory (finish wall-time ~constant in
    trajectory length)."""

    def __init__(self, hp: HbaParams, kf_points: int = 16384):
        self.hp = hp
        self.kf_points = kf_points
        self.edges: List[dict] = []  # gba_edges1: keyframe-level
        self.submaps: List[dict] = []  # merged submap clouds + poses
        self._next_start: dict = {}  # per-session window cursor
        # in-flight window BA: [kfs snapshot, device result futures,
        # barrier_seq|None, host_results|None].
        # Dispatch-and-defer — blocking on each window's result stalls
        # the whole async frontend pipeline for the device time of the
        # BA; resolving one call later lets it overlap the steady
        # batches already in the dispatch queue.  With co-resolve
        # wired (fe_seq set by VoxelSLAM), the results additionally
        # ride the frontend's batch device_get in the SAME tunnel RPC
        # once a batch dispatched after this window resolves — same
        # protocol as LoopManager.co_query.
        self._pending = None
        self.fe_seq = None
        self.co_resolve_lag = 1

    def warmup(self, submap: Optional[tuple] = None) -> None:
        """Compile `window_ba` at production shapes off the hot path.
        The first window otherwise compiles mid-stream (~80 s observed
        on the tunneled TPU when the persistent cache misses), stalling
        the online pipeline for several seconds of sensor time.

        `submap=(max_submaps, submap_points)` additionally compiles the
        finish-time submap-level BA (its (W, P) differ from the
        keyframe windows, so it is a separate program that otherwise
        compiles inside finish())."""
        shapes = [(self.hp.win, self.kf_points, self.hp)]
        if submap is not None:
            W, P = submap
            shapes.append((W, P, self.hp._replace(win=W)))
        for W, P, hp in shapes:
            pts = np.zeros((W, P, 3), np.float32)
            # a tiny synthetic plane per keyframe keeps the BA
            # numerically tame; results are discarded
            pts[:, :64, :2] = np.random.default_rng(0).uniform(
                0, 1, (W, 64, 2)
            )
            mask = np.zeros((W, P), bool)
            mask[:, :64] = True
            R = np.tile(np.eye(3, dtype=np.float32), (W, 1, 1))
            p = np.zeros((W, 3), np.float32)
            out = window_ba(
                jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
                jnp.asarray(p), hp,
            )
            jax.block_until_ready(out[0])
        # these are the largest compiles in the process; return the
        # burst's freed arenas to the OS (see telemetry.trim_host_heap)
        from ..utils.telemetry import trim_host_heap

        trim_host_heap()

    def _by_session(self, keyframes: List) -> dict:
        sessions = {}
        for k in keyframes:
            sessions.setdefault(k.session, []).append(k)
        return sessions

    def bottom_up_incremental(self, keyframes: List) -> int:
        """Dispatch at most ONE ready window across sessions; the
        previously dispatched window is resolved only when a NEW window
        is ready to take its place.  Resolving every call blocked the
        host one scan after dispatch — behind the whole in-flight
        frontend batch queue (~2 batches of device time, measured
        ~6 ms/scan amortized on the full-system bench); windows become
        ready every ~stride×sub_frame_num scans, by which point the BA
        has long finished.  Returns the number of windows COMPLETED
        this call (0 or 1).

        Invariant: the last dispatched window stays unresolved until
        the next ready window (or `bottom_up_drain`) — `edges`/
        `submaps` and the gba_windows count are only complete after a
        drain.  Mid-run consumers must call `_resolve_pending()` (or
        drain) before reading them."""
        hp = self.hp
        ready = None
        for sess, kfs in self._by_session(keyframes).items():
            start = self._next_start.get(sess, 0)
            if len(kfs) >= start + hp.win:
                ready = (sess, kfs, start)
                break
        if ready is None:
            return 0
        n_done = self._resolve_pending()
        sess, kfs, start = ready
        self._dispatch_window(kfs[start : start + hp.win])
        self._next_start[sess] = start + hp.stride
        return n_done

    def bottom_up_drain(self, keyframes: List) -> int:
        """Finish-time drain: sweep every remaining window (incl. the
        ragged tail shorter than win but ≥ 2 keyframes)."""
        hp = self.hp
        n_done = self._resolve_pending()
        for sess, kfs in self._by_session(keyframes).items():
            start = self._next_start.get(sess, 0)
            while len(kfs) - start >= 2:
                self._process_window(kfs[start : start + hp.win])
                start += hp.stride
                n_done += 1
            self._next_start[sess] = max(start, self._next_start.get(sess, 0))
        return n_done

    def bottom_up_all(self, keyframes: List) -> None:
        """Full re-sweep from scratch (used when keyframe poses were
        rebuilt wholesale, e.g. tests / offline reprocessing)."""
        self.edges.clear()
        self.submaps.clear()
        self._next_start.clear()
        self.bottom_up_drain(keyframes)

    def bottom_up(self, keyframes: List) -> None:
        """Sweep all windows of ONE session's keyframes."""
        if len(keyframes) < 2:
            return
        hp = self.hp
        for start in range(0, max(len(keyframes) - hp.win + 1, 1),
                           hp.stride):
            self._process_window(keyframes[start : start + hp.win])

    def _process_window(self, kfs: List) -> None:
        """One window BA, synchronously (finish drain / offline)."""
        self._dispatch_window(kfs)
        self._resolve_pending()

    def _dispatch_window(self, kfs: List) -> None:
        """Dispatch one window BA; results resolve on a later call."""
        hp = self.hp
        W = len(kfs)
        if W < 2:
            return
        P = self.kf_points
        pts = np.zeros((hp.win, P, 3), np.float32)
        mask = np.zeros((hp.win, P), bool)
        R = np.tile(np.eye(3, dtype=np.float32), (hp.win, 1, 1))
        p = np.zeros((hp.win, 3), np.float32)
        for i, k in enumerate(kfs):
            kc, km = k.get_cloud()
            m = min(kc.shape[0], P)
            pts[i, :m] = kc[:m]
            mask[i, :m] = km[:m]
            R[i] = k.R0
            p[i] = k.p0
        out = window_ba(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
            jnp.asarray(p), hp,
        )
        barrier = self.fe_seq() if self.fe_seq is not None else None
        self._pending = [list(kfs), out, barrier, None]

    # co-resolve protocol (see LoopManager.co_query/co_deliver)
    def co_query(self, resolved_seq: int):
        e = self._pending
        if (
            e is None or e[3] is not None or e[2] is None
            or resolved_seq < e[2] + self.co_resolve_lag
        ):
            return None
        R2, p2, edges, _n = e[1]
        self._co_requested = e
        return (R2, p2, edges)

    def co_deliver(self, host) -> None:
        e = getattr(self, "_co_requested", None)
        if e is not None:
            e[3] = host
            self._co_requested = None

    def resolve_ready(self) -> int:
        """Fold the in-flight window iff its results already sit on
        the host (co-resolved) — free."""
        if self._pending is not None and self._pending[3] is not None:
            return self._resolve_pending()
        return 0

    def _resolve_pending(self) -> int:
        """Fold the in-flight window's results into edges/submaps."""
        if self._pending is None:
            return 0
        kfs, (R2, p2, edges, n_fact), _barrier, host = self._pending
        self._pending = None
        W = len(kfs)
        # ONE transfer (element-indexing device arrays in the loop
        # below costs a tunnel round-trip per element on axon) — or
        # zero, when the results already rode a batch resolve
        if host is None:
            host = jax.device_get((R2, p2, edges))
        R2, p2, edges = host
        ev = edges.valid
        for e in range(len(ev)):
            i, j = int(edges.ei[e]), int(edges.ej[e])
            if not ev[e] or i >= W or j >= W:
                continue
            self.edges.append(
                dict(
                    kf1=kfs[i].id, kf2=kfs[j].id,
                    scan1=(kfs[i].session, kfs[i].first_scan),
                    scan2=(kfs[j].session, kfs[j].first_scan),
                    R=edges.Rm[e], t=edges.tm[e], v6=edges.v6[e],
                )
            )
        # merged submap: base = first kf, all clouds re-expressed
        base_R, base_p = R2[0], p2[0]
        cloud = []
        for i, k in enumerate(kfs):
            kc, km = k.get_cloud()
            pw = kc[km] @ R2[i].T + p2[i]
            cloud.append((pw - base_p) @ base_R)
        self.submaps.append(
            dict(R0=base_R, p0=base_p,
                 cloud=np.concatenate(cloud).astype(np.float32),
                 first=kfs[0].id,
                 members=[k.id for k in kfs],
                 scan=(kfs[0].session, kfs[0].first_scan))
        )
        return 1

    def submap_level(self, keyframes: Optional[List] = None,
                     max_submaps: int = 16,
                     submap_points: int = 32768) -> List[dict]:
        """Second hierarchy level: one BA over the submaps of the
        connected sessions -> gba_edges2 (thd_globalmapping finish
        pass, voxelslam.cpp:2559-2581).  Returns submap-base edges.

        `keyframes` (the loop manager's list) refreshes each submap's
        base pose: bottom-up ran continuously, so PGO corrections may
        have moved the base keyframe since the submap was built."""
        subs = self.submaps
        if len(subs) < 2:
            return []
        if keyframes is not None:
            # REBUILD each submap cloud from its member keyframes'
            # CURRENT poses, not just refresh the base pose: the merged
            # cloud was baked with the bottom-up poses of its build
            # time, so after PGO corrections its internal geometry
            # carries the then-unclosed drift across ~win keyframes —
            # the submap BA then aligns internally-warped shapes and
            # its edges DEGRADE the final solve (measured on the
            # drifted ring, scripts/diag_gba.py: keyframe edges alone
            # 0.0071 m ATE, + stale-submap edges 0.0093).
            for sm in subs:
                k = keyframes[sm["first"]]
                Rb = np.asarray(k.R0, np.float32)
                pb = np.asarray(k.p0, np.float32)
                sm["R0"], sm["p0"] = Rb, pb
                mem = sm.get("members")
                if mem:
                    clouds = []
                    for mid in mem:
                        km_ = keyframes[mid]
                        kc, kmask = km_.get_cloud()
                        pw = kc[kmask] @ np.asarray(
                            km_.R0, np.float32
                        ).T + np.asarray(km_.p0, np.float32)
                        clouds.append((pw - pb) @ Rb)
                    sm["cloud"] = np.concatenate(clouds).astype(
                        np.float32
                    )
        if len(subs) > max_submaps:
            # merge ADJACENT same-session submaps into ≤ max_submaps
            # buckets (keeps full trajectory coverage; plain strided
            # selection would drop the middle submaps).  Merging never
            # crosses sessions — unlinked sessions live in different
            # frames.
            per_sess: dict = {}
            for sm in subs:
                per_sess.setdefault(sm["scan"][0], []).append(sm)
            # largest-remainder apportionment so the per-session shares
            # sum to EXACTLY max_submaps (independent round() could
            # overshoot and the [:max_submaps] cut would silently drop
            # the last session's tail buckets)
            groups = list(per_sess.values())
            quota = [max_submaps * len(g) / len(subs) for g in groups]
            share_l = [max(int(q), 1) for q in quota]
            while sum(share_l) > max_submaps and max(share_l) > 1:
                share_l[int(np.argmax(share_l))] -= 1
            rema = [q - s for q, s in zip(quota, share_l)]
            while sum(share_l) < max_submaps:
                k = int(np.argmax(rema))
                share_l[k] += 1
                rema[k] = -1.0
            merged = []
            for sess_subs, share in zip(groups, share_l):
                bounds = np.linspace(
                    0, len(sess_subs), min(share, len(sess_subs)) + 1
                ).astype(int)
                for b in range(len(bounds) - 1):
                    grp = sess_subs[bounds[b] : bounds[b + 1]]
                    if not grp:
                        continue
                    Rb, pb = grp[0]["R0"], grp[0]["p0"]
                    clouds = []
                    for sm in grp:
                        pw = sm["cloud"] @ sm["R0"].T + sm["p0"]
                        clouds.append((pw - pb) @ Rb)
                    merged.append(dict(
                        R0=Rb, p0=pb,
                        cloud=np.concatenate(clouds).astype(np.float32),
                        first=grp[0]["first"], scan=grp[0]["scan"],
                    ))
            subs = merged[:max_submaps]
        W = max_submaps
        P = submap_points
        pts = np.zeros((W, P, 3), np.float32)
        mask = np.zeros((W, P), bool)
        R = np.tile(np.eye(3, dtype=np.float32), (W, 1, 1))
        p = np.zeros((W, 3), np.float32)
        for i, sm in enumerate(subs):
            cl = sm["cloud"]
            if len(cl) > P:
                sel = np.linspace(0, len(cl) - 1, P).astype(int)
                cl = cl[sel]
            pts[i, : len(cl)] = cl
            mask[i, : len(cl)] = True
            R[i] = sm["R0"]
            p[i] = sm["p0"]
        hp2 = self.hp._replace(win=W)
        R2, p2, edges, n_fact = window_ba(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(R),
            jnp.asarray(p), hp2,
        )
        edges = jax.device_get(edges)  # one transfer
        ev = edges.valid
        out = []
        for e in range(len(ev)):
            i, j = int(edges.ei[e]), int(edges.ej[e])
            if not ev[e] or i >= len(subs) or j >= len(subs):
                continue
            out.append(dict(
                scan1=subs[i]["scan"], scan2=subs[j]["scan"],
                R=edges.Rm[e], t=edges.tm[e], v6=edges.v6[e],
            ))
        return out
