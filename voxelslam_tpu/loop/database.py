"""BTC descriptor database and loop search.

Counterpart of the reference's descriptor store + matcher
(`AddSTDescs`/`candidate_selector`/`candidate_verify`/`SearchLoop`,
BTC.cpp:205-277, 1128-1479).  The reference keys descriptors into an
`unordered_map` by quantized side lengths and probes 3³ neighbor
bins; on TPU the database is one dense array of all descriptors from
all keyframes and the bin probe becomes a brute-force side-distance
gate — a (Q, D) masked distance computation is a trivial matmul-class
op at any realistic database size, and the subsequent binary
similarity is evaluated only for the top few candidates per query.

Search stages (mirroring the reference's gates):
 1. rough gate  : ‖Δsides‖ < ‖sides‖·rough_dis_threshold, frame gap
                  > skip_near (BTC.cpp:1167-1200)
 2. similarity  : mean vertex binary similarity > threshold
                  (binary_similarity 2·common/(s1+s2), BTC.cpp:70-80)
 3. vote        : per-frame match counts, top candidate_num frames
                  with ≥ 5 votes (BTC.cpp:1281-1304)
 4. rigid verify: per matched triangle pair, SVD rigid solve from the
                  3 vertex correspondences; count triangle inliers
                  (corners < 3 m) (BTC.cpp:1306-1420)
 5. plane score : fraction of source plane cells matching the target
                  plane cloud under T (BTC.cpp:1422-1479)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .btc import BtcDescriptors, BtcParams, PlaneCloud


class SearchParams(NamedTuple):
    skip_near_num: int = 30
    candidate_num: int = 20
    rough_dis_threshold: float = 0.01
    similarity_threshold: float = 0.7
    icp_threshold: float = 0.15
    normal_threshold: float = 0.2
    dis_threshold: float = 0.5
    vote_min: int = 5
    ransac_inlier_dist: float = 3.0
    max_pairs_per_query: int = 8  # top side-distance matches kept per query
    max_cand_pairs: int = 64  # matched pairs evaluated per candidate frame
    # stage-1 pair selection: recall target for the TPU-native
    # approximate top-k (lax.approx_max_k lowers to a one-pass
    # PartialReduce on TPU; exact top_k sorts the full (Q, D) row and
    # dominated the keyframe program at D=2^17 — scripts/ab_kfprog.py).
    # 1.0 = exact.  On CPU approx_max_k falls back to exact, so tests
    # see identical candidate sets either way.
    approx_topk_recall: float = 0.95


class DbState(NamedTuple):
    """Device arrays of the descriptor database — a pytree so the whole
    per-keyframe loop path (extract → search → add → ICP verify) can run
    as ONE jitted program (manager.keyframe_program).  On the tunneled
    axon device each eager op costs a dispatch round-trip, so the loop
    layer being eager made keyframes cost seconds."""

    sides: jnp.ndarray  # (D, 3)
    verts: jnp.ndarray  # (D, 3, 3)
    occ: jnp.ndarray  # (D, 3, CUT) bool
    summary: jnp.ndarray  # (D, 3)
    frame: jnp.ndarray  # (D,) int32 keyframe id (-10^6 = empty)
    # session id per descriptor row: the reference keeps one
    # STDescManager per session and disables the near-frame gate for
    # frozen sessions (voxelslam.cpp:401,1869 skip_near_num =
    # -(size+10)); we store the session inline so skip_near applies
    # only to same-session keyframes.
    session: jnp.ndarray  # (D,) int32
    # per-keyframe plane clouds for geometric verification / ICP
    kf_plane_c: jnp.ndarray  # (KF, M, 3)
    kf_plane_n: jnp.ndarray  # (KF, M, 3)
    kf_plane_v: jnp.ndarray  # (KF, M) bool


def empty_state(p: BtcParams, capacity_desc: int, capacity_kf: int,
                dtype=jnp.float32) -> DbState:
    M = p.max_vox_planes
    return DbState(
        sides=jnp.zeros((capacity_desc, 3), dtype),
        verts=jnp.zeros((capacity_desc, 3, 3), dtype),
        occ=jnp.zeros((capacity_desc, 3, p.cut_num), bool),
        summary=jnp.zeros((capacity_desc, 3), dtype),
        frame=jnp.full((capacity_desc,), -(10**6), jnp.int32),
        session=jnp.full((capacity_desc,), -1, jnp.int32),
        kf_plane_c=jnp.zeros((capacity_kf, M, 3), dtype),
        kf_plane_n=jnp.zeros((capacity_kf, M, 3), dtype),
        kf_plane_v=jnp.zeros((capacity_kf, M), bool),
    )


def add_state(st: DbState, desc: BtcDescriptors, planes: PlaneCloud,
              offset, frame_id, session_id) -> DbState:
    """AddSTDescs (BTC.cpp:258-277) + plane cloud registration, pure /
    traceable (offset, frame_id, session_id may be traced scalars)."""
    offset = jnp.asarray(offset, jnp.int32)
    frame_id = jnp.asarray(frame_id, jnp.int32)
    fid = jnp.where(desc.valid, frame_id, -(10**6)).astype(jnp.int32)
    sid = jnp.where(
        desc.valid, jnp.asarray(session_id, jnp.int32), -1
    ).astype(jnp.int32)
    dus = jax.lax.dynamic_update_slice
    return st._replace(
        sides=dus(st.sides, desc.sides, (offset, 0)),
        verts=dus(st.verts, desc.verts, (offset, 0, 0)),
        occ=dus(st.occ, desc.occ, (offset, 0, 0)),
        summary=dus(st.summary, desc.summary, (offset, 0)),
        frame=dus(st.frame, fid, (offset,)),
        session=dus(st.session, sid, (offset,)),
        kf_plane_c=dus(st.kf_plane_c, planes.center[None], (frame_id, 0, 0)),
        kf_plane_n=dus(st.kf_plane_n, planes.normal[None], (frame_id, 0, 0)),
        kf_plane_v=dus(st.kf_plane_v, planes.valid[None], (frame_id, 0)),
    )


class Database:
    """Host wrapper around a DbState; keeps the host-known row/keyframe
    counts and enforces capacity.  Rows append per keyframe."""

    def __init__(self, p: BtcParams, capacity_desc: int = 1 << 17,
                 capacity_kf: int = 2048, dtype=jnp.float32):
        self.p = p
        self.capacity = capacity_desc
        self.capacity_kf = capacity_kf
        self.state = empty_state(p, capacity_desc, capacity_kf, dtype)
        self.count = 0
        self.n_kf = 0

    # read-only views (tests + manager verify paths)
    sides = property(lambda s: s.state.sides)
    verts = property(lambda s: s.state.verts)
    occ = property(lambda s: s.state.occ)
    summary = property(lambda s: s.state.summary)
    frame = property(lambda s: s.state.frame)
    session = property(lambda s: s.state.session)
    kf_plane_c = property(lambda s: s.state.kf_plane_c)
    kf_plane_n = property(lambda s: s.state.kf_plane_n)
    kf_plane_v = property(lambda s: s.state.kf_plane_v)

    def check_capacity(self, n_rows: int, frame_id: int):
        if self.count + n_rows > self.capacity:
            raise RuntimeError("descriptor database full")
        if frame_id >= self.capacity_kf:
            raise RuntimeError("keyframe capacity exceeded")

    def add(self, desc: BtcDescriptors, planes: PlaneCloud,
            frame_id: int, session_id: int = 0):
        T = desc.sides.shape[0]
        self.check_capacity(T, frame_id)
        self.state = add_state(
            self.state, desc, planes, self.count, frame_id, session_id
        )
        self.count += T
        self.n_kf = max(self.n_kf, frame_id + 1)


class LoopCandidates(NamedTuple):
    """Top-k verified candidates, sorted by descending plane score.
    Frames with score ≤ icp_threshold have frame = -1.  The reference
    ICP-verifies every candidate above threshold per session
    (voxelslam.cpp:1987-1999), not just the argmax."""

    frame: jnp.ndarray  # (C,) int32 target keyframe (-1 = none)
    score: jnp.ndarray  # (C,) plane-verify score
    R: jnp.ndarray  # (C, 3, 3) T_loop rotation
    t: jnp.ndarray  # (C, 3)
    votes: jnp.ndarray  # (C,)


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray):
    """Rigid transform dst ≈ R src + t from (3, 3) vertex triples
    (triangle_solver, BTC.cpp:1398-1420)."""
    cs = jnp.mean(src, axis=0)
    cd = jnp.mean(dst, axis=0)
    H = (src - cs).T @ (dst - cd)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 0.0], H.dtype)) + jnp.diag(
        jnp.asarray([0.0, 0.0, 1.0], H.dtype)
    ) * d
    R = Vt.T @ D @ U.T
    t = cd - R @ cs
    return R, t


def search_state(
    db: DbState,
    capacity_kf: int,
    query: BtcDescriptors,
    query_planes: PlaneCloud,
    query_frame,
    sp: SearchParams,
    target_frames_valid: np.ndarray | None = None,
    query_session=0,
) -> LoopCandidates:
    """Full SearchLoop (BTC.cpp:205-256) against the database; pure /
    traceable (query_frame and query_session may be traced scalars).

    The skip_near gate applies only to keyframes of `query_session`:
    earlier (frozen) sessions are always searchable, matching the
    reference's per-session STDescManager with the gate disabled for
    loaded maps (voxelslam.cpp:401,1869)."""
    Q = query.sides.shape[0]
    D = db.sides.shape[0]
    dtype = db.sides.dtype
    query_frame = jnp.asarray(query_frame, jnp.int32)
    query_session = jnp.asarray(query_session, jnp.int32)

    qs = query.sides
    # stage 1: rough side-length gate (Q, D)
    d2 = (
        jnp.sum(qs * qs, axis=1)[:, None]
        - 2.0 * qs @ db.sides.T
        + jnp.sum(db.sides * db.sides, axis=1)[None, :]
    )
    thr = jnp.linalg.norm(qs, axis=1) * sp.rough_dis_threshold  # (Q,)
    same_sess = db.session == query_session
    frame_ok = jnp.where(
        same_sess,
        (query_frame - db.frame) > sp.skip_near_num,
        db.frame >= 0,  # other sessions: any valid row
    )
    ok = (
        query.valid[:, None]
        & frame_ok[None, :]
        & (d2 < (thr * thr)[:, None])
    )
    d2m = jnp.where(ok, d2, jnp.inf)
    # keep top P pairs per query.  The exact top_k sorts each
    # (D=capacity) row and was the single most expensive op of the
    # keyframe program (database search+add ~19 of its ~28 ms,
    # scripts/ab_kfprog.py); the vote/verify stages tolerate a few
    # missed pairs, so the approximate reduction is the right trade
    # (the reference's hash-bucket SearchLoop, BTC.cpp:205-256, is
    # itself a recall<1 shortcut over all-pairs).
    P = sp.max_pairs_per_query
    if sp.approx_topk_recall < 1.0:
        nd2, pidx = jax.lax.approx_max_k(
            -d2m, P, recall_target=float(sp.approx_topk_recall)
        )
    else:
        nd2, pidx = jax.lax.top_k(-d2m, P)  # (Q, P)
    pair_ok = jnp.isfinite(-nd2)

    # stage 2: binary similarity on kept pairs
    qocc = query.occ.astype(dtype)  # (Q, 3, CUT)
    docc = db.occ[pidx].astype(dtype)  # (Q, P, 3, CUT)
    common = jnp.einsum("qvc,qpvc->qpv", qocc, docc)
    ssum = query.summary[:, None, :] + db.summary[pidx]
    sim = jnp.mean(2.0 * common / jnp.maximum(ssum, 1e-6), axis=-1)
    pair_ok = pair_ok & (sim > sp.similarity_threshold)

    # stage 3: per-frame votes
    fr = db.frame[pidx]  # (Q, P)
    fr_safe = jnp.where(pair_ok, fr, capacity_kf)
    votes = jnp.zeros((capacity_kf + 1,), jnp.int32).at[
        fr_safe.reshape(-1)
    ].add(1, mode="drop")[: capacity_kf]
    if target_frames_valid is not None:
        votes = votes * jnp.asarray(target_frames_valid, jnp.int32)
    n_cand = min(sp.candidate_num, capacity_kf)
    cand_votes, cand_frames = jax.lax.top_k(votes, n_cand)

    # stage 4+5: verify each candidate frame
    def verify(cf, cv):
        sel = pair_ok & (fr == cf)  # (Q, P)
        flat = sel.reshape(-1)
        (pp,) = jnp.nonzero(flat, size=sp.max_cand_pairs, fill_value=flat.shape[0])
        pv = pp < flat.shape[0]
        qi = jnp.clip(pp // P, 0, Q - 1)
        di = pidx.reshape(-1)[jnp.clip(pp, 0, flat.shape[0] - 1)]
        src = query.verts[qi]  # (K, 3, 3)
        dst = db.verts[di]
        Rs, ts = jax.vmap(_kabsch)(src, dst)
        # vote: for each solved transform, count pairs whose 3 vertices
        # all land within inlier_dist (BTC.cpp:1307-1349)
        moved = jnp.einsum("kij,mvj->kmvi", Rs, src) + ts[:, None, None, :]
        derr = jnp.linalg.norm(moved - dst[None], axis=-1)  # (K, M, 3)
        inl = jnp.all(derr < sp.ransac_inlier_dist, axis=-1) & pv[None, :] & pv[:, None]
        nvotes = jnp.sum(inl, axis=1)
        best = jnp.argmax(nvotes)
        bestv = nvotes[best]
        Rb, tb = Rs[best], ts[best]
        # stage 5: plane-geometric score (BTC.cpp:1422-1479)
        tc = db.kf_plane_c[jnp.clip(cf, 0)]
        tn = db.kf_plane_n[jnp.clip(cf, 0)]
        tv = db.kf_plane_v[jnp.clip(cf, 0)]
        sc = query_planes.center @ Rb.T + tb
        sn = query_planes.normal @ Rb.T
        dd = (
            jnp.sum(sc * sc, axis=1)[:, None]
            - 2.0 * sc @ jnp.where(tv[:, None], tc, 1e9).T
            + jnp.sum(jnp.where(tv[:, None], tc, 1e9) ** 2, axis=1)[None, :]
        )
        nn = jnp.argmin(dd, axis=1)
        tcn = tc[nn]
        tnn = tn[nn]
        ninc = jnp.linalg.norm(sn - tnn, axis=1)
        nadd = jnp.linalg.norm(sn + tnn, axis=1)
        p2pl = jnp.abs(jnp.sum(tnn * (sc - tcn), axis=1))
        good = (
            query_planes.valid
            & ((ninc < sp.normal_threshold) | (nadd < sp.normal_threshold))
            & (p2pl < sp.dis_threshold)
        )
        nsrc = jnp.maximum(jnp.sum(query_planes.valid), 1)
        score = jnp.sum(good) / nsrc
        usable = (cv >= sp.vote_min) & (bestv >= 4)
        return jnp.where(usable, score, -1.0), Rb, tb, bestv

    scores, Rbs, tbs, bvs = jax.vmap(verify)(cand_frames, cand_votes)
    order = jnp.argsort(-scores)
    scores = scores[order]
    found = scores > sp.icp_threshold
    return LoopCandidates(
        frame=jnp.where(found, cand_frames[order], -1),
        score=scores,
        R=Rbs[order],
        t=tbs[order],
        votes=bvs[order],
    )


def search(
    db: Database,
    query: BtcDescriptors,
    query_planes: PlaneCloud,
    query_frame: int,
    sp: SearchParams,
    target_frames_valid: np.ndarray | None = None,
    query_session: int = 0,
) -> LoopCandidates:
    """Eager convenience wrapper over `search_state` (tests / offline
    tools); the production path is manager.keyframe_program."""
    return search_state(
        db.state, db.capacity_kf, query, query_planes, query_frame, sp,
        target_frames_valid=target_frames_valid,
        query_session=query_session,
    )
