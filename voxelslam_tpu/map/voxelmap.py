"""Device-resident adaptive voxel map.

TPU-native redesign of the reference's hash-of-octrees map
(`unordered_map<VOXEL_LOC, OctoTree*>` + `OctoTree`,
voxel_map.hpp:935-1698).  Three structural changes, per SURVEY.md §7:

1. **Octree → multi-level hash.**  The ≤2 subdivision layers become
   hash levels: one open-addressing table stores (coord, level) keys
   at voxel sizes s, s/2, s/4; a `subdivided` bit per slot replaces
   `octo_state`.  Point routing walks levels with vectorized lookups
   instead of pointer recursion (`allocate`/`match` descent,
   voxel_map.hpp:1021-1116, 1335-1392).

2. **Functional window clusters.**  The per-voxel per-scan
   `SlideWindow` storage with ring-index remapping (`mp[]`,
   voxel_map.hpp:895-930, voxelslam.cpp:1689-1693) is replaced by
   rebuilding per-voxel clusters each scan from the flat padded window
   point arrays via scatter-add.  Sliding the window is then just
   shifting those flat arrays; subdivision re-routing and post-BA pose
   refresh fall out for free.

3. **Center-relative moments.**  All world-frame moments accumulate
   relative to each voxel's center so f32 keeps the ~1e-3 m² plane
   eigenvalue signal (the f64 reference accumulates absolute
   coordinates, tools.hpp:329).

Fixed (marginalized) history is per-slot and incremental exactly like
the reference's `pcr_fix`/`point_fix` capped at `max_points`
(voxel_map.hpp:1249-1278), except that fixed moments accumulate at
*all* levels so a later subdivision never needs stored raw points.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core import cluster, hashing
from ..core.cluster import Cluster
from ..ops import eigh3, lanes, segsum
from . import hashmap


class MapParams(NamedTuple):
    """Static map configuration (hashable; passed as jit-static)."""

    capacity: int = 1 << 17
    max_probe: int = 16
    voxel_size: float = 1.0
    max_layer: int = 2  # levels 0..max_layer
    min_point: tuple = (5, 5, 5, 5)  # per-level minimum N (voxelslam.cpp:812)
    refit_growth: int = 5  # refit a touched voxel's plane only when it
    #   gained this many points since the last refit (the reference
    #   plane_update growth gate, voxel_map.hpp:1118-1146) — halves
    #   the per-scan refit set in steady state
    min_eigen_value: float = 0.0025  # plane λ0 gate (avia.yaml)
    plane_thre_inv: tuple = (0.25, 0.25, 0.25, 0.25)  # λ0/λ2 gate, inverted
    #                         at load like voxelslam.cpp:825
    max_points: int = 100  # fixed-point cap per voxel (voxel_map.hpp:86)
    evict_dist: float = 700.0  # distance-based eviction (voxelslam.cpp:1509)
    max_active: int = 16384  # recut compaction bound (touched voxels/scan)

    def level_size(self, level):
        return self.voxel_size / (2.0**level)


# ---- packed per-slot row layouts -----------------------------------
# Gather/scatter op COUNT bounds the fused step on TPU (~40-500 us per
# op regardless of width, scripts/probe_tunnel.py), so the per-slot
# state is packed into few WIDE tables: every compacted stage gathers
# one row and scatters one row instead of 8-10 narrow ones.

# `win`/`fix` row lanes: [P packed-sym (6), v (3), n (1)]
CL_P = slice(0, 6)
CL_V = slice(6, 9)
CL_N = 9
CL_W = 10

# `meta` row lanes
MT_PN = slice(0, 3)  # plane normal
MT_PC = slice(3, 6)  # plane center (voxel-center-relative)
MT_VAR = slice(6, 42)  # 6x6 plane covariance, row-major
MT_RAD = 42  # plane radius (λ2)
MT_EIG = slice(43, 46)  # voxel covariance eigenvalues
MT_LAST = 46  # N at last plane refresh
MT_VALID = 47  # plane_valid as 0/1
MT_W = 48


class VoxelMap(NamedTuple):
    """Persistent per-slot map state (everything a scan leaves behind).

    Per-slot floating state is packed into wide rows (`win`, `fix`,
    `meta`, layouts above); the original field names remain available
    as read-only property views (static slices — free under XLA)."""

    keys: jnp.ndarray  # (C, 4) int32 (x, y, z, level); level -1 = empty
    state: jnp.ndarray  # (C,) int32: 0 leaf, 1 subdivided
    fix: jnp.ndarray  # (C, 10) fixed cluster moments, center-relative
    #   world frame, capped at max_points (voxel_map.hpp:1249-1278)
    cov_add: jnp.ndarray  # (C, 45) Bf_var accumulation over every
    #   point ever pushed (window + fixed) — grow-only, exactly the
    #   reference's cov_add (voxel_map.hpp:941,990-992).  The 9x9 is
    #   symmetric, stored packed upper-triangular (row-major i<=j)
    win: jnp.ndarray  # (C, W, 10) persistent per-window-slot
    #   BODY-frame clusters (incremental push; the reference's
    #   SlideWindow pcrs_local, voxel_map.hpp:901)
    meta: jnp.ndarray  # (C, 48) plane fit + refresh bookkeeping
    jour: jnp.ndarray  # (C,) travel stamp at last touch

    # ---- read-only views under the historical field names ----
    @property
    def fix_P(self):
        return self.fix[:, CL_P]

    @property
    def fix_v(self):
        return self.fix[:, CL_V]

    @property
    def fix_n(self):
        return self.fix[:, CL_N]

    @property
    def win_P(self):
        return self.win[:, :, CL_P]

    @property
    def win_v(self):
        return self.win[:, :, CL_V]

    @property
    def win_n(self):
        return self.win[:, :, CL_N]

    @property
    def plane_n(self):
        return self.meta[:, MT_PN]

    @property
    def plane_c(self):
        return self.meta[:, MT_PC]

    @property
    def plane_var(self):
        return self.meta[:, MT_VAR].reshape(-1, 6, 6)

    @property
    def plane_radius(self):
        return self.meta[:, MT_RAD]

    @property
    def eig(self):
        return self.meta[:, MT_EIG]

    @property
    def last_num(self):
        return self.meta[:, MT_LAST]

    @property
    def plane_valid(self):
        return self.meta[:, MT_VALID] > 0.5


class ScanScratch(NamedTuple):
    """Per-scan window aggregates in WORLD frame (derived from the
    persistent body clusters + current poses each scan)."""

    add_P: jnp.ndarray  # (C, 6) world center-relative window sum
    add_v: jnp.ndarray  # (C, 3)
    add_n: jnp.ndarray  # (C,)


def empty(params: MapParams, win_size: int, dtype=jnp.float32) -> VoxelMap:
    C = params.capacity
    return VoxelMap(
        keys=hashmap.empty_keys(C),
        state=jnp.zeros((C,), jnp.int32),
        fix=jnp.zeros((C, CL_W), dtype),
        cov_add=jnp.zeros((C, 45), dtype),
        win=jnp.zeros((C, win_size, CL_W), dtype),
        meta=jnp.zeros((C, MT_W), dtype),
        jour=jnp.zeros((C,), dtype),
    )


# ------------------------------------------------------------------ routing

def _coords_at_levels(pts_w: jnp.ndarray, params: MapParams):
    """(..., 3) world points -> (..., L, 3) int32 coords per level."""
    L = params.max_layer + 1
    return jnp.stack(
        [hashing.voxel_coord(pts_w, params.level_size(l)) for l in range(L)],
        axis=-2,
    )


def assign(vmap: VoxelMap, pts_w: jnp.ndarray, valid: jnp.ndarray,
           params: MapParams):
    """Route each world point to its target (coord, level).

    Walks the subdivision chain (the octree descent of
    voxel_map.hpp:1021-1045) LEVEL-0-FIRST: every point probes level 0;
    only points whose coarse voxel is subdivided descend to the next
    level.  Deeper levels run with a skip mask, so when nothing is
    subdivided (the common steady state) their probe loops exit after
    zero rounds — ~3x fewer hash probes than the breadth-wise
    all-levels lookup.  A point targets the first level that is absent
    (to be created) or a leaf.

    Returns (coord (K,3), level (K,), slot (K,) of existing voxel or
    -1).
    """
    L = params.max_layer + 1
    coords = _coords_at_levels(pts_w, params)  # (K, L, 3)
    K = pts_w.shape[0]
    go = valid
    lvl = jnp.zeros((K,), jnp.int32)
    slot = jnp.full((K,), -1, jnp.int32)
    coord = coords[:, 0]
    for l in range(L):
        s = hashmap.lookup(
            vmap.keys, coords[:, l],
            jnp.full((K,), l, jnp.int32), params.max_probe, skip=~go,
        )
        deeper = (
            go
            & (s >= 0)
            & (vmap.state[jnp.clip(s, 0)] == 1)
            & (l < L - 1)
        )
        settle = go & ~deeper
        lvl = jnp.where(settle, l, lvl)
        slot = jnp.where(settle, s, slot)
        coord = jnp.where(settle[:, None], coords[:, l], coord)
        go = deeper
    return coord, lvl, slot


# ------------------------------------------------------------------ scatter

def _sym9(i: int, j: int) -> int:
    """Packed upper-triangular index of the symmetric 9x9 (i<=j,
    row-major): entry (i, j) lives at i*9 - i(i-1)/2 + (j - i)."""
    if i > j:
        i, j = j, i
    return i * 9 - i * (i - 1) // 2 + (j - i)


def _bf_var(pw_rel: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """Per-point 9x9 covariance contribution of (P_packed, v) moments
    from the point's 3x3 covariance (reference Bf_var,
    voxel_map.hpp:91-106), PACKED upper-triangular (..., 45) — the
    matrix is symmetric, so only i<=j entries are built and stored.
    pw_rel: (..., 3) center-relative position.

    Unrolled at trace time into lane-wide elementwise ops (the sparse
    6x3 Bi makes batched tiny matmuls both wasteful and MXU-hostile;
    most products fold away as structural zeros).
    """
    x, y, z = pw_rel[..., 0], pw_rel[..., 1], pw_rel[..., 2]
    # Bi rows as sparse (coeff, column) lists:
    # [2x,0,0],[y,x,0],[z,0,x],[0,2y,0],[0,z,y],[0,0,2z]
    rows = [
        [(2.0 * x, 0)],
        [(y, 0), (x, 1)],
        [(z, 0), (x, 2)],
        [(2.0 * y, 1)],
        [(z, 1), (y, 2)],
        [(2.0 * z, 2)],
    ]
    v = [[var[..., i, j] for j in range(3)] for i in range(3)]
    # BiV[r][c] = Σ_k Bi[r][k] * var[k][c]
    BiV = [
        [sum(coef * v[k][c] for coef, k in rows[r]) for c in range(3)]
        for r in range(6)
    ]
    out = []
    for i in range(9):
        for j in range(i, 9):
            if i < 6 and j < 6:
                # top-left: (BiV @ Biᵀ)[i, j]
                out.append(sum(BiV[i][k] * coef for coef, k in rows[j]))
            elif i < 6:
                out.append(BiV[i][j - 6])  # top-right: BiV
            else:
                out.append(v[i - 6][j - 6])  # bottom-right: var
    return jnp.stack(out, axis=-1)  # (..., 45)


def scatter(
    vmap: VoxelMap,
    pts_body: jnp.ndarray,  # (W, N, 3) body-frame window points
    var_w: jnp.ndarray,  # (W, N, 3, 3) world point covariances
    R: jnp.ndarray,  # (W, 3, 3) window poses
    p: jnp.ndarray,  # (W, 3)
    valid: jnp.ndarray,  # (W, N) bool
    jour: jnp.ndarray,  # () current travel stamp
    params: MapParams,
):
    """FULL window rebuild: insert all window points and regenerate
    the persistent per-voxel window clusters from scratch (replaces
    cut_voxel_multi + the push chain, voxel_map.hpp:969-994,
    1543-1639).

    The steady-state hot path uses the incremental `push_scan`
    instead; this full rebuild runs on initialization iterations,
    post-loop map swaps, HBA window maps, and as the subdivision
    fallback (re-routing every window point through fresh children).

    Returns (vmap', ScanScratch, overflow_count, slot_pt) where
    slot_pt (W, N) int32 is each point's resolved map slot (C for
    dropped/invalid) — the routing record consumed by the inline
    subdivision re-route (`reroute_subdivided`).
    """
    W, N, _ = pts_body.shape
    C = params.capacity
    K = W * N
    dtype = pts_body.dtype

    pts_w = jnp.einsum("wij,wnj->wni", R, pts_body) + p[:, None, :]
    flat_w = pts_w.reshape(K, 3)
    flat_valid = valid.reshape(K)

    coord, lvl, slot0 = assign(vmap, flat_w, flat_valid, params)
    # dedupe-first insert: ~40k queries touch only a few thousand
    # voxels, and gather-only lookups resolve the rest (hashmap
    # insert_points) — the TPU scatter hot spot of the naive path.
    keys, slot, n_unique, overflow = hashmap.insert_points(
        vmap.keys, coord, lvl, flat_valid, params.max_probe,
        max_unique=min(K, 16384), known_slot=slot0,
    )
    ok = flat_valid & (slot >= 0)
    slot_safe = jnp.where(ok, slot, C)  # C = dropped by scatter mode
    # (newly created slots are clean leaves by invariant: state is only
    # ever set by recut on occupied slots and cleared by eviction)
    jour_arr = vmap.jour.at[slot_safe].set(jour, mode="drop")

    # voxel centers for center-relative moments
    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    csize = sizes[lvl]
    center = (coord.astype(dtype) + 0.5) * csize[:, None]
    rel = flat_w - center

    # window-slot index per point
    widx = jnp.repeat(jnp.arange(W, dtype=jnp.int32), N)

    # one sort by (slot, window) serves every accumulation below with
    # sorted indices — the fast path for TPU scatter-add
    wsel = jnp.where(ok, slot * W + widx, C * W)
    order = jnp.argsort(wsel)
    wsel_s = wsel[order]
    slot_s = jnp.where(wsel_s < C * W, wsel_s // W, C)

    body = pts_body.reshape(K, 3)[order]
    rel_s = rel[order]
    ones = jnp.ones((K,), dtype)

    obody = cluster.point_outer_packed(body)
    # (slot, window)-sorted segmented sum — ONE fused (P, v, n) row
    # per point into the packed win table (ops/segsum.py)
    vals = jnp.concatenate([obody, body, ones[:, None]], axis=-1)
    win = segsum.sorted_segment_add(
        jnp.zeros((C * W, CL_W), dtype), wsel_s, vals
    ).reshape(C, W, CL_W)

    # moment-noise accumulation (Bf_var) for the plane covariance.
    # Grow-only like the reference's cov_add; a full rebuild on a live
    # map re-adds window noise (the reference's subdivide() re-push
    # does the same) — conservative, never optimistic.
    bcov = _bf_var(rel_s, var_w.reshape(K, 3, 3)[order])
    cov_add = segsum.sorted_segment_add(vmap.cov_add, slot_s, bcov)

    vmap = vmap._replace(
        keys=keys, jour=jour_arr, cov_add=cov_add, win=win,
    )
    scratch = window_sums(vmap, R, p, params)
    slot_pt = jnp.where(ok, slot, C).reshape(W, N)
    return vmap, scratch, overflow, slot_pt


def push_scan(
    vmap: VoxelMap,
    pts_body: jnp.ndarray,  # (N, 3) ONE scan, body frame
    var_w: jnp.ndarray,  # (N, 3, 3)
    R: jnp.ndarray,  # (3, 3)
    p: jnp.ndarray,  # (3,)
    valid: jnp.ndarray,  # (N,)
    col: jnp.ndarray,  # () int32 window column to fill
    jour: jnp.ndarray,
    params: MapParams,
):
    """Incremental push of one scan into window column `col` — the
    steady-state counterpart of the reference's per-scan cut_voxel
    (only the NEW scan's points enter the map each step; older scans'
    body clusters are already resident)."""
    N = pts_body.shape[0]
    C = params.capacity
    W = vmap.win_n.shape[1]
    dtype = pts_body.dtype

    pts_w = pts_body @ R.T + p
    coord, lvl, slot0 = assign(vmap, pts_w, valid, params)
    keys, slot, n_unique, overflow = hashmap.insert_points(
        vmap.keys, coord, lvl, valid, params.max_probe,
        max_unique=min(N, 8192), known_slot=slot0,
    )
    ok = valid & (slot >= 0)
    slot_safe = jnp.where(ok, slot, C)
    jour_arr = vmap.jour.at[slot_safe].set(jour, mode="drop")

    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    center = (coord.astype(dtype) + 0.5) * sizes[lvl][:, None]
    rel = pts_w - center

    order = jnp.argsort(slot_safe)
    slot_s = slot_safe[order]
    body = pts_body[order]
    rel_s = rel[order]
    ones = jnp.ones((N,), dtype)

    wdst = jnp.where(slot_s < C, slot_s * W + col, C * W)
    obody = cluster.point_outer_packed(body)
    vals = jnp.concatenate([obody, body, ones[:, None]], axis=-1)
    # destination rows are in the freshly cleared ring column, which
    # clear_window_col zeroed across ALL lanes — accumulate directly
    # (no stale-row zero-scatter; see the invariant there)
    win = segsum.sorted_segment_add(
        vmap.win.reshape(C * W, CL_W), wdst, vals
    ).reshape(C, W, CL_W)

    bcov = _bf_var(rel_s, var_w[order])
    cov_add = segsum.sorted_segment_add(vmap.cov_add, slot_s, bcov)

    # which voxels THIS scan touched — the only set whose planes need
    # a refit this step (the reference's surf_map_slide touched list)
    touched = jnp.zeros((C,), bool).at[slot_s].set(True, mode="drop")

    return (
        vmap._replace(
            keys=keys, jour=jour_arr, cov_add=cov_add, win=win,
        ),
        overflow,
        touched,
        jnp.where(ok, slot, C),  # per-point slot (N,), C = dropped
    )


def reroute_subdivided(
    vmap: VoxelMap,
    pts_body: jnp.ndarray,  # (W, N, 3) window body-frame points
    mask: jnp.ndarray,  # (W, N)
    slot_pt: jnp.ndarray,  # (W, N) int32 current slot per point (C=invalid)
    R: jnp.ndarray,  # (W, 3, 3) LOGICAL-order window poses
    p: jnp.ndarray,  # (W, 3)
    col_of_w: jnp.ndarray,  # (W,) physical ring column of logical slot w
    jour: jnp.ndarray,
    params: MapParams,
    max_reroute: int,
    pending: jnp.ndarray,  # () int32 > 0 iff any subdivision may have
    #   un-rerouted points (fresh recut subdivisions + carried backlog)
):
    """Inline subdivision re-route — the TPU counterpart of the
    reference's OctoTree subdivide() point redistribution
    (voxel_map.hpp:1150-1194).

    Resident window points whose recorded voxel flipped to subdivided
    (state == 1) are re-assigned through the level descent, their
    body-frame moments scattered into the CHILD voxels' window
    columns, and their slot records updated.  The parent's window
    rows are left stale: every consumer masks them out via
    state == 0 (harvest/match/recut) and `marginalize_column`
    skips subdivided slots, so ring laps clean them up naturally.

    The expensive part (candidate compaction, level descent, child
    insertion, destination sort) runs under `lax.cond(pending > 0)`:
    steady scans with no subdivisions pay only the cheap
    unconditional applies below.  The cond's carried operands are
    deliberately SMALL (keys + (K,)-sized update vectors) — the big
    win table is updated outside the cond by one segment-add whose
    skip-branch indices all drop, so the false branch never copies it.

    At most `max_reroute` points move per call; the rest stay flagged
    (state of their slot remains 1) and retry next scan — a bounded,
    self-draining backlog instead of a host-dispatched full rebuild.

    Returns (vmap', slot_pt', child_touch (C,) bool, n_left).
    """
    C = params.capacity
    W, N = mask.shape
    dtype = pts_body.dtype
    K = max_reroute

    def compute(keys):
        flat_slot = slot_pt.reshape(-1)
        st = vmap.state[jnp.clip(flat_slot, 0, C - 1)]
        need = mask.reshape(-1) & (flat_slot < C) & (st == 1)
        (ridx,) = jnp.nonzero(need, size=K, fill_value=W * N)
        rok = ridx < W * N
        ri = jnp.clip(ridx, 0, W * N - 1)
        w_of = (ri // N).astype(jnp.int32)

        body = pts_body.reshape(-1, 3)[ri]
        pts_w = jnp.einsum("kij,kj->ki", R[w_of], body) + p[w_of]

        coord, lvl, slot0 = assign(vmap._replace(keys=keys), pts_w, rok,
                                   params)
        keys, slot, _, _ = hashmap.insert_points(
            keys, coord, lvl, rok, params.max_probe,
            max_unique=K, known_slot=slot0,
        )
        ok = rok & (slot >= 0)
        slot_safe = jnp.where(ok, slot, C)

        colw = col_of_w[w_of]
        wdst = jnp.where(ok, slot * W + colw, C * W)
        order = jnp.argsort(wdst)
        wdst_s = wdst[order]
        body_s = body[order]
        obody = cluster.point_outer_packed(body_s)
        vals = jnp.concatenate(
            [obody, body_s, jnp.ones((K, 1), dtype)], axis=-1
        )
        vals = jnp.where((wdst_s < C * W)[:, None], vals, 0.0)
        n_left = jnp.sum(need) - jnp.sum(ok)
        return keys, wdst_s, vals, jnp.where(ok, ri, W * N), slot_safe, \
            n_left

    def skip(keys):
        return (
            keys,
            jnp.full((K,), C * W, jnp.int32),
            jnp.zeros((K, CL_W), dtype),
            jnp.full((K,), W * N, jnp.int32),
            jnp.full((K,), C, jnp.int32),
            jnp.zeros((), jnp.int32),
        )

    keys, wdst_s, vals, ri_upd, slot_safe, n_left = jax.lax.cond(
        pending > 0, compute, skip, vmap.keys
    )

    # ---- cheap unconditional applies (skip-branch indices all drop) --
    # rows with win_n == 0 are fully zero (clear_window_col zeroes all
    # lanes), so fresh destinations accumulate directly; live child
    # rows accumulate on top, exactly like a second scan's push
    win = segsum.sorted_segment_add(
        vmap.win.reshape(C * W, CL_W), wdst_s, vals
    ).reshape(C, W, CL_W)
    jour_arr = vmap.jour.at[slot_safe].set(jour, mode="drop")
    # NOTE: no cov_add accumulation here.  The re-routed points'
    # Bf_var already entered the PARENT's cov_add at push time;
    # children accumulate noise from every subsequent push.  (An
    # earlier version also accumulated into the children; that
    # specific computation triggered a batched-scan miscompilation on
    # TPU at small table capacities — total match loss from scan 2 —
    # while the identical per-scan program was correct.  Removing it
    # is both the workaround and a conservative-noise simplification.)
    child_touch = jnp.zeros((C,), bool).at[slot_safe].set(True, mode="drop")
    flat_slot = slot_pt.reshape(-1).at[ri_upd].set(slot_safe, mode="drop")
    return (
        vmap._replace(keys=keys, jour=jour_arr, win=win),
        flat_slot.reshape(W, N),
        child_touch,
        n_left,
    )


def window_sums(
    vmap: VoxelMap, R: jnp.ndarray, p: jnp.ndarray, params: MapParams
) -> ScanScratch:
    """World center-relative window aggregates from the resident body
    clusters under the CURRENT poses — recomputed every scan so BA
    pose updates propagate into plane fits (the reference refreshes
    pcr_add the same way in recut/margi)."""
    C = params.capacity
    dtype = vmap.win_P.dtype
    # voxel centers for all slots
    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    lvl = jnp.clip(vmap.keys[:, 3], 0)
    centers = (vmap.keys[:, :3].astype(dtype) + 0.5) * sizes[lvl][:, None]
    t = p[None, :, :] - centers[:, None, :]  # (C, W, 3)
    win = Cluster(vmap.win_P, vmap.win_v, vmap.win_n)
    wld = cluster.transform(win, R[None], t)  # batched (C, W)
    has = (vmap.win_n > 0)[..., None]
    add_P = jnp.sum(jnp.where(has, wld.P, 0.0), axis=1)
    add_v = jnp.sum(jnp.where(has, wld.v, 0.0), axis=1)
    add_n = jnp.sum(vmap.win_n, axis=1)
    return ScanScratch(add_P, add_v, add_n)


def marginalize_column(
    vmap: VoxelMap,
    R: jnp.ndarray,  # (3, 3) final BA pose of the retiring scan
    p: jnp.ndarray,  # (3,)
    col: jnp.ndarray,  # () int32 window column being marginalized
    params: MapParams,
    size: int | None = None,
    clear_col: bool = False,
) -> VoxelMap:
    """Fold window column `col` into the fixed history IN PLACE —
    the reference's margi folds each voxel's own stored cluster
    (voxel_map.hpp:1249-1278), so the fixed moments land in exactly
    the voxel that held the window points, regardless of how much the
    BA moved the pose since push time.

    Compacted: only slots holding points of the retiring scan can
    change (≤ one scan's voxel count), so gather → transform →
    scatter-add instead of a full-capacity transform pass.  The
    compaction must cover the scan's original rows PLUS stale
    subdivided parents PLUS rerouted child rows — up to ~3 rows per
    point across the ≤2 subdivision levels — hence the 3·n_ds-ish
    default.

    `clear_col=True` additionally zeroes the folded rows' column
    entries — the ring-buffer slide (`clear_window_col` semantics)
    done as a compacted row scatter instead of a full-table pass (the
    compacted set covers every row with win_n > 0 in this column, and
    rows with win_n == 0 are already fully zero by the clear
    invariant)."""
    C = params.capacity
    dtype = vmap.fix.dtype
    A = params.max_active if size is None else size
    W = vmap.win.shape[1]
    # contiguous dynamic slice of ONE window column — not a gather
    colrow = jax.lax.dynamic_slice(
        vmap.win, (0, col, 0), (C, 1, CL_W)
    )[:, 0]  # (C, 10)
    cn_full = colrow[:, CL_N]
    (aidx,) = jnp.nonzero(cn_full > 0, size=A, fill_value=C)
    aok = aidx < C
    s_ = jnp.clip(aidx, 0, C - 1)

    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    lvl = jnp.clip(vmap.keys[s_, 3], 0)
    centers = (vmap.keys[s_, :3].astype(dtype) + 0.5) * sizes[lvl][:, None]
    crow = colrow[s_]  # ONE gather of the fused (P, v, n) rows
    cn = crow[:, CL_N]
    t = p[None, :] - centers  # (A, 3)
    wld = cluster.transform(Cluster(crow[:, CL_P], crow[:, CL_V], cn),
                            R[None], t)
    # subdivided parents hold stale/partial window rows (their points
    # were re-routed to children, which fold their own copies) — skip
    gate = (
        aok & (vmap.fix[s_, CL_N] < params.max_points) & (cn > 0)
        & (vmap.state[s_] == 0)
    )
    dst = jnp.where(gate, aidx, C)
    # compacted nonzero indices are unique and ascending; the gate
    # only interleaves the drop sentinel, so no sorted/unique promises.
    # ONE fused row scatter-add into the fixed table.
    add = jnp.concatenate([wld.P, wld.v, cn[:, None]], axis=-1)
    fix = vmap.fix.at[dst].add(add, mode="drop")
    vmap = vmap._replace(fix=fix)
    if clear_col:
        zdst = jnp.where(aok, s_ * W + col, C * W)
        win = vmap.win.reshape(C * W, CL_W).at[zdst].set(
            0.0, mode="drop"
        ).reshape(C, W, CL_W)
        vmap = vmap._replace(win=win)
    return vmap


def slide_window_cols(vmap: VoxelMap) -> VoxelMap:
    """Drop the oldest window column (shift left, zero the last) —
    used by the full-rebuild paths where columns are in logical order."""
    win = jnp.concatenate(
        [vmap.win[:, 1:], jnp.zeros_like(vmap.win[:, :1])], axis=1
    )
    return vmap._replace(win=win)


def clear_window_col(vmap: VoxelMap, col: jnp.ndarray) -> VoxelMap:
    """Invalidate ONE window column — the ring-buffer slide of the
    steady hot path (the reference's mp[] ring-index rotation,
    voxelslam.cpp:1689-1693).

    ALL lanes of the column are zeroed (one fused elementwise masked
    multiply over the win table; a dynamic_update_slice variant
    measured ~3x slower on TPU — the full-buffer copy it implies
    beats the multiply's streaming pass).

    This maintains the invariant exploited by `push_scan` and
    `reroute_subdivided`: every row with win_n == 0 is entirely zero,
    so fresh accumulation needs NO stale-row zero-scatter."""
    W = vmap.win.shape[1]
    keep = (jnp.arange(W, dtype=jnp.int32) != col).astype(vmap.win.dtype)
    return vmap._replace(win=vmap.win * keep[None, :, None])


# ------------------------------------------------------------------ planes

def _plane_params(P: jnp.ndarray, v: jnp.ndarray, n: jnp.ndarray,
                  cov9: jnp.ndarray, w: jnp.ndarray, V: jnp.ndarray):
    """Plane center/normal + 6x6 covariance from voxel moments via
    first-order eigenvector perturbation (reference plane_update,
    voxel_map.hpp:1118-1146).  All args batched over slots; cov9 is
    the PACKED (…, 45) symmetric moment covariance (see _bf_var)."""
    nv = 1.0 / jnp.maximum(n, 1.0)
    center = v * nv[..., None]
    u0 = V[..., :, 0]
    # u_c (3x9): sensitivity of the normal to the 9 moment coords;
    # built and contracted as unrolled lane-wide ops (tiny batched
    # matmuls waste the MXU)
    uc = [[0.0] * 9 for _ in range(3)]
    for k in (1, 2):
        uk = V[..., :, k]
        M = lambda i, j: uk[..., i] * u0[..., j]
        fP = [
            M(0, 0),
            M(1, 0) + M(0, 1),
            M(2, 0) + M(0, 2),
            M(1, 1),
            M(1, 2) + M(2, 1),
            M(2, 2),
        ]
        ukc = jnp.sum(uk * center, axis=-1)
        u0c = jnp.sum(u0 * center, axis=-1)
        fv = [-(ukc * u0[..., j] + u0c * uk[..., j]) for j in range(3)]
        f = fP + fv
        gap = w[..., 0] - w[..., k]
        coef = nv / jnp.where(jnp.abs(gap) > 1e-9, gap, 1e-9)
        for i in range(3):
            ci = coef * uk[..., i]
            for j in range(9):
                uc[i][j] = uc[i][j] + ci * f[j]
    c9 = [[cov9[..., _sym9(i, j)] for j in range(9)] for i in range(9)]
    # Jc = u_c @ cov9 (3x9); var_nn = Jc @ u_cᵀ (3x3)
    Jc = [
        [sum(uc[i][k] * c9[k][j] for k in range(9)) for j in range(9)]
        for i in range(3)
    ]
    var_nn = [
        [sum(Jc[i][k] * uc[j][k] for k in range(9)) for j in range(3)]
        for i in range(3)
    ]
    rows = []
    for i in range(3):
        row = var_nn[i] + [nv * Jc[i][6 + j] for j in range(3)]
        rows.append(jnp.stack(row, axis=-1))
    for i in range(3):
        row = [nv * Jc[j][6 + i] for j in range(3)] + [
            nv * nv * c9[6 + i][6 + j] for j in range(3)
        ]
        rows.append(jnp.stack(row, axis=-1))
    pvar = jnp.stack(rows, axis=-2)
    return u0, center, pvar, w[..., 2]


def _refit_at(vmap: VoxelMap, aidx: jnp.ndarray, aok: jnp.ndarray,
              P: jnp.ndarray, v: jnp.ndarray, n: jnp.ndarray,
              params: MapParams):
    """Plane refit + subdivision decision on a compacted slot subset
    (the shared core of recut/recut_touched; reference recut +
    plane_update, voxel_map.hpp:1118-1194).

    pcr_add = fixed + window moments; plane gate
    λ0 < min_eigen_value AND λ0/λ2 < thre[level]
    (plane_judge, voxel_map.hpp:1015-1019).  A failed leaf below
    max_layer flips to subdivided; its points re-route on the next
    scatter pass."""
    dtype = P.dtype
    C = vmap.keys.shape[0]
    A = aidx.shape[0]
    s_ = jnp.clip(aidx, 0, C - 1)
    level = jnp.clip(vmap.keys[s_, 3], 0)
    cov9 = vmap.cov_add[s_]

    c = Cluster(P, v, n)
    S = cluster.cov(c)
    w, V = eigh3.eigh3(S)

    min_point = jnp.asarray(params.min_point, dtype)[level]
    thre = jnp.asarray(params.plane_thre_inv, dtype)[level]
    enough = n > min_point
    lam0 = w[..., 0]
    lam2 = jnp.maximum(w[..., 2], 1e-12)
    is_plane = (lam0 < params.min_eigen_value) & (lam0 / lam2 < thre)

    active = aok & enough
    subdivide = active & ~is_plane & (level < params.max_layer)
    plane_ok = active & is_plane

    u0, center, pvar, radius = _plane_params(P, v, n, cov9, w, V)

    # ONE gather of the old meta rows + ONE row scatter-back: per
    # lane, new values apply under their own condition; rows outside
    # `active` (note: subdivide ⊆ active) keep their old content (the
    # write condition drops them)
    old = vmap.meta[s_]  # (A, 48)
    pk = plane_ok[:, None]
    meta_rows = jnp.concatenate(
        [
            jnp.where(pk, u0, old[:, MT_PN]),
            jnp.where(pk, center, old[:, MT_PC]),
            jnp.where(pk, pvar.reshape(A, 36), old[:, MT_VAR]),
            jnp.where(plane_ok, radius, old[:, MT_RAD])[:, None],
            w,
            n[:, None],
            (is_plane & ~subdivide).astype(dtype)[:, None],
        ],
        axis=-1,
    )
    # no sorted/unique promises: the where() masking interleaves the
    # drop sentinel, which breaks index monotonicity (a TPU lowering
    # would silently mis-scatter if the flags lied)
    d_meta = jnp.where(active, jnp.where(aok, aidx, C), C)
    meta = vmap.meta.at[d_meta].set(meta_rows, mode="drop")
    d_state = jnp.where(subdivide, jnp.where(aok, aidx, C), C)
    state = vmap.state.at[d_state].set(
        jnp.ones((A,), vmap.state.dtype), mode="drop"
    )
    vmap = vmap._replace(state=state, meta=meta)
    return vmap, jnp.sum(subdivide)


def recut(vmap: VoxelMap, scratch: ScanScratch, params: MapParams,
          touch: jnp.ndarray | None = None, size: int | None = None):
    """Per-slot plane refit over precomputed full-capacity window sums
    (full-rebuild path).

    Only voxels with live window points can change, so the math runs
    on a compacted ≤ max_active subset and scatters back — the
    reference iterates its `surf_map_slide` touched set for the same
    reason (voxelslam.cpp:1398-1453).  `touch` optionally restricts
    further; `size` overrides the compaction bound."""
    C = vmap.keys.shape[0]
    A = params.max_active if size is None else size
    occupied = vmap.keys[:, 3] >= 0
    leaf = occupied & (vmap.state == 0)
    touched = leaf & (scratch.add_n > 0)
    if touch is not None:
        touched = touched & touch
    (aidx,) = jnp.nonzero(touched, size=A, fill_value=C)
    aok = aidx < C
    s_ = jnp.clip(aidx, 0, C - 1)
    fx = vmap.fix[s_]  # one fused (P, v, n) row gather
    P = fx[:, CL_P] + scratch.add_P[s_]
    v = fx[:, CL_V] + scratch.add_v[s_]
    n = fx[:, CL_N] + scratch.add_n[s_]
    return _refit_at(vmap, aidx, aok, P, v, n, params)


def recut_touched(vmap: VoxelMap, R: jnp.ndarray, p: jnp.ndarray,
                  touch: jnp.ndarray, params: MapParams, size: int):
    """Incremental-path recut: compute the world window sums ONLY on
    the compacted touched set instead of materializing a full-capacity
    ScanScratch — the (C, W) cluster-transform pass was the most
    HBM-expensive stage of the steady step at production shapes.

    Returns (vmap', n_subdiv, add_n) where add_n (C,) is the cheap
    per-slot window point count (win_n row sum) for factor harvest."""
    C = vmap.keys.shape[0]
    dtype = vmap.win_P.dtype
    add_n = jnp.sum(vmap.win[:, :, CL_N], axis=1)
    occupied = vmap.keys[:, 3] >= 0
    leaf = occupied & (vmap.state == 0)
    # growth gate (reference plane_update, voxel_map.hpp:1118-1146):
    # refit only voxels that gained >= refit_growth points since their
    # last refit — fresh voxels (last_num == 0) pass once they clear
    # the min_point gate inside _refit_at
    n_tot = vmap.fix[:, CL_N] + add_n
    grown = (n_tot - vmap.meta[:, MT_LAST]) >= params.refit_growth
    touched = leaf & (add_n > 0) & touch & grown
    (aidx,) = jnp.nonzero(touched, size=size, fill_value=C)
    aok = aidx < C
    s_ = jnp.clip(aidx, 0, C - 1)

    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    lvl = jnp.clip(vmap.keys[s_, 3], 0)
    centers = (vmap.keys[s_, :3].astype(dtype) + 0.5) * sizes[lvl][:, None]
    t = p[None, :, :] - centers[:, None, :]  # (A, W, 3)
    wrows = vmap.win[s_]  # ONE gather of the (W, 10) cluster rows
    wn = wrows[:, :, CL_N]
    win = Cluster(wrows[:, :, CL_P], wrows[:, :, CL_V], wn)
    wld = cluster.transform(win, R[None], t)  # (A, W, ...)
    has = (wn > 0)[..., None]
    fx = vmap.fix[s_]
    P = fx[:, CL_P] + jnp.sum(jnp.where(has, wld.P, 0.0), axis=1)
    v = fx[:, CL_V] + jnp.sum(jnp.where(has, wld.v, 0.0), axis=1)
    n = fx[:, CL_N] + add_n[s_]
    vmap, n_subdiv = _refit_at(vmap, aidx, aok, P, v, n, params)
    return vmap, n_subdiv, add_n


# ------------------------------------------------------------------ match

class MatchResult(NamedTuple):
    valid: jnp.ndarray  # (K,) bool
    normal: jnp.ndarray  # (K, 3)
    dist: jnp.ndarray  # (K,) signed point-to-plane distance
    sigma: jnp.ndarray  # (K,) plane+point variance along the normal
    slot: jnp.ndarray  # (K,) matched slot (for diagnostics)
    center: jnp.ndarray  # (K, 3) matched plane center in WORLD frame —
    #   lets the ESIKF re-evaluate the residual under an updated pose
    #   without re-running the map association (the reference's cached
    #   OctoTree* fast path, voxelslam.cpp:892-899)


def match(
    vmap: VoxelMap,
    pts_w: jnp.ndarray,  # (K, 3) world points
    var_w: Optional[jnp.ndarray],  # (K, 3, 3) world point covariance
    valid: jnp.ndarray,  # (K,)
    params: MapParams,
    pt_proj: Optional[tuple] = None,
) -> MatchResult:
    """Point-to-plane association with ±3σ Mahalanobis gating
    (reference match, voxel_map.hpp:1335-1392 + map-level descent
    1673-1698), fully vectorized.

    Gates: (1) in-plane distance² ≤ 9·λ2 (plane extent), and
    (2) |point-to-plane| < 3σ with σ² = J Σ_plane Jᵀ + nᵀ Σ_pt n.

    The point-noise term only ever appears PROJECTED on the matched
    normal, so callers that would otherwise materialize the (K, 3, 3)
    world covariance (body cov + pose cov inflation — batched tiny
    matmuls, see ops/lanes.py) can instead pass
    ``pt_proj = (pts_b, var_b, R, rot_var, tsl_var)`` and the
    projection  nᵀΣn = qᵀΣ_b q + wᵀΣ_rot w + nᵀΣ_tsl n  with
    q = Rᵀn, w = p_b×n  is computed lane-wise here.
    """
    coord, lvl, slot = assign(vmap, pts_w, valid, params)
    found = valid & (slot >= 0)
    s = jnp.clip(slot, 0)
    mrow = vmap.meta[s]  # ONE gather of the fused plane rows
    pl_ok = found & (mrow[:, MT_VALID] > 0.5)

    dtype = pts_w.dtype
    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    vox_center = (coord.astype(dtype) + 0.5) * sizes[lvl][:, None]
    rel = pts_w - vox_center
    nrm = mrow[:, MT_PN]
    ctr = mrow[:, MT_PC]
    d = jnp.sum(nrm * (rel - ctr), axis=-1)
    dc2 = jnp.sum((rel - ctr) ** 2, axis=-1)
    range_ok = (dc2 - d * d) <= 9.0 * mrow[:, MT_RAD]

    # J Σ_plane Jᵀ as 36 lane multiply-adds over (K,) — the einsum
    # form lowers to K batched 6×6 matvecs (tiny-matmul poison)
    relc = rel - ctr
    Jl = [relc[:, 0], relc[:, 1], relc[:, 2],
          -nrm[:, 0], -nrm[:, 1], -nrm[:, 2]]
    pv = mrow[:, MT_VAR]  # (K, 36) row-major 6×6
    sigma = sum(
        Jl[i] * pv[:, 6 * i + j] * Jl[j]
        for i in range(6) for j in range(6)
    )
    nl = lanes.from_vec(nrm)
    if pt_proj is not None:
        pts_b, var_b, R, rot_var, tsl_var = pt_proj
        q = [sum(R[k, i] * nl[k] for k in range(3)) for i in range(3)]
        w = lanes.cross(lanes.from_vec(pts_b), nl)
        sigma = sigma + sum(
            q[i] * var_b[:, i, j] * q[j]
            for i in range(3) for j in range(3)
        )
        sigma = sigma + sum(
            w[i] * rot_var[i, j] * w[j]
            for i in range(3) for j in range(3)
        )
        sigma = sigma + sum(
            nl[i] * tsl_var[i, j] * nl[j]
            for i in range(3) for j in range(3)
        )
    else:
        sigma = sigma + sum(
            nl[i] * var_w[:, i, j] * nl[j]
            for i in range(3) for j in range(3)
        )
    sigma = jnp.maximum(sigma, 1e-12)
    gate = jnp.abs(d) < 3.0 * jnp.sqrt(sigma)

    ok = pl_ok & range_ok & gate
    return MatchResult(
        ok, nrm, d, sigma, jnp.where(ok, slot, -1), vox_center + ctr
    )


# ------------------------------------------------------------------ margi

def marginalize(
    vmap: VoxelMap,
    pts_body: jnp.ndarray,  # (N, 3) oldest scan's points (body frame)
    var_w: jnp.ndarray,  # (N, 3, 3)
    R: jnp.ndarray,  # (3, 3) final BA pose of the oldest scan
    p: jnp.ndarray,  # (3,)
    valid: jnp.ndarray,  # (N,)
    params: MapParams,
    accumulate_cov: bool = True,
) -> VoxelMap:
    """Fold the oldest scan into the fixed per-voxel history
    (reference margi, voxel_map.hpp:1196-1305).

    The cap policy mirrors the reference: voxels whose fixed count
    already reached max_points discard the scan (their plane stays
    frozen); others absorb moments + noise.  Because window clusters
    are rebuilt functionally every scan, no per-slot clearing is
    needed — the scan simply leaves the window arrays.
    """
    C = params.capacity
    dtype = pts_body.dtype
    pts_w = jnp.einsum("ij,nj->ni", R, pts_body) + p
    coord, lvl, slot0 = assign(vmap, pts_w, valid, params)
    # find-or-create: fixed history may target voxels that do not
    # exist yet (keyframe reload, post-loop map rebuild)
    keys, slot, _, _ = hashmap.insert_points(
        vmap.keys, coord, lvl, valid, params.max_probe,
        max_unique=min(pts_w.shape[0], 16384), known_slot=slot0,
    )
    vmap = vmap._replace(keys=keys)
    ok = valid & (slot >= 0)
    s = jnp.clip(slot, 0)
    # cap gate evaluated on pre-marginalization counts
    ok = ok & (vmap.fix[s, CL_N] < params.max_points)
    slot_safe = jnp.where(ok, slot, C)

    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    center = (coord.astype(dtype) + 0.5) * sizes[lvl][:, None]
    rel = pts_w - center
    order = jnp.argsort(slot_safe)
    slot_s = slot_safe[order]
    rel_s = rel[order]
    orel = cluster.point_outer_packed(rel_s)
    vals = jnp.concatenate(
        [orel, rel_s, jnp.ones_like(rel_s[:, :1])], axis=-1
    )
    fix = segsum.sorted_segment_add(vmap.fix, slot_s, vals)
    # points marginalized out of the sliding window already added
    # their Bf_var at push time (accumulate_cov=False); fresh fixed
    # insertions (keyframe reload, map rebuild) have not
    if accumulate_cov:
        bcov = _bf_var(rel_s, var_w[order])
        cov_add = segsum.sorted_segment_add(vmap.cov_add, slot_s, bcov)
        vmap = vmap._replace(cov_add=cov_add)
    return vmap._replace(fix=fix)


# ------------------------------------------------------------------ evict

def evict(vmap: VoxelMap, jour_now: jnp.ndarray, params: MapParams,
          evict_dist: jnp.ndarray | None = None) -> VoxelMap:
    """Distance-based eviction + table compaction (reference idle-time
    release, voxelslam.cpp:1503-1527): drop voxels whose last touch is
    more than evict_dist of travel behind, rebuilding the table so
    probe chains stay short.  Call occasionally from the host loop.

    `evict_dist` (traced) overrides the configured distance — the
    host's pressure valve shrinks it when the table overflows or the
    load factor climbs (the reference's counterpart is the pool trim,
    voxelslam.cpp:1528-1536).  Voxels with live window points are
    never dropped (they carry un-marginalized scan moments).

    Returns (vmap', dstmap) — dstmap (C+1,) int32 maps every old slot
    to its new slot (C for dropped; dstmap[C] = C), so callers can
    remap stored slot records (the window's per-point routing).
    """
    C = params.capacity
    if evict_dist is None:
        evict_dist = jnp.asarray(params.evict_dist, vmap.jour.dtype)
    occupied = vmap.keys[:, 3] >= 0
    keep = occupied & (
        (jour_now - vmap.jour < evict_dist)
        | (jnp.sum(vmap.win[:, :, CL_N], axis=1) > 0)
    )

    fresh = hashmap.empty_keys(C)
    coords = vmap.keys[:, :3]
    levels = jnp.where(keep, vmap.keys[:, 3], -1)
    keys, slot, created, _ = hashmap.insert(
        fresh, coords, levels, keep, params.max_probe
    )
    dst = jnp.where(keep & (slot >= 0), slot, C)

    def move(arr, fill=0.0):
        out = jnp.full_like(arr, fill)
        return out.at[dst].set(arr, mode="drop")

    dstmap = jnp.concatenate(
        [jnp.where(dst < C, dst, C), jnp.full((1,), C, jnp.int32)]
    )
    return VoxelMap(
        keys=keys,
        state=move(vmap.state),
        fix=move(vmap.fix),
        cov_add=move(vmap.cov_add),
        win=move(vmap.win),
        meta=move(vmap.meta),
        jour=move(vmap.jour),
    ), dstmap


# compiled entry points for the host loop (eager ops on the axon TPU
# are slow — keep host-dispatched map maintenance in jitted programs)
evict_compiled = partial(jax.jit, static_argnames=("params",))(evict)


@jax.jit
def load_factor(keys: jnp.ndarray) -> jnp.ndarray:
    """Occupancy fraction of the hash table (hashmap.stats, jitted)."""
    return jnp.sum(keys[:, 3] != hashmap.EMPTY_LEVEL) / keys.shape[0]
