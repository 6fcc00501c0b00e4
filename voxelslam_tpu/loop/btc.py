"""Binary-triangle (BTC) loop-closure descriptors, TPU-native.

Counterpart of the reference's `STDescManager` descriptor extraction
(BTC.cpp:90-1126).  The stages map to dense batched ops:

1. voxel plane extraction  — flat hash voxelization + batched 3x3
   eigendecomposition (init_voxel_map/get_plane, BTC.cpp:90-338);
2. projection-plane merge  — quantized (normal, offset) bucketing +
   segment reduction instead of the greedy pairwise merge
   (get_project_plane/merge_plane, BTC.cpp:340-569);
3. binary occupancy images — points project onto ≤n_proj planes into
   a static G×G 0.5 m grid; per cell a CUT-bin occupancy bitmask
   along the normal, summary = popcount (extract_binary,
   BTC.cpp:613-924);
4. corner selection        — per 5×5-tile argmax + line-feature
   filter + radius NMS + top-k by summary (BTC.cpp:804-977);
5. triangle descriptors    — K-NN over corners, side-sorted triangles
   with vertex-consistent permutation, quantized dedup
   (generate_std, BTC.cpp:979-1126).

Everything is fixed-shape with validity masks; a keyframe in → one
`BtcDescriptors` batch out, entirely on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import hashing
from ..ops import eigh3


class BtcParams(NamedTuple):
    """Static config (reference presets: read_parameters, BTC.cpp:3-68).
    isHighFly=0 defaults."""

    # plane extraction
    voxel_size: float = 1.0
    voxel_init_num: int = 10
    plane_detection_thre: float = 0.01
    plane_merge_normal_thre: float = 0.1
    plane_merge_dis_thre: float = 0.3
    # projection
    n_proj: int = 2
    proj_resolution: float = 0.5
    proj_high_inc: float = 0.1
    proj_dis_min: float = 0.0
    proj_dis_max: float = 5.0
    summary_min_thre: int = 10
    line_filter_enable: bool = True
    # keep a corner only if its column's 4 nearest-to-plane occupancy
    # bins are hit — structure "touching" the projection plane
    # (reference touch_filter_enable_, BTC.cpp:822-832; disabled in
    # both reference presets)
    touch_filter_enable: bool = False
    # corners / triangles
    useful_corner_num: int = 100
    nms_radius: float = 2.0
    desc_near_num: int = 15
    desc_min_len: float = 2.0
    desc_max_len: float = 50.0
    side_resolution: float = 0.2
    # static shapes
    max_vox_planes: int = 512  # plane cloud per keyframe
    grid: int = 100  # G x G projection image (50 m at 0.5 m)
    cut_bins: int = 64  # occupancy bins (covers (dis_max-dis_min)/inc)
    max_raw_corners: int = 512  # pre-NMS corner pool
    max_corners: int = 128  # post-NMS corners (>= useful_corner_num)
    max_triangles: int = 1024

    @property
    def cut_num(self) -> int:
        return min(
            int((self.proj_dis_max - self.proj_dis_min) / self.proj_high_inc),
            self.cut_bins,
        )


def highfly_params() -> BtcParams:
    """The aerial preset (isHighFly=1, BTC.cpp:38-68)."""
    return BtcParams(
        voxel_size=2.0, plane_detection_thre=0.05,
        plane_merge_normal_thre=0.3, plane_merge_dis_thre=0.6,
        n_proj=1, proj_high_inc=0.2, proj_dis_max=10.0,
        summary_min_thre=6, line_filter_enable=False,
        useful_corner_num=200, nms_radius=3.0, desc_min_len=3.0,
        max_corners=256,
    )


class PlaneCloud(NamedTuple):
    """Per-keyframe voxel plane cells (used by search verify + ICP)."""

    center: jnp.ndarray  # (M, 3)
    normal: jnp.ndarray  # (M, 3)
    valid: jnp.ndarray  # (M,)


class BtcDescriptors(NamedTuple):
    """Triangle descriptors of one keyframe, padded to T."""

    sides: jnp.ndarray  # (T, 3) sorted side lengths / side_resolution
    verts: jnp.ndarray  # (T, 3, 3) A, B, C locations (A opposite a...)
    occ: jnp.ndarray  # (T, 3, CUT) binary occupancy per vertex
    summary: jnp.ndarray  # (T, 3)
    center: jnp.ndarray  # (T, 3)
    valid: jnp.ndarray  # (T,)


# ----------------------------------------------------------- voxel planes

def extract_planes(pts: jnp.ndarray, mask: jnp.ndarray, p: BtcParams):
    """Voxelize the keyframe cloud and fit per-voxel planes
    (BTCOctoTree::init_plane, BTC.cpp:90-139)."""
    M = p.max_vox_planes
    dtype = pts.dtype
    coord = hashing.voxel_coord(pts, p.voxel_size)
    key = hashing.mix(coord, jnp.int32(0))
    key = jnp.where(mask, key, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    key_s = key[order]
    coord_s = coord[order]
    mask_s = mask[order]
    pts_s = pts[order]
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool),
         (key_s[1:] != key_s[:-1])
         | jnp.any(coord_s[1:] != coord_s[:-1], axis=-1)]
    ) & mask_s
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    dst = jnp.where(mask_s & (seg >= 0) & (seg < M), seg, M)
    ssum = jnp.zeros((M, 3), dtype).at[dst].add(pts_s, mode="drop")
    souter = jnp.zeros((M, 3, 3), dtype).at[dst].add(
        pts_s[:, :, None] * pts_s[:, None, :], mode="drop"
    )
    cnt = jnp.zeros((M,), dtype).at[dst].add(1.0, mode="drop")
    n = jnp.maximum(cnt, 1.0)
    mean = ssum / n[:, None]
    cov = souter / n[:, None, None] - mean[:, :, None] * mean[:, None, :]
    w, V = eigh3.eigh3(cov)
    # planarity: small λ0 AND λ1 clearly larger (rejects line-like
    # voxels — e.g. poles/edges — whose λ0≈λ1 normal is arbitrary)
    ok = (
        (cnt > p.voxel_init_num)
        & (w[:, 0] < p.plane_detection_thre)
        & (w[:, 1] > 4.0 * jnp.maximum(w[:, 0], 0.25 * p.plane_detection_thre))
    )
    return PlaneCloud(center=mean, normal=V[:, :, 0], valid=ok)


# ------------------------------------------------------ projection planes

def merge_planes(planes: PlaneCloud, p: BtcParams):
    """Group coplanar voxel planes into projection planes
    (merge_plane, BTC.cpp:340-569) and return the `n_proj` largest
    groups.

    The reference merges greedily with pairwise thresholds; here the
    same pairwise criteria — normal within plane_merge_normal_thre
    (sign-insensitive) and mutual point-to-plane distance within
    plane_merge_dis_thre — define a graph on ≤ max_vox_planes nodes,
    and connected components come from iterated min-label propagation
    (all-pairs is a trivial (M, M) op at M ≤ 512)."""
    M = planes.center.shape[0]
    dtype = planes.center.dtype
    n = planes.normal
    c = planes.center
    ninc = jnp.linalg.norm(n[:, None, :] - n[None, :, :], axis=-1)
    nadd = jnp.linalg.norm(n[:, None, :] + n[None, :, :], axis=-1)
    dvec = c[:, None, :] - c[None, :, :]
    d_ij = jnp.abs(jnp.einsum("jk,ijk->ij", n, dvec))  # to plane j
    d_ji = jnp.abs(jnp.einsum("ik,ijk->ij", n, dvec))  # to plane i
    adj = (
        ((ninc < p.plane_merge_normal_thre) | (nadd < p.plane_merge_normal_thre))
        & (d_ij < p.plane_merge_dis_thre)
        & (d_ji < p.plane_merge_dis_thre)
        & planes.valid[:, None]
        & planes.valid[None, :]
    )

    labels0 = jnp.where(planes.valid, jnp.arange(M, dtype=jnp.int32), M)

    def prop(_, lab):
        neigh = jnp.where(adj, lab[None, :], M)
        return jnp.minimum(lab, jnp.min(neigh, axis=1))

    labels = jax.lax.fori_loop(0, 32, prop, labels0)

    # segment-reduce by component label.  The component plane is
    # REFIT from the member voxel centers (scatter eigendecomposition)
    # rather than normal averaging — transitive merge chains tilt an
    # averaged normal, and a 2° tilt already moves projected corners
    # by ~20 cm at range, destroying descriptor repeatability.
    rep_n = n[jnp.clip(labels, 0, M - 1)]
    sgn = jnp.where(jnp.sum(n * rep_n, axis=-1) < 0, -1.0, 1.0)
    na = n * sgn[:, None]
    dst = jnp.where(planes.valid, labels, M)
    csum = jnp.zeros((M, 3), dtype).at[dst].add(c, mode="drop")
    osum = jnp.zeros((M, 3, 3), dtype).at[dst].add(
        c[:, :, None] * c[:, None, :], mode="drop"
    )
    nsum = jnp.zeros((M, 3), dtype).at[dst].add(na, mode="drop")
    cnt = jnp.zeros((M,), dtype).at[dst].add(1.0, mode="drop")
    topk = jax.lax.top_k(cnt, p.n_proj)[1]
    k_cnt = jnp.maximum(cnt[topk], 1.0)
    cc = csum[topk] / k_cnt[:, None]
    scat = osum[topk] / k_cnt[:, None, None] - cc[:, :, None] * cc[:, None, :]
    w_s, V_s = eigh3.eigh3(scat)
    n_fit = V_s[:, :, 0]
    n_avg = nsum[topk]
    n_avg = n_avg / jnp.maximum(
        jnp.linalg.norm(n_avg, axis=-1, keepdims=True), 1e-9
    )
    # refit needs ≥3 spread voxels (middle eigenvalue > 0); else keep avg
    use_fit = w_s[:, 1] > 1e-4
    sgn_fit = jnp.where(jnp.sum(n_fit * n_avg, axis=-1) < 0, -1.0, 1.0)
    nn = jnp.where(use_fit[:, None], n_fit * sgn_fit[:, None], n_avg)
    return cc, nn, cnt[topk] > 0  # (n_proj, 3), (n_proj, 3), (n_proj,)


# ------------------------------------------------------- binary extraction

def _proj_axes(normal: jnp.ndarray):
    """The reference's deterministic in-plane basis
    (extract_binary, BTC.cpp:633-645)."""
    A, B, C = normal[0], normal[1], normal[2]
    x1 = jnp.where(
        jnp.abs(C) > 1e-8,
        jnp.stack([jnp.ones_like(A), jnp.ones_like(A), -(A + B) / jnp.where(jnp.abs(C) > 1e-8, C, 1.0)]),
        jnp.where(
            jnp.abs(B) > 1e-8,
            jnp.stack([jnp.ones_like(A), -A / jnp.where(jnp.abs(B) > 1e-8, B, 1.0), jnp.zeros_like(A)]),
            jnp.stack([jnp.zeros_like(A), jnp.ones_like(A), jnp.zeros_like(A)]),
        ),
    )
    x1 = x1 / jnp.maximum(jnp.linalg.norm(x1), 1e-9)
    y1 = jnp.cross(normal, x1)
    y1 = y1 / jnp.maximum(jnp.linalg.norm(y1), 1e-9)
    return x1, y1


class _Corners(NamedTuple):
    loc: jnp.ndarray  # (C, 3)
    occ: jnp.ndarray  # (C, CUT) bool
    summary: jnp.ndarray  # (C,)
    valid: jnp.ndarray  # (C,)


def _extract_binary_one(pts, mask, center, normal, plane_ok, p: BtcParams):
    """Occupancy image + corners for one projection plane."""
    G = p.grid
    CUT = p.cut_num
    dtype = pts.dtype
    e1, e2 = _proj_axes(normal)
    rel = pts - center
    dis = jnp.abs(rel @ normal)
    in_band = mask & plane_ok & (dis > p.proj_dis_min) & (dis <= p.proj_dis_max)
    u = rel @ e1
    v = rel @ e2
    half = G * p.proj_resolution / 2.0
    gx = jnp.floor((u + half) / p.proj_resolution).astype(jnp.int32)
    gy = jnp.floor((v + half) / p.proj_resolution).astype(jnp.int32)
    inside = in_band & (gx >= 0) & (gx < G) & (gy >= 0) & (gy < G)
    cell = gx * G + gy
    bin_i = jnp.clip(
        ((dis - p.proj_dis_min) / p.proj_high_inc).astype(jnp.int32), 0, CUT - 1
    )
    flat = jnp.where(inside, cell * CUT + bin_i, G * G * CUT)
    occ = jnp.zeros((G * G * CUT,), bool).at[flat].max(inside, mode="drop")
    occ = occ.reshape(G * G, CUT)
    summary = jnp.sum(occ, axis=-1).astype(dtype)  # dis_array

    cell_safe = jnp.where(inside, cell, G * G)
    usum = jnp.zeros((G * G,), dtype).at[cell_safe].add(jnp.where(inside, u, 0.0), mode="drop")
    vsum = jnp.zeros((G * G,), dtype).at[cell_safe].add(jnp.where(inside, v, 0.0), mode="drop")
    cnt = jnp.zeros((G * G,), dtype).at[cell_safe].add(inside.astype(dtype), mode="drop")

    img = summary.reshape(G, G)
    # 5x5 local-maximum corner selection.  The reference uses per-tile
    # argmax over a data-dependent grid origin (BTC.cpp:800-840) which
    # reshuffles winners when the origin shifts between keyframes; a
    # sliding-window maximum keeps the same semantics (one corner per
    # 5x5 neighborhood) but is translation invariant, which measurably
    # improves corner repeatability.
    win_max = jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME"
    )
    is_peak = (img >= win_max) & (img >= p.summary_min_thre)
    # compact peaks: top max_raw_corners cells by (masked) summary
    flat_score = jnp.where(is_peak.reshape(-1), img.reshape(-1), -1.0)
    n_keep = p.max_raw_corners // max(p.n_proj, 1)
    top_v, top_i = jax.lax.top_k(flat_score, n_keep)
    bx = top_i // G
    by = top_i % G
    best_val = top_v
    keep = top_v > 0.0
    if p.touch_filter_enable:
        touch = jnp.any(occ[:, :4], axis=-1)  # (G*G,)
        keep = keep & touch[jnp.clip(top_i, 0, G * G - 1)]

    # line filter (BTC.cpp:843-890): suppress cells that lie on a
    # ridge: for any of 4 directions, both neighbors comparably high.
    if p.line_filter_enable:
        img_pad = jnp.pad(img, 1)
        def nb(dx, dy):
            return img_pad[1 + bx + dx, 1 + by + dy]
        is_line = jnp.zeros_like(keep)
        for (dx, dy) in ((0, 1), (1, 0), (1, 1), (1, -1)):
            q1 = nb(dx, dy)
            q2 = nb(-dx, -dy)
            thr = best_val - 3.0
            cond = ((q1 >= thr) & (q2 >= 0.5 * best_val)) | (
                (q2 >= thr) & (q1 >= 0.5 * best_val)
            ) | ((q1 >= thr) & (q2 >= thr))
            is_line = is_line | cond
        border = (bx <= 0) | (bx >= G - 1) | (by <= 0) | (by >= G - 1)
        keep = keep & ~is_line & ~border

    cellb = (bx * G + by).reshape(-1)
    keep = keep.reshape(-1)
    cm = jnp.maximum(cnt[cellb], 1.0)
    cu = usum[cellb] / cm
    cv = vsum[cellb] / cm
    loc = center + cu[:, None] * e1 + cv[:, None] * e2
    return _Corners(
        loc=loc,
        occ=occ[cellb],
        summary=summary.reshape(-1)[cellb],
        valid=keep & plane_ok,
    )


def _nms_and_topk(c: _Corners, p: BtcParams) -> _Corners:
    """Radius NMS (drop i if any j≠i within radius has summary ≥ sᵢ;
    BTC.cpp:926-977) then top useful_corner_num by summary."""
    C = c.loc.shape[0]
    d2 = jnp.sum((c.loc[:, None, :] - c.loc[None, :, :]) ** 2, axis=-1)
    near = (d2 <= p.nms_radius**2) & c.valid[None, :] & c.valid[:, None]
    near = near & ~jnp.eye(C, dtype=bool)
    # ties break by index (the reference drops both tied corners,
    # BTC.cpp:965 — strictly worse; dense synthetic data ties often)
    idx = jnp.arange(C)
    stronger = (c.summary[None, :] > c.summary[:, None]) | (
        (c.summary[None, :] == c.summary[:, None]) & (idx[None, :] < idx[:, None])
    )
    beaten = jnp.any(near & stronger, axis=1)
    valid = c.valid & ~beaten
    score = jnp.where(valid, c.summary, -1.0)
    k = min(p.max_corners, C)
    idx = jax.lax.top_k(score, k)[1]
    sel = lambda a: a[idx]
    nvalid = valid[idx]
    # cap to useful_corner_num
    rank = jnp.cumsum(nvalid.astype(jnp.int32)) - 1
    nvalid = nvalid & (rank < p.useful_corner_num)
    return _Corners(sel(c.loc), sel(c.occ), sel(c.summary), nvalid)


# ------------------------------------------------------------- triangles

def _triangles(c: _Corners, p: BtcParams) -> BtcDescriptors:
    """K-NN triangles with sorted sides and vertex-consistent
    permutation (generate_std, BTC.cpp:979-1126).

    Vertex convention: sides (a ≤ b ≤ c); A is the vertex opposite
    side a (i.e. between sides b and c), etc. — matching the
    reference's l1/l2/l3 bookkeeping.
    """
    Cn = c.loc.shape[0]
    K = p.desc_near_num
    dtype = c.loc.dtype
    d2 = jnp.sum((c.loc[:, None, :] - c.loc[None, :, :]) ** 2, axis=-1)
    d2 = jnp.where(c.valid[None, :] & c.valid[:, None], d2, jnp.inf)
    d2 = jnp.where(jnp.eye(Cn, dtype=bool), 0.0, d2)
    _, nn = jax.lax.top_k(-d2, K)  # (Cn, K) nearest incl. self at 0

    # all (m, n) pairs with 1 <= m < n < K (host-side: K is static and
    # jnp.triu_indices traces under jit, breaking boolean indexing)
    import numpy as _np
    mi, ni = _np.triu_indices(K, k=1)
    pair_ok = mi >= 1
    mi = jnp.asarray(mi[pair_ok])
    ni = jnp.asarray(ni[pair_ok])
    P = mi.shape[0]  # K*(K-1)/2 - (K-1)

    i_idx = jnp.repeat(jnp.arange(Cn, dtype=jnp.int32), P)
    m_idx = nn[:, mi].reshape(-1)
    n_idx = nn[:, ni].reshape(-1)
    p1 = c.loc[i_idx]
    p2 = c.loc[m_idx]
    p3 = c.loc[n_idx]
    a = jnp.linalg.norm(p1 - p2, axis=-1)
    b = jnp.linalg.norm(p1 - p3, axis=-1)
    cc = jnp.linalg.norm(p3 - p2, axis=-1)
    ok = (
        c.valid[i_idx] & c.valid[m_idx] & c.valid[n_idx]
        & (i_idx != m_idx) & (i_idx != n_idx) & (m_idx != n_idx)
        & (a >= p.desc_min_len) & (a <= p.desc_max_len)
        & (b >= p.desc_min_len) & (b <= p.desc_max_len)
        & (cc >= p.desc_min_len) & (cc <= p.desc_max_len)
    )
    # sort sides ascending, tracking which vertex sits opposite which
    # side: a = |P1P2| (opposite P3), b = |P1P3| (opp P2), c = |P2P3|
    # (opp P1).
    sides = jnp.stack([a, b, cc], axis=-1)  # lengths
    opp = jnp.stack([n_idx, m_idx, i_idx], axis=-1)  # vertex idx opposite
    order = jnp.argsort(sides, axis=-1)
    sides_s = jnp.take_along_axis(sides, order, axis=-1)
    opp_s = jnp.take_along_axis(opp, order, axis=-1)
    ok = ok & (jnp.abs(sides_s[:, 2] - (sides_s[:, 0] + sides_s[:, 1])) >= 0.2)

    # descriptor vertices: A opposite shortest side, etc.
    # reference convention: A is shared by sides a&b, i.e. NOT opposite
    # a... (generate_std picks A as the vertex common to l1,l2 — the
    # two shortest sides). Common vertex of sides s0 and s1 is the one
    # opposite s2.
    vA = c.loc[opp_s[:, 2]]
    vB = c.loc[opp_s[:, 1]]
    vC = c.loc[opp_s[:, 0]]
    oA = c.occ[opp_s[:, 2]]
    oB = c.occ[opp_s[:, 1]]
    oC = c.occ[opp_s[:, 0]]
    sA = c.summary[opp_s[:, 2]]
    sB = c.summary[opp_s[:, 1]]
    sC = c.summary[opp_s[:, 0]]

    # dedup by 1 mm quantized sides (feat_map, BTC.cpp:1062-1066)
    q = jnp.round(sides_s * 1000.0).astype(jnp.int32)
    kk = (
        q[:, 0] * jnp.int32(73856093)
        ^ q[:, 1] * jnp.int32(19349663)
        ^ q[:, 2] * jnp.int32(83492791)
    )
    kk = jnp.where(ok, kk, jnp.int32(2**31 - 1))
    so = jnp.argsort(kk)
    kk_s = kk[so]
    first = jnp.concatenate([jnp.ones((1,), bool), kk_s[1:] != kk_s[:-1]])
    keep = first & ok[so]
    # compact to max_triangles
    (tidx,) = jnp.nonzero(keep, size=p.max_triangles, fill_value=kk.shape[0])
    tok = tidx < kk.shape[0]
    gi = so[jnp.clip(tidx, 0, kk.shape[0] - 1)]

    scale = 1.0 / p.side_resolution
    return BtcDescriptors(
        sides=jnp.where(tok[:, None], sides_s[gi] * scale, 0.0),
        verts=jnp.where(
            tok[:, None, None],
            jnp.stack([vA[gi], vB[gi], vC[gi]], axis=1), 0.0,
        ),
        occ=jnp.stack([oA[gi], oB[gi], oC[gi]], axis=1) & tok[:, None, None],
        summary=jnp.where(
            tok[:, None], jnp.stack([sA[gi], sB[gi], sC[gi]], axis=1), 0.0
        ),
        center=jnp.where(tok[:, None], (vA[gi] + vB[gi] + vC[gi]) / 3.0, 0.0),
        valid=tok,
    )


# ------------------------------------------------------------- full front

def extract(pts: jnp.ndarray, mask: jnp.ndarray, p: BtcParams):
    """Keyframe cloud -> (PlaneCloud, BtcDescriptors)
    (GenerateSTDescs, BTC.cpp:156-203)."""
    planes = extract_planes(pts, mask, p)
    pc, pn, pv = merge_planes(planes, p)
    pool = []
    for i in range(p.n_proj):
        pool.append(
            _extract_binary_one(pts, mask, pc[i], pn[i], pv[i], p)
        )
    corners = _Corners(
        loc=jnp.concatenate([x.loc for x in pool]),
        occ=jnp.concatenate([x.occ for x in pool]),
        summary=jnp.concatenate([x.summary for x in pool]),
        valid=jnp.concatenate([x.valid for x in pool]),
    )
    corners = _nms_and_topk(corners, p)
    desc = _triangles(corners, p)
    return planes, desc
