"""BALM2-style eigen-factor for sliding-window LiDAR BA.

TPU-native counterpart of the reference's `LidarFactor`
(voxel_map.hpp:109-290).  The BA cost over a window of W poses is

    L(x) = Σ_voxels coe · λ0( S_voxel(x) )

where S is the normalized covariance of the merged point cluster
(fixed history + per-pose body clusters transformed by the current
poses) — points enter only through their (P, v, N) moments (the BALM2
point-cluster trick, tools.hpp:304-365).

The reference's `acc_evaluate2` computes the analytic gradient and the
*exact* Hessian of λ0 (including the eigenvector-perturbation cross
terms 2/(λ0−λm) u_m u_mᵀ) per voxel with scalar loops over pose pairs
split across 5 CPU threads; here every quantity is batched over
(voxel, pose) and the pose-pair blocks reduce over voxels inside one
einsum, so the whole Hessian assembly is a handful of large
contractions on the MXU.

All translations are *voxel-center-relative* (t_i = p_i − c_voxel),
which leaves every formula unchanged (∂t/∂p = I) but keeps f32 exact
— see map/voxelmap.py.

Factor storage is a fixed-capacity compacted set harvested from the
map (`harvest`, replacing tras_opt voxel_map.hpp:1307-1333) with a
validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import cluster, so3
from ..core.cluster import Cluster
from ..map import voxelmap
from ..map.voxelmap import MapParams, ScanScratch, VoxelMap
from ..ops import eigh3


class LidarFactors(NamedTuple):
    """Compacted plane-voxel factor set; leading dim V (padded)."""

    valid: jnp.ndarray  # (V,)
    win_P: jnp.ndarray  # (V, W, 6) body-frame packed second moments
    win_v: jnp.ndarray  # (V, W, 3)
    win_n: jnp.ndarray  # (V, W)
    fix_P: jnp.ndarray  # (V, 6) fixed cluster (center-relative world)
    fix_v: jnp.ndarray  # (V, 3)
    fix_n: jnp.ndarray  # (V,)
    center: jnp.ndarray  # (V, 3) voxel centers (world)
    coe: jnp.ndarray  # (V,) per-voxel weight (reference: 1)
    slot: jnp.ndarray  # (V,) source map slot (diagnostics)


def harvest(
    vmap: VoxelMap, scratch, params: MapParams, max_voxels: int,
    col_perm: jnp.ndarray | None = None,
) -> LidarFactors:
    """Select BA plane voxels (reference tras_opt gates: leaf, plane,
    live window points, λ0/λ1 ≤ 0.12) into a fixed-size factor set.

    `scratch` is either a full ScanScratch (rebuild path) or just the
    (C,) per-slot window point count (incremental path — only add_n is
    consumed here).  `col_perm` (W,) maps logical window slot -> the
    map's physical ring column ((col0 + w) % W) so the factor columns
    come out in logical pose order regardless of the ring state."""
    add_n = scratch.add_n if isinstance(scratch, ScanScratch) else scratch
    from ..map.voxelmap import CL_N, CL_P, CL_V, MT_EIG, MT_VALID

    lam = vmap.meta[:, MT_EIG]
    ratio_ok = lam[:, 0] / jnp.maximum(lam[:, 1], 1e-12) <= 0.12
    cond = (
        (vmap.keys[:, 3] >= 0)
        & (vmap.state == 0)
        & (vmap.meta[:, MT_VALID] > 0.5)
        & (add_n > 0)
        & ratio_ok
    )
    C = vmap.keys.shape[0]
    (idx,) = jnp.nonzero(cond, size=max_voxels, fill_value=C)
    ok = idx < C
    s = jnp.clip(idx, 0, C - 1)

    dtype = vmap.win.dtype
    level = jnp.clip(vmap.keys[s, 3], 0)
    sizes = jnp.asarray(
        [params.level_size(l) for l in range(params.max_layer + 1)], dtype
    )
    center = (vmap.keys[s, :3].astype(dtype) + 0.5) * sizes[level][:, None]

    # ONE gather of the fused (W, 10) window rows + one of the fixed
    # rows (gather op count bounds the step; see map/voxelmap.py)
    wrow = vmap.win[s]  # (V, W, 10)
    frow = vmap.fix[s]  # (V, 10)
    if col_perm is not None:
        wrow = wrow[:, col_perm]
    wn = wrow[:, :, CL_N]
    # ring-lap staleness: a column with win_n == 0 may hold stale
    # cluster rows (clear_window_col invalidates only the count);
    # zero them here so every factor consumer sees clean moments
    has = (wn > 0) & ok[:, None]
    return LidarFactors(
        valid=ok,
        win_P=jnp.where(has[:, :, None], wrow[:, :, CL_P], 0.0),
        win_v=jnp.where(has[:, :, None], wrow[:, :, CL_V], 0.0),
        win_n=jnp.where(has, wn, 0.0),
        fix_P=jnp.where(ok[:, None], frow[:, CL_P], 0.0),
        fix_v=jnp.where(ok[:, None], frow[:, CL_V], 0.0),
        fix_n=jnp.where(ok, frow[:, CL_N], 0.0),
        center=center,
        coe=ok.astype(dtype),
        slot=jnp.where(ok, idx, -1),
    )


def sharded_eval(mesh):
    """shard_map'd factor evaluation over VOXELS for a multi-chip
    window BA — the SPMD form of the reference's fork-join Hessian
    pools (voxel_map.hpp:306-335, 465-523): each device evaluates the
    eigen-factor gradient/Hessian of its factor shard, and the scalar
    residual / (W,6) gradient / (W,W,6,6) Hessian reduce with psums
    over ICI.

    Returns (assemble_fn, resid_fn):
      assemble_fn(factors, R, p) -> (resid, grad, hess)
      resid_fn(factors, R, p) -> resid
    Both are jit-composable (usable inside `li_ba` under jit).  The
    factor dim V must be divisible by the mesh size.
    """
    import jax
    from jax.sharding import PartitionSpec as P

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # older jax
        from jax.experimental.shard_map import shard_map

    spec_f = LidarFactors(*([P("data")] * len(LidarFactors._fields)))

    def local_assemble(fact, R, p):
        rl, cache = evaluate_residual(fact, R, p)
        _, g6, H6 = evaluate_hess(fact, cache, R, p)
        return (
            jax.lax.psum(rl, "data"),
            jax.lax.psum(g6, "data"),
            jax.lax.psum(H6, "data"),
        )

    def local_resid(fact, R, p):
        rl, _ = evaluate_residual(fact, R, p)
        return jax.lax.psum(rl, "data")

    f_a = shard_map(local_assemble, mesh=mesh,
                    in_specs=(spec_f, P(), P()),
                    out_specs=(P(), P(), P()))
    f_r = shard_map(local_resid, mesh=mesh,
                    in_specs=(spec_f, P(), P()), out_specs=P())
    return f_a, f_r


class FactorCache(NamedTuple):
    """Per-voxel eigen decomposition cached by the residual pass and
    consumed by the Hessian pass (reference evaluate_only_residual
    caching, voxel_map.hpp:264-274)."""

    lmbd: jnp.ndarray  # (V, 3)
    U: jnp.ndarray  # (V, 3, 3)
    vbar: jnp.ndarray  # (V, 3) merged mean (center-relative)
    NN: jnp.ndarray  # (V,) merged count


# ---- lane algebra ---------------------------------------------------
# The factor math is evaluated on (V, W)-shaped LANES (nested lists of
# arrays) instead of (V, W, 3, 3) tensors: every op is elementwise on
# 80 KB lanes, so XLA fuses the whole chain into a few kernels.  The
# tensor form lowered to ~20 batched tiny-matmul kernels, each
# materializing (V, W, 3, 3) operands at 9-lane tile efficiency —
# measured 4.2 ms/scan of the fused step (round-3 forward bisect).

def _l_hat(v):
    z = jnp.zeros_like(v[0] + v[1])
    return [[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]]


def _l_mm(A, B):
    return [
        [sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def _l_mv(A, b):
    return [sum(A[i][k] * b[k] for k in range(3)) for i in range(3)]


def _l_cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def _l_dot(a, b):
    return sum(a[i] * b[i] for i in range(3))


_SYM6 = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
_SYM_AT = ((0, 1, 2), (1, 3, 4), (2, 4, 5))  # [i][j] -> packed index


def _lanes_R(R):
    """(W, 3, 3) -> lanes broadcasting against (V, W)."""
    return [[R[:, i, j] for j in range(3)] for i in range(3)]


def _lanes_sym(Ppacked):
    """(..., 6) packed -> 3x3 lanes."""
    return [[Ppacked[..., _SYM_AT[i][j]] for j in range(3)]
            for i in range(3)]


def _merged(factors: LidarFactors, R: jnp.ndarray, p: jnp.ndarray):
    """Merged world cluster per voxel under poses (R (W,3,3), p (W,3)).

    t_i = p_i − c_voxel per (voxel, pose).  Returns Cluster batched (V,).
    Lane-evaluated: P' = R P Rᵀ + (Rv) tᵀ + t (Rv)ᵀ + n t tᵀ summed
    over window slots (tools.hpp:357-363), all on (V, W) lanes.
    """
    Rl = _lanes_R(R)
    Pl = _lanes_sym(factors.win_P)
    vi = [factors.win_v[..., i] for i in range(3)]
    ni = factors.win_n
    t = [p[None, :, i] - factors.center[:, i : i + 1] for i in range(3)]

    Rv = _l_mv(Rl, vi)
    RP = _l_mm(Rl, Pl)
    # packed upper triangle of the per-(v,w) world P, summed over w
    P = []
    for (i, j) in _SYM6:
        RPRt_ij = sum(RP[i][k] * Rl[j][k] for k in range(3))
        full = RPRt_ij + Rv[i] * t[j] + t[i] * Rv[j] + ni * t[i] * t[j]
        P.append(jnp.sum(full, axis=1))
    v = [jnp.sum(Rv[i] + ni * t[i], axis=1) for i in range(3)]
    P = jnp.stack(P, axis=-1) + factors.fix_P
    v = jnp.stack(v, axis=-1) + factors.fix_v
    n = factors.fix_n + jnp.sum(ni, axis=1)
    return Cluster(P, v, n)


def evaluate_residual(
    factors: LidarFactors, R: jnp.ndarray, p: jnp.ndarray
) -> tuple[jnp.ndarray, FactorCache]:
    """Σ coe·λ0 over valid voxels + the eigen cache
    (reference evaluate_only_residual, voxel_map.hpp:243-279)."""
    c = _merged(factors, R, p)
    S = cluster.cov(c)
    lmbd, U = eigh3.eigh3(S)
    resid = jnp.sum(factors.coe * lmbd[:, 0] * factors.valid)
    cache = FactorCache(
        lmbd=lmbd, U=U, vbar=cluster.mean(c), NN=jnp.maximum(c.n, 1.0)
    )
    return resid, cache


def evaluate_hess(
    factors: LidarFactors,
    cache: FactorCache,
    R: jnp.ndarray,  # (W, 3, 3)
    p: jnp.ndarray,  # (W, 3)
):
    """Analytic gradient (W, 6) and exact Hessian (W, W, 6, 6) of
    Σ coe·λ0, batched over voxels (reference acc_evaluate2,
    voxel_map.hpp:132-241).

    Derivation sketch: with u ≡ u0 the λ0 eigenvector,
      dλ0 = uᵀ dS u  and
      d²λ0 = uᵀ d²S u + 2 Σ_{m≠0} (uᵀ dS u_m)(u_mᵀ dS u)/(λ0−λ_m).
    A_i ≡ ∂(S u)/∂ξ_i (3×6 per pose) carries the first-order term;
    the remaining curvature corrections are the explicit d²S blocks.
    """
    dtype = factors.win_P.dtype
    W = R.shape[0]
    V = factors.valid.shape[0]

    lam = cache.lmbd
    coe = factors.coe * factors.valid  # (V,)
    coe1 = coe[:, None]  # broadcast against (V, W) lanes
    NN1 = cache.NN[:, None]
    inv_nn = 1.0 / NN1
    inv_nn2 = inv_nn * inv_nn
    u = [cache.U[:, i, 0][:, None] for i in range(3)]  # (V, 1) lanes
    vbar = [cache.vbar[:, i][:, None] for i in range(3)]

    # umumT = Σ_{m≠0} 2/(λ0−λm) u_m u_mᵀ   as (V, 1) lanes
    M = [[jnp.zeros((V, 1), dtype)] * 3 for _ in range(3)]
    for m in (1, 2):
        um = [cache.U[:, i, m][:, None] for i in range(3)]
        gap = (lam[:, 0] - lam[:, m])[:, None]
        cf = 2.0 / jnp.where(jnp.abs(gap) > 1e-9, gap, -1e-9)
        M = [
            [M[i][j] + cf * um[i] * um[j] for j in range(3)]
            for i in range(3)
        ]

    Rl = _lanes_R(R)
    Pi = _lanes_sym(factors.win_P)
    vi = [factors.win_v[..., i] for i in range(3)]
    ni = factors.win_n  # (V, W)
    t = [p[None, :, i] - factors.center[:, i : i + 1] for i in range(3)]

    RiTu = [sum(Rl[j][i] * u[j] for j in range(3)) for i in range(3)]
    viRiTu = _l_cross(vi, RiTu)
    PiRiTu = _l_mv(Pi, RiTu)
    ti_v = [t[i] - vbar[i] for i in range(3)]
    uTtv = _l_dot(u, ti_v)
    hat_vi = _l_hat(vi)
    combo1 = _l_hat(PiRiTu)
    combo1 = [
        [combo1[i][j] + hat_vi[i][j] * uTtv for j in range(3)]
        for i in range(3)
    ]
    Rvi = _l_mv(Rl, vi)
    combo2 = [Rvi[i] + ni * ti_v[i] for i in range(3)]
    RiTu_hat = _l_hat(RiTu)

    # A_i as 3x6 lanes: [left | right]/NN.  Rows of empty window slots
    # are structurally zero (every term carries a P_i, v_i or n_i
    # factor), so no `has` masking is needed.
    RP = _l_mm(Rl, Pi)
    B1 = [[RP[i][j] + ti_v[i] * vi[j] for j in range(3)] for i in range(3)]
    left = _l_mm(B1, RiTu_hat)
    Rc1 = _l_mm(Rl, combo1)
    left = [[left[i][j] - Rc1[i][j] for j in range(3)] for i in range(3)]
    c2u = _l_dot(combo2, u)
    A = [[None] * 6 for _ in range(3)]
    for i in range(3):
        for j in range(3):
            A[i][j] = left[i][j] * inv_nn
            r = combo2[i] * u[j]
            if i == j:
                r = r + c2u
            A[i][3 + j] = r * inv_nn

    # gradient lanes: jjt_a = Σ_i A[i][a]·u_i
    jjt = [sum(A[i][a] * u[i] for i in range(3)) for a in range(6)]

    # eigen-gap pair blocks: H[w,x,u,y] = Σ_{v,j} (coe·MᵀA)[j][x] A[j][y]
    BA = [
        [sum(M[j][i] * A[i][a] for i in range(3)) for a in range(6)]
        for j in range(3)
    ]
    XA = jnp.stack(
        [jnp.stack([A[i][a] for a in range(6)], -1) for i in range(3)], -2
    )  # (V, W, 3, 6)
    XB = jnp.stack(
        [jnp.stack([coe1 * BA[i][a] for a in range(6)], -1)
         for i in range(3)], -2
    )
    H = jnp.einsum("vwja,vujb->wuab", XB, XA)

    # off-diagonal d²S mean-coupling terms: all four blocks are the
    # rank-1 cross products of G = [hat(v)Rᵀu ; n·u] with −2coe/NN²
    G = jnp.stack(
        viRiTu + [ni * u[i] for i in range(3)], axis=-1
    )  # (V, W, 6)
    Gc = G * (-2.0 * coe1 * inv_nn2)[..., None]
    off = jnp.einsum("vwx,vuy->wuxy", Gc, G)
    eyeW = jnp.eye(W, dtype=dtype)
    H = H + off * (1.0 - eyeW)[:, :, None, None]

    # diagonal d²S corrections, reduced over voxels via one stacked
    # (V, W, 33) sum: [6 grad lanes | 9 rot | 9 hrt | 9 tt]
    M1 = _l_mm(
        [[combo1[i][j] - sum(RiTu_hat[i][k] * Pi[k][j] for k in range(3))
          for j in range(3)] for i in range(3)],
        RiTu_hat,
    )
    w1 = 2.0 * coe1 * inv_nn
    w2 = 2.0 * coe1 * inv_nn2
    cvw = 2.0 * inv_nn * (1.0 - ni * inv_nn)
    cn2 = 2.0 * inv_nn * (ni - ni * ni * inv_nn)
    lanes = [coe1 * jjt[a] for a in range(6)]
    for i in range(3):
        for j in range(3):
            lanes.append(w1 * M1[i][j] - w2 * viRiTu[i] * viRiTu[j])
    for i in range(3):
        for j in range(3):
            lanes.append(coe1 * cvw * viRiTu[i] * u[j])
    for i in range(3):
        for j in range(3):
            lanes.append(coe1 * cn2 * u[i] * u[j])
    red = jnp.einsum("vwx->wx", jnp.stack(lanes, axis=-1))  # (W, 33)
    grad = red[:, 0:6]
    rot_c = red[:, 6:15].reshape(W, 3, 3)
    # −0.5·hat(Σ coe·jjt_rot): hat is linear, so apply to the reduced
    # gradient rotation part
    rot_c = rot_c - 0.5 * so3.hat(grad[:, 0:3])
    hrt_c = red[:, 15:24].reshape(W, 3, 3)
    tt_c = red[:, 24:33].reshape(W, 3, 3)
    Hd = jnp.zeros((W, 6, 6), dtype)
    Hd = Hd.at[:, 0:3, 0:3].set(rot_c)
    Hd = Hd.at[:, 0:3, 3:6].set(hrt_c)
    Hd = Hd.at[:, 3:6, 0:3].set(jnp.swapaxes(hrt_c, -1, -2))
    Hd = Hd.at[:, 3:6, 3:6].set(tt_c)
    idxW = jnp.arange(W)
    H = H.at[idxW, idxW].add(Hd)

    resid = jnp.sum(coe * lam[:, 0])
    return resid, grad, H
