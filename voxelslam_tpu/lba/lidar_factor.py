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


def _merged(factors: LidarFactors, R: jnp.ndarray, p: jnp.ndarray):
    """Merged world cluster per voxel under poses (R (W,3,3), p (W,3)).

    t_i = p_i − c_voxel per (voxel, pose).  Returns Cluster batched (V,).
    """
    t = p[None, :, :] - factors.center[:, None, :]  # (V, W, 3)
    win = Cluster(factors.win_P, factors.win_v, factors.win_n)
    wld = cluster.transform(win, R[None], t)  # (V, W, ...)
    P = factors.fix_P + jnp.sum(wld.P, axis=1)
    v = factors.fix_v + jnp.sum(wld.v, axis=1)
    n = factors.fix_n + jnp.sum(wld.n, axis=1)
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

    u = cache.U[:, :, 0]  # (V, 3)
    lam = cache.lmbd
    NN = cache.NN  # (V,)
    vbar = cache.vbar
    coe = factors.coe * factors.valid  # (V,)

    # umumT = Σ_{m≠0} 2/(λ0−λm) u_m u_mᵀ   (V, 3, 3)
    umumT = jnp.zeros((V, 3, 3), dtype)
    for m in (1, 2):
        um = cache.U[:, :, m]
        gap = lam[:, 0] - lam[:, m]
        coef = 2.0 / jnp.where(jnp.abs(gap) > 1e-9, gap, -1e-9)
        umumT = umumT + coef[:, None, None] * (
            um[:, :, None] * um[:, None, :]
        )

    Pi = cluster.unpack_sym(factors.win_P)  # (V, W, 3, 3)
    vi = factors.win_v  # (V, W, 3)
    ni = factors.win_n  # (V, W)
    has = ni > 0  # (V, W)
    t = p[None, :, :] - factors.center[:, None, :]  # (V, W, 3)

    RiTu = jnp.einsum("wji,vj->vwi", R, u)  # Rᵀ u  (V, W, 3)
    viRiTu = jnp.cross(vi, RiTu)  # hat(v_i) Rᵀu
    PiRiTu = jnp.einsum("vwij,vwj->vwi", Pi, RiTu)
    ti_v = t - vbar[:, None, :]  # (V, W, 3)
    uTtv = jnp.einsum("vi,vwi->vw", u, ti_v)
    combo1 = so3.hat(PiRiTu) + so3.hat(vi) * uTtv[..., None, None]
    combo2 = jnp.einsum("wij,vwj->vwi", R, vi) + ni[..., None] * ti_v
    RiTu_hat = so3.hat(RiTu)

    # A_i (V, W, 3, 6).  Rows of empty window slots are structurally
    # zero (every term carries a P_i, v_i or n_i factor), so no `has`
    # masking is needed.
    RP = jnp.einsum("wij,vwjk->vwik", R, Pi)
    left = (
        (RP + ti_v[..., :, None] * vi[..., None, :]) @ RiTu_hat
        - jnp.einsum("wij,vwjk->vwik", R, combo1)
    )
    right = combo2[..., :, None] * u[:, None, None, :] + jnp.einsum(
        "vwi,vi->vw", combo2, u
    )[..., None, None] * jnp.eye(3, dtype=dtype)
    Auk = jnp.concatenate([left, right], axis=-1) / NN[:, None, None, None]

    # gradient: jjt_i = A_iᵀ u  (V, W, 6); reduce over voxels
    jjt = jnp.einsum("vwia,vi->vwa", Auk, u)
    grad = jnp.einsum("v,vwa->wa", coe, jjt)

    # ---- Hessian ----
    # cross-voxel-reduced pair blocks from the eigen-gap term:
    #   H[w,u] += Σ_v coe_v A_wᵀ umumT A_u
    H = jnp.einsum("v,vwia,vij,vujb->wuab", coe, Auk, umumT, Auk)

    inv_nn = 1.0 / NN  # (V,)
    inv_nn2 = inv_nn * inv_nn

    # diagonal d²S corrections (reference Hb diagonal add-ons),
    # reduced over voxels IMMEDIATELY into (W, 3, 3) blocks — never
    # materializing (V, W, 6, 6) block tensors (HBM traffic at tiny
    # minor dims was the dominant cost of this function on TPU).
    # Empty-slot rows are structurally zero, same as A_i.
    M1 = (combo1 - RiTu_hat @ Pi) @ RiTu_hat
    w1 = 2.0 * coe * inv_nn
    w2 = 2.0 * coe * inv_nn2
    rot_c = (
        jnp.einsum("v,vwij->wij", w1, M1)
        - jnp.einsum("v,vwi,vwj->wij", w2, viRiTu, viRiTu)
        - 0.5 * so3.hat(grad[:, 0:3])  # hat is linear: Σ coe·hat(jjt)
    )
    cvw = 2.0 * inv_nn[:, None] * (1.0 - ni * inv_nn[:, None])  # (V, W)
    hrt_c = jnp.einsum("v,vw,vwi,vj->wij", coe, cvw, viRiTu, u)
    c2 = 2.0 * inv_nn[:, None] * (ni - ni * ni * inv_nn[:, None])
    tt_c = jnp.einsum("v,vw,vi,vj->wij", coe, c2, u, u)
    Hd = jnp.zeros((W, 6, 6), dtype)
    Hd = Hd.at[:, 0:3, 0:3].set(rot_c)
    Hd = Hd.at[:, 0:3, 3:6].set(hrt_c)
    Hd = Hd.at[:, 3:6, 0:3].set(jnp.swapaxes(hrt_c, -1, -2))
    Hd = Hd.at[:, 3:6, 3:6].set(tt_c)
    idxW = jnp.arange(W)
    H = H.at[idxW, idxW].add(Hd)

    # off-diagonal d²S corrections (i≠j): the mean-coupling terms
    #   rr: −2/NN² (hat(v_i)Rᵀu)(hat(v_j)Rᵀu)ᵀ
    #   rt: −2 n_j/NN² (hat(v_i)Rᵀu) uᵀ   /  tr: transpose
    #   tt: −2 n_i n_j/NN² u uᵀ
    m_rr = jnp.einsum("v,vwi,vuj->wuij", -2.0 * coe * inv_nn2, viRiTu, viRiTu)
    m_rt = jnp.einsum(
        "v,vwi,vu,vj->wuij", -2.0 * coe * inv_nn2, viRiTu, ni, u
    )
    m_tt = jnp.einsum(
        "v,vw,vu,vi,vj->wuij", -2.0 * coe * inv_nn2, ni, ni, u, u
    )
    off = jnp.zeros((W, W, 6, 6), dtype)
    off = off.at[..., 0:3, 0:3].set(m_rr)
    off = off.at[..., 0:3, 3:6].set(m_rt)
    off = off.at[..., 3:6, 0:3].set(jnp.swapaxes(m_rt, 0, 1).transpose(0, 1, 3, 2))
    off = off.at[..., 3:6, 3:6].set(m_tt)
    # zero the diagonal pose blocks of `off` (handled by `diag` above)
    eyeW = jnp.eye(W, dtype=dtype)
    off = off * (1.0 - eyeW)[:, :, None, None]
    H = H + off

    resid = jnp.sum(coe * lam[:, 0])
    return resid, grad, H
