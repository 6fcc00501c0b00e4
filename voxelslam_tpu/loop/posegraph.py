"""SE(3) pose-graph optimization on device.

Replaces the reference's GTSAM/ISAM2 episodic solves
(voxelslam.cpp:2090-2098, 2231-2317) with batch Gauss–Newton whose
normal equations are solved matrix-free by preconditioned conjugate
gradients: per-edge residual/Jacobian evaluation is vmapped, Hv
products are gather→6x6 block ops→scatter-add over edges, and the
block-Jacobi preconditioner inverts one 6×6 per pose.  This scales to
tens of thousands of poses on TPU where a dense (6N)² factorization
would not, and — unlike incremental ISAM2 — fits the episodic solve
pattern the system actually uses (solves happen only on loop events
and at finish).

Edges are between-factors Tᵢⱼ with 6-dim diagonal noise (rotation,
translation — matching the reference's hessian-derived `v6`,
voxelslam.cpp:1761-1765), residual

    r = [ Log(R̄ᵢⱼᵀ Rᵢᵀ Rⱼ) ;  Rᵢᵀ(pⱼ − pᵢ) − t̄ᵢⱼ ]

with the gauge fixed by an anchor prior on pose 0 of the root session
(voxelslam.cpp:1770-1784).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import so3


class PoseGraph(NamedTuple):
    """Padded edge set over N poses (leading dims static)."""

    # poses (initial values)
    R: jnp.ndarray  # (N, 3, 3)
    p: jnp.ndarray  # (N, 3)
    pose_valid: jnp.ndarray  # (N,)
    # edges
    ei: jnp.ndarray  # (E,) int32 from-pose
    ej: jnp.ndarray  # (E,) int32 to-pose
    Rm: jnp.ndarray  # (E, 3, 3) measured relative rotation
    tm: jnp.ndarray  # (E, 3) measured relative translation
    w: jnp.ndarray  # (E, 6) information diag (1/variance)
    edge_valid: jnp.ndarray  # (E,)
    # (N,) bool anchored-pose mask.  One anchor per connected component:
    # before the first cross-session link, a second session's chain is
    # otherwise gauge-free (the reference only merges sessions into one
    # graph once they connect, voxelslam.cpp:1741-1802, with a prior on
    # the root session's first pose).
    anchor: jnp.ndarray


def _edge_residual(R, p, g: PoseGraph):
    Ri = R[g.ei]
    Rj = R[g.ej]
    pi = p[g.ei]
    pj = p[g.ej]
    RiT = jnp.swapaxes(Ri, -1, -2)
    r_rot = so3.log(jnp.swapaxes(g.Rm, -1, -2) @ RiT @ Rj)
    r_tra = jnp.einsum("eij,ej->ei", RiT, pj - pi) - g.tm
    return jnp.concatenate([r_rot, r_tra], axis=-1)  # (E, 6)


def _edge_jacobians(R, p, g: PoseGraph):
    """J wrt [dθi, dpi] and [dθj, dpj] with boxplus R·exp(dθ), p+dp.

    First-order (Gauss-Newton) blocks:
      ∂r_rot/∂θi = −Jr⁻¹(r_rot) Rjᵀ Ri ;  ∂r_rot/∂θj = Jr⁻¹(r_rot)
      ∂r_tra/∂θi = hat(Rᵢᵀ(pj − pi)) ;    ∂r_tra/∂pi = −Rᵢᵀ
      ∂r_tra/∂pj = Rᵢᵀ
    """
    E = g.ei.shape[0]
    dtype = p.dtype
    Ri = R[g.ei]
    Rj = R[g.ej]
    pi = p[g.ei]
    pj = p[g.ej]
    RiT = jnp.swapaxes(Ri, -1, -2)
    r_rot = so3.log(jnp.swapaxes(g.Rm, -1, -2) @ RiT @ Rj)
    Jri = so3.jr_inv(r_rot)
    rel = jnp.einsum("eij,ej->ei", RiT, pj - pi)

    Ji = jnp.zeros((E, 6, 6), dtype)
    Jj = jnp.zeros((E, 6, 6), dtype)
    Ji = Ji.at[:, 0:3, 0:3].set(-Jri @ jnp.swapaxes(Rj, -1, -2) @ Ri)
    Jj = Jj.at[:, 0:3, 0:3].set(Jri)
    Ji = Ji.at[:, 3:6, 0:3].set(so3.hat(rel))
    Ji = Ji.at[:, 3:6, 3:6].set(-RiT)
    Jj = Jj.at[:, 3:6, 3:6].set(RiT)
    return Ji, Jj


def _hv_product(v, Ji, Jj, g: PoseGraph, n_poses, anchor_w):
    """H v for H = Σ_e [Ji;Jj]ᵀ W [Ji;Jj] + anchor, matrix-free."""
    vi = v[g.ei]  # (E, 6)
    vj = v[g.ej]
    Jv = jnp.einsum("eab,eb->ea", Ji, vi) + jnp.einsum("eab,eb->ea", Jj, vj)
    Jv = Jv * g.w * g.edge_valid[:, None]
    out = jnp.zeros((n_poses, 6), v.dtype)
    out = out.at[g.ei].add(jnp.einsum("eab,ea->eb", Ji, Jv))
    out = out.at[g.ej].add(jnp.einsum("eab,ea->eb", Jj, Jv))
    out = out + anchor_w * v * g.anchor.astype(v.dtype)[:, None]
    return out


def _block_jacobi(Ji, Jj, g: PoseGraph, n_poses, anchor_w, dtype):
    """Per-pose 6x6 diagonal blocks of H, inverted for preconditioning."""
    Wi = Ji * (g.w * g.edge_valid[:, None])[:, :, None]
    Wj = Jj * (g.w * g.edge_valid[:, None])[:, :, None]
    Bi = jnp.einsum("eab,eac->ebc", Ji, Wi)
    Bj = jnp.einsum("eab,eac->ebc", Jj, Wj)
    blocks = jnp.zeros((n_poses, 6, 6), dtype)
    blocks = blocks.at[g.ei].add(Bi)
    blocks = blocks.at[g.ej].add(Bj)
    blocks = blocks + (
        anchor_w * g.anchor.astype(dtype)[:, None, None]
        * jnp.eye(6, dtype=dtype)
    )
    # regularize empty poses
    blocks = blocks + jnp.eye(6, dtype=dtype) * 1e-6
    return jnp.linalg.inv(blocks)


@partial(
    jax.jit,
    static_argnames=("n_iters", "cg_iters", "anchor_weight", "damping"),
)
def optimize(
    g: PoseGraph,
    n_iters: int = 8,
    cg_iters: int = 50,
    anchor_weight: float = 1e6,
    damping: float = 1e-6,
):
    """Gauss–Newton with PCG inner solves.

    Returns (R, p, final χ², initial χ²) — the initial value makes
    solver effectiveness observable at the call site (GBA-effect
    telemetry: a finish solve whose χ² barely drops either converged
    already or failed to move; the two need different responses)."""
    n_poses = g.R.shape[0]
    dtype = g.p.dtype

    def chi2(R, p):
        r = _edge_residual(R, p, g)
        return jnp.sum(r * r * g.w * g.edge_valid[:, None])

    def gn_iter(_, carry):
        R, p = carry
        r = _edge_residual(R, p, g)
        Ji, Jj = _edge_jacobians(R, p, g)
        # gradient g = Jᵀ W r
        Wr = r * g.w * g.edge_valid[:, None]
        grad = jnp.zeros((n_poses, 6), dtype)
        grad = grad.at[g.ei].add(jnp.einsum("eab,ea->eb", Ji, Wr))
        grad = grad.at[g.ej].add(jnp.einsum("eab,ea->eb", Jj, Wr))
        Minv = _block_jacobi(Ji, Jj, g, n_poses, anchor_weight, dtype)

        def hv(v):
            return _hv_product(v, Ji, Jj, g, n_poses, anchor_weight) + damping * v

        # PCG solve H dx = -grad
        b = -grad

        def cg_body(_, cg):
            x, rr, z, pdir, rz = cg
            Hp = hv(pdir)
            alpha = rz / jnp.maximum(jnp.sum(pdir * Hp), 1e-30)
            x = x + alpha * pdir
            rr = rr - alpha * Hp
            z = jnp.einsum("nab,nb->na", Minv, rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            pdir = z + beta * pdir
            return x, rr, z, pdir, rz_new

        x0 = jnp.zeros((n_poses, 6), dtype)
        z0 = jnp.einsum("nab,nb->na", Minv, b)
        cg0 = (x0, b, z0, z0, jnp.sum(b * z0))
        dx, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, cg0)

        dx = dx * g.pose_valid[:, None]
        R_new = R @ so3.exp(dx[:, 0:3])
        p_new = p + dx[:, 3:6]
        # accept only if χ² decreased (simple safeguard)
        better = chi2(R_new, p_new) < chi2(R, p)
        R = jnp.where(better, R_new, R)
        p = jnp.where(better, p_new, p)
        return R, p

    R, p = jax.lax.fori_loop(0, n_iters, gn_iter, (g.R, g.p))
    return R, p, chi2(R, p), chi2(g.R, g.p)
