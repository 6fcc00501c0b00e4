"""Point-to-plane ICP verifier for loop candidates.

Counterpart of the reference's `icp_normal` (loop_refine.hpp:47-145):
aligns the source keyframe's plane cells (points + normals) to the
target's, with normal-compatibility and distance gates, a two-stage
coarse→fine schedule, and acceptance iff the Gauss-Newton normal
matrix Σ n nᵀ is well conditioned (min eig > icp_eigval) after
convergence.

The kdtree 1-NN becomes a brute-force masked distance matrix — plane
cells per keyframe number only a few thousand, so (Q, M) distances
are a trivial MXU matmul and stay entirely on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import so3
from ..ops import eigh3, lanes


class IcpResult(NamedTuple):
    R: jnp.ndarray  # (3, 3) refined rotation (applied as p' = R p + t)
    t: jnp.ndarray  # (3,)
    accepted: jnp.ndarray  # () bool
    converged: jnp.ndarray  # () bool
    min_eig: jnp.ndarray  # () min eigenvalue of Σ n nᵀ
    match_count: jnp.ndarray
    # (6,) diagonal of the final Gauss-Newton Hessian Σ J Jᵀ
    # ([rot, tra] blocks) — the loop edge's information content.  The
    # reference derives the PGO edge noise from exactly this
    # (voxelslam.cpp:1761-1765: v6 = 1/|diag(H)|); a constant noise
    # would weigh a marginal accept the same as a bombproof one.
    hdiag: jnp.ndarray = None


def icp_plane(
    src_pts: jnp.ndarray,  # (Q, 3) source plane-cell centers
    src_nrm: jnp.ndarray,  # (Q, 3) source normals
    src_mask: jnp.ndarray,  # (Q,)
    tar_pts: jnp.ndarray,  # (M, 3)
    tar_nrm: jnp.ndarray,  # (M, 3)
    tar_mask: jnp.ndarray,  # (M,)
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    icp_eigval: float = 10.0,
    # 20 left true revisit candidates unconverged (coarse stage eats
    # most of the budget when the BTC initial guess is ~1-2 m off);
    # the program runs once per keyframe, so 2x iterations are cheap
    max_iter: int = 40,
    min_match_frac: float = 0.0,
    early_exit: bool = True,
    valid=None,  # () bool: False = placeholder candidate, do no work
) -> IcpResult:
    dtype = src_pts.dtype
    coarse = jnp.asarray([0.2, 0.2, 0.5, 3.0], dtype)
    fine = jnp.asarray([0.1, 0.1, 0.1, 1.0], dtype)

    # squared distances to invalid targets become +inf
    tar_big = jnp.where(tar_mask[:, None], tar_pts, 1e9)

    def body(it, carry):
        R, t, stage, converged, nnt, cnt, _ = carry
        paras = jnp.where(stage > 0, fine, coarse)
        pw = src_pts @ R.T + t  # (Q, 3)
        nw = src_nrm @ R.T
        # brute-force nearest neighbor (Q, M)
        d2 = (
            jnp.sum(pw * pw, axis=1)[:, None]
            - 2.0 * pw @ tar_big.T
            + jnp.sum(tar_big * tar_big, axis=1)[None, :]
        )
        nn = jnp.argmin(d2, axis=1)
        tp = tar_pts[nn]
        tn = tar_nrm[nn]
        dvec = pw - tp
        p2p = jnp.linalg.norm(dvec, axis=1)
        p2pl = jnp.abs(jnp.sum(tn * dvec, axis=1))
        n_inc = jnp.linalg.norm(nw - tn, axis=1)
        n_add = jnp.linalg.norm(nw + tn, axis=1)
        ok = (
            src_mask
            & ((n_inc < paras[0]) | (n_add < paras[1]))
            & (p2pl < paras[2])
            & (p2p < paras[3])
        )
        rr = jnp.sum(tn * dvec, axis=1)
        # [p × (Rᵀn)] via lane cross, not a (Q,3,3)@(Q,3) batched
        # matvec chain (ops/lanes.py rationale)
        nl = lanes.from_vec(tn)
        q = [sum(R[k, i] * nl[k] for k in range(3)) for i in range(3)]
        jrot = lanes.to_vec(lanes.cross(lanes.from_vec(src_pts), q))
        jac = jnp.concatenate([jrot, tn], axis=1)  # (Q, 6)
        okf = ok.astype(dtype)
        H = jnp.einsum("q,qa,qb->ab", okf, jac, jac)
        g = jnp.einsum("q,qa,q->a", okf, jac, rr)
        nnt_new = jnp.einsum("q,qa,qb->ab", okf, tn, tn)
        dxi = jnp.linalg.solve(H + jnp.eye(6, dtype=dtype) * 1e-9, -g)
        R_new = R @ so3.exp(dxi[0:3])
        t_new = t + dxi[3:6]
        small = (jnp.linalg.norm(dxi[0:3]) < 1e-3) & (
            jnp.linalg.norm(dxi[3:6]) < 1e-3
        )
        # stage switch: first convergence tightens gates (127-129);
        # second convergence marks done
        converged = converged | (small & (stage > 0))
        stage = jnp.where(small, jnp.int32(1), stage)
        return (R_new, t_new, stage, converged, nnt_new, jnp.sum(ok),
                jnp.diagonal(H))

    # an invalid (placeholder) candidate starts out "converged": under
    # the keyframe program's vmap the while predicate is OR'd across
    # lanes, so a keyframe whose database search returned NO candidate
    # above threshold (the common case in steady state) runs ZERO
    # (Q, M)-NN iterations instead of 20 lanes x max_iter against a
    # garbage target that never converges
    conv0 = jnp.asarray(False) if valid is None else ~valid
    init = (
        R0, t0, jnp.int32(0), conv0,
        jnp.zeros((3, 3), dtype), jnp.zeros((), jnp.int32),
        jnp.zeros((6,), dtype),
    )
    if early_exit:
        # while_loop instead of a fixed fori: iterations stop at
        # convergence.  Under the keyframe program's vmap over
        # candidates, JAX's while batching ORs the predicates and
        # select-freezes finished lanes — the batch runs to the
        # SLOWEST candidate's convergence instead of always paying
        # max_iter (Q, M) NN matmuls per candidate.  NOT bit-exact vs
        # early_exit=False: the fori variant keeps refining R/t past
        # convergence while this stops at the first converged
        # iteration — approximately equal only (post-convergence
        # updates are below the 1e-3 convergence threshold).

        def w_cond(c):
            return (c[0] < max_iter) & ~c[4]

        def w_body(c):
            return (c[0] + 1,) + body(c[0], c[1:])

        out = jax.lax.while_loop(w_cond, w_body, (jnp.int32(0),) + init)
        R, t, stage, converged, nnt, cnt, hdiag = out[1:]
    else:
        R, t, stage, converged, nnt, cnt, hdiag = jax.lax.fori_loop(
            0, max_iter, body, init
        )
    ev = eigh3.eigvals3(nnt)
    accepted = (ev[0] > icp_eigval) & converged
    if valid is not None:
        accepted = accepted & valid
    if min_match_frac > 0.0:
        # overlap gate: an ALIASED match (e.g. the two ends of a
        # corridor — same wall/door constellation) can be
        # well-conditioned AND converged, but only the shared
        # constellation fits; the query's remaining cells (the room
        # behind the door) find no counterpart.  Require a minimum
        # fraction of valid query cells to be fine-stage inliers.
        n_src = jnp.maximum(jnp.sum(src_mask), 1)
        accepted = accepted & (
            cnt >= min_match_frac * n_src.astype(dtype)
        )
    return IcpResult(R, t, accepted, converged, ev[0], cnt, hdiag)
