"""Iterated ESIKF point-to-plane measurement update.

TPU-native counterpart of the reference's `lio_state_estimation`
(voxelslam.cpp:856-958): the per-point octree descent + 6x6 normal
equation accumulation becomes one vectorized voxel-map match plus a
masked reduction, and the iterated Kalman step

    K₁ = (HᵀR⁻¹H + P⁻¹)⁻¹
    δ  = K₁ HᵀR⁻¹z + (x_prop ⊟ x) − K₁ HᵀR⁻¹H (x_prop ⊟ x)[0:6]

runs a fixed number of iterations inside `lax.fori_loop` (the
reference's early-exit saves CPU only; on TPU the fixed loop is
cheaper than dynamic control flow).

Degeneracy detection follows voxelslam.cpp:950-957: the smallest
eigenvalue of Σ n nᵀ over matched plane normals below 14 marks a
degenerate scan (the odometry layer counts these toward a session
reset, SURVEY.md §5 failure detection).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import so3, state
from ..core.state import DIM, NavState
from ..map import voxelmap
from ..map.voxelmap import MapParams, VoxelMap
from ..ops import eigh3, lanes


class EsikfResult(NamedTuple):
    x: NavState
    degenerate: jnp.ndarray  # () bool
    match_count: jnp.ndarray  # () int32
    nnt_min_eig: jnp.ndarray  # ()


def update(
    x_prop: NavState,
    vmap: VoxelMap,
    pts_b: jnp.ndarray,  # (N, 3) body-frame (IMU) points
    var_b: jnp.ndarray,  # (N, 3, 3) body-frame covariances
    mask: jnp.ndarray,  # (N,)
    params: MapParams,
    num_iter: int = 4,
    meas_floor: float = 0.0005,
    degen_thresh: float = 14.0,
    num_match: int = 2,
) -> EsikfResult:
    """`num_iter` Kalman iterations grouped into `num_match` rounds:
    each round runs ONE full map association (the expensive multi-level
    hash probe) and num_iter/num_match Kalman steps against the frozen
    association (plane normal + world center + sigma) — the
    reference's ≤4-iteration / ≤2-rematch schedule with its cached
    per-point OctoTree* fast path (voxelslam.cpp:892-899)."""
    dtype = pts_b.dtype
    ph = so3.hat(pts_b)  # (N, 3, 3)
    n_rounds = max(min(num_match, num_iter), 1)
    iters_per = max(num_iter // n_rounds, 1)
    P = x_prop.cov
    P6 = P[:, 0:6]  # (DIM, 6)
    P66 = P[0:6, 0:6]

    def associate(x):
        # the (N,3,3) world covariance is never materialized: match
        # projects body cov + pose cov on the matched normal lane-wise
        # (var_world here was ~half the ESIKF's 4 ms/scan — batched
        # tiny matmuls, ops/lanes.py)
        wld = pts_b @ x.R.T + x.p
        m = voxelmap.match(
            vmap, wld, None, mask, params,
            pt_proj=(pts_b, var_b, x.R, x.cov[0:3, 0:3],
                     x.cov[3:6, 3:6]),
        )
        r_inv = jnp.where(m.valid, 1.0 / (meas_floor + m.sigma), 0.0)
        return m, r_inv

    def accumulate(x, m, r_inv):
        # residual under the CURRENT pose against the frozen plane
        wld = pts_b @ x.R.T + x.p
        d = jnp.sum(m.normal * (wld - m.center), axis=-1)
        # jac wrt [dθ, dp]: [phat Rᵀ n ; n] = [p_b × (Rᵀn) ; n] —
        # lane cross instead of a batched (N,3,3)@(N,3) matvec
        nl = lanes.from_vec(m.normal)
        q = [sum(x.R[k, i] * nl[k] for k in range(3)) for i in range(3)]
        jrot = lanes.to_vec(lanes.cross(lanes.from_vec(pts_b), q))
        jac = jnp.concatenate([jrot, m.normal], axis=-1)  # (N, 6)
        HTH = jnp.einsum("n,ni,nj->ij", r_inv, jac, jac)
        HTz = -jnp.einsum("n,ni,n->i", r_inv, jac, d)
        return HTH, HTz

    def kalman_delta(x, HTH, HTz):
        # K1 = (P⁻¹ + J HTH Jᵀ)⁻¹ with J = [I6; 0] — the measurement
        # only touches the pose block, so by the push-through identity
        #   K1 = P − P6 · HTH(I6 + P66·HTH)⁻¹ · P6ᵀ,
        # needing ONE 6×6 solve instead of the 15×15 LU inversions
        # (5 per scan ≈ 4 ms of the fused step; round-3 fwd bisect).
        SM = jnp.linalg.solve(
            jnp.eye(6, dtype=dtype) + HTH @ P66, HTH
        )  # = HTH (I + P66 HTH)⁻¹
        Kc = P6 - (P6 @ SM) @ P66  # = K1[:, 0:6]  (DIM, 6)
        G6 = Kc @ HTH  # (DIM, 6)
        vec = state.boxminus(x_prop, x)
        sol = Kc @ HTz + vec - G6 @ vec[0:6]
        return sol, G6

    def round_body(_, carry):
        x, G6, _, _ = carry
        m, r_inv = associate(x)

        def kal_body(_, inner):
            x, _ = inner
            HTH, HTz = accumulate(x, m, r_inv)
            sol, G6 = kalman_delta(x, HTH, HTz)
            return state.boxplus(x, sol), G6

        x, G6 = jax.lax.fori_loop(0, iters_per, kal_body, (x, G6))
        nnt = jnp.einsum(
            "n,ni,nj->ij", m.valid.astype(dtype), m.normal, m.normal
        )
        return x, G6, nnt, jnp.sum(m.valid)

    init = (
        x_prop,
        jnp.zeros((DIM, 6), dtype),
        jnp.zeros((3, 3), dtype),
        jnp.zeros((), jnp.int32),
    )
    x, G6, nnt, cnt = jax.lax.fori_loop(0, n_rounds, round_body, init)

    # posterior covariance (I − G) P with G embedded (voxelslam.cpp:943)
    G = jnp.zeros((DIM, DIM), dtype).at[:, 0:6].set(G6)
    cov = (jnp.eye(DIM, dtype=dtype) - G) @ x_prop.cov
    x = x._replace(cov=cov)

    evals = eigh3.eigvals3(nnt)
    return EsikfResult(x, evals[0] < degen_thresh, cnt, evals[0])
