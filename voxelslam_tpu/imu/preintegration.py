"""IMU preintegration factors for the sliding-window LiDAR-inertial BA.

TPU-native counterpart of the reference's `IMU_PRE`
(VoxelSLAM/src/preintegration.hpp): Forster-style midpoint
preintegrated deltas (ΔR, Δp, Δv) with first-order bias Jacobians and
9+6 noise propagation, plus the 15-dim two-state residual and analytic
30-column Jacobian used by `LI_BA_Optimizer`
(preintegration.hpp:75-212).

Everything is batched: a window of W scans carries W−1 factors as one
`Preint` pytree with leading dim (W−1); building runs `lax.scan` over
padded interval arrays and evaluation is `vmap`ed.  The LM accept/
reject bookkeeping of bias deltas (dbg/dba with rollback buffers,
preintegration.hpp:296-303 and voxel_map.hpp:639-643) lives in the
optimizer's loop carry, not here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import so3
from ..core.state import DIM, NavState


class Preint(NamedTuple):
    """Preintegrated IMU factor(s); leading batch dims allowed."""

    R_delta: jnp.ndarray  # (..., 3, 3)
    p_delta: jnp.ndarray  # (..., 3)
    v_delta: jnp.ndarray  # (..., 3)
    R_bg: jnp.ndarray  # (..., 3, 3)  ∂ΔR/∂bg (right-tangent convention)
    p_bg: jnp.ndarray  # (..., 3, 3)
    p_ba: jnp.ndarray  # (..., 3, 3)
    v_bg: jnp.ndarray  # (..., 3, 3)
    v_ba: jnp.ndarray  # (..., 3, 3)
    cov: jnp.ndarray  # (..., 15, 15)
    dtime: jnp.ndarray  # (...)
    bg0: jnp.ndarray  # (..., 3) bias reference at integration time
    ba0: jnp.ndarray  # (..., 3)


def identity(batch=(), dtype=jnp.float32) -> Preint:
    z3 = jnp.zeros(batch + (3,), dtype)
    z33 = jnp.zeros(batch + (3, 3), dtype)
    return Preint(
        R_delta=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (3, 3)),
        p_delta=z3,
        v_delta=z3,
        R_bg=z33,
        p_bg=z33,
        p_ba=z33,
        v_bg=z33,
        v_ba=z33,
        cov=jnp.zeros(batch + (DIM, DIM), dtype),
        dtime=jnp.zeros(batch, dtype),
        bg0=z3,
        ba0=z3,
    )


def integrate(
    bg0: jnp.ndarray,
    ba0: jnp.ndarray,
    dt: jnp.ndarray,
    gyr: jnp.ndarray,
    acc: jnp.ndarray,
    valid: jnp.ndarray,
    noise_meas: jnp.ndarray,  # (6, 6) diag [gyr, acc]
    noise_walk: jnp.ndarray,  # (6, 6) diag
    scale_gravity=1.0,
) -> Preint:
    """Build one factor from padded interval arrays (dt=0 ⇒ no-op).

    Midpoint recursion (preintegration.hpp:75-135):
      Δp += Δv dt + ½dt² ΔR a ;  Δv += dt ΔR a ;  ΔR ∘= Exp(w dt)
    with the matching bias-Jacobian recursions and 9×9 (θ,p,v) + 6×6
    walk covariance propagation.
    """
    dtype = dt.dtype
    I3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        pre = carry
        dt_i, g_i, a_i, ok = inp
        w = g_i - bg0
        a = a_i * scale_gravity - ba0
        R_inc = so3.exp(w * dt_i)
        Jr = so3.jr(w * dt_i)
        ahat = so3.hat(a)
        Rdt = pre.R_delta * dt_i
        Rdt2 = 0.5 * dt_i * pre.R_delta * dt_i

        p_ba = pre.p_ba + pre.v_ba * dt_i - Rdt2
        p_bg = pre.p_bg + pre.v_bg * dt_i - Rdt2 @ ahat @ pre.R_bg
        v_ba = pre.v_ba - Rdt
        v_bg = pre.v_bg - Rdt @ ahat @ pre.R_bg
        R_bg = R_inc.T @ pre.R_bg - Jr * dt_i

        A = jnp.eye(9, dtype=dtype)
        A = A.at[0:3, 0:3].set(R_inc.T)
        A = A.at[3:6, 0:3].set(-Rdt2 @ ahat)
        A = A.at[3:6, 6:9].set(I3 * dt_i)
        A = A.at[6:9, 0:3].set(-Rdt @ ahat)
        B = jnp.zeros((9, 6), dtype)
        B = B.at[0:3, 0:3].set(Jr * dt_i)
        B = B.at[3:6, 3:6].set(Rdt2)
        B = B.at[6:9, 3:6].set(Rdt)
        cov9 = A @ pre.cov[0:9, 0:9] @ A.T + B @ noise_meas @ B.T
        cov = pre.cov.at[0:9, 0:9].set(cov9)
        cov = cov.at[9:15, 9:15].add(noise_walk * dt_i)

        p_delta = pre.p_delta + pre.v_delta * dt_i + Rdt2 @ a
        v_delta = pre.v_delta + Rdt @ a
        R_delta = pre.R_delta @ R_inc

        new = Preint(
            R_delta, p_delta, v_delta, R_bg, p_bg, p_ba, v_bg, v_ba,
            cov, pre.dtime + dt_i, bg0, ba0,
        )
        keep = ok & (dt_i > 0)
        out = jax.tree.map(
            lambda n, o: jnp.where(keep, n, o), new, pre
        )
        return out, None

    init = identity((), dtype)._replace(bg0=bg0, ba0=ba0)
    # unrolled for the same loop-overhead reason as prop.propagate
    from .propagation import UNROLL

    pre, _ = jax.lax.scan(step, init, (dt, gyr, acc, valid), unroll=UNROLL)
    return pre


class FactorEval(NamedTuple):
    rr: jnp.ndarray  # (..., 15) residual
    chi2: jnp.ndarray  # (...) rrᵀ Σ⁻¹ rr
    jtj: jnp.ndarray  # (..., 30, 30)
    gg: jnp.ndarray  # (..., 30)
    jtj_g: jnp.ndarray  # (..., 33, 33) with shared-gravity columns
    gg_g: jnp.ndarray  # (..., 33)


def _evaluate_one(
    pre: Preint,
    dbg: jnp.ndarray,
    dba: jnp.ndarray,
    x1: NavState,
    x2: NavState,
    with_jac: bool,
):
    """15-dim residual + analytic Jacobians for one factor
    (preintegration.hpp:137-294, incl. the gravity-column variant)."""
    dtype = pre.p_delta.dtype
    dtime = pre.dtime
    R_corr = pre.R_delta @ so3.exp(pre.R_bg @ dbg)
    t_corr = pre.p_delta + pre.p_bg @ dbg + pre.p_ba @ dba
    v_corr = pre.v_delta + pre.v_bg @ dbg + pre.v_ba @ dba

    res_R = R_corr.T @ x1.R.T @ x2.R
    exp_v = x1.R.T @ (x2.v - x1.v - dtime * x1.g)
    exp_t = x1.R.T @ (x2.p - x1.p - x1.v * dtime - 0.5 * dtime * dtime * x1.g)
    rr = jnp.concatenate(
        [
            so3.log(res_R),
            exp_t - t_corr,
            exp_v - v_corr,
            x2.bg - x1.bg,
            x2.ba - x1.ba,
        ]
    )
    cov_inv = jnp.linalg.inv(
        pre.cov + jnp.eye(DIM, dtype=dtype) * 1e-10
    )
    chi2 = rr @ cov_inv @ rr
    if not with_jac:
        return rr, chi2, None, None, None, None

    JRi = so3.jr_inv(so3.log(res_R))
    Ja = jnp.zeros((DIM, DIM), dtype)
    Jb = jnp.zeros((DIM, DIM), dtype)
    Jg = jnp.zeros((DIM, 3), dtype)
    Ja = Ja.at[0:3, 0:3].set(-JRi @ x2.R.T @ x1.R)
    Jb = Jb.at[0:3, 0:3].set(JRi)
    Ja = Ja.at[0:3, 9:12].set(
        -JRi @ res_R.T @ so3.jr(pre.R_bg @ dbg) @ pre.R_bg
    )
    Ja = Ja.at[3:6, 0:3].set(so3.hat(exp_t))
    Ja = Ja.at[3:6, 3:6].set(-x1.R.T)
    Ja = Ja.at[3:6, 6:9].set(-x1.R.T * dtime)
    Ja = Ja.at[3:6, 9:12].set(-pre.p_bg)
    Ja = Ja.at[3:6, 12:15].set(-pre.p_ba)
    Jb = Jb.at[3:6, 3:6].set(x1.R.T)
    Ja = Ja.at[6:9, 0:3].set(so3.hat(exp_v))
    Ja = Ja.at[6:9, 6:9].set(-x1.R.T)
    Ja = Ja.at[6:9, 9:12].set(-pre.v_bg)
    Ja = Ja.at[6:9, 12:15].set(-pre.v_ba)
    Jb = Jb.at[6:9, 6:9].set(x1.R.T)
    I3 = jnp.eye(3, dtype=dtype)
    Ja = Ja.at[9:12, 9:12].set(-I3)
    Ja = Ja.at[12:15, 12:15].set(-I3)
    Jb = Jb.at[9:12, 9:12].set(I3)
    Jb = Jb.at[12:15, 12:15].set(I3)
    # gravity columns (give_evaluate_g, preintegration.hpp:277-278)
    Jg = Jg.at[3:6, 0:3].set(x1.R.T * (-0.5 * dtime * dtime))
    Jg = Jg.at[6:9, 0:3].set(x1.R.T * (-dtime))

    J = jnp.concatenate([Ja, Jb, Jg], axis=1)  # (15, 33)
    JtC = J.T @ cov_inv
    jtj_g = JtC @ J
    gg_g = JtC @ rr
    return rr, chi2, jtj_g[:30, :30], gg_g[:30], jtj_g, gg_g


def evaluate(
    pres: Preint, dbg: jnp.ndarray, dba: jnp.ndarray, x1: NavState, x2: NavState
) -> FactorEval:
    """Batched residual+Jacobian over W−1 factors.

    pres leaves have leading dim (W−1); x1/x2 are the window states
    shifted by one; dbg/dba are the LM bias-delta accumulators."""
    f = jax.vmap(lambda p, g, a, s1, s2: _evaluate_one(p, g, a, s1, s2, True))
    rr, chi2, jtj, gg, jtj_g, gg_g = f(pres, dbg, dba, x1, x2)
    return FactorEval(rr, chi2, jtj, gg, jtj_g, gg_g)


def evaluate_residual(
    pres: Preint, dbg: jnp.ndarray, dba: jnp.ndarray, x1: NavState, x2: NavState
) -> jnp.ndarray:
    """Batched chi² only (reference only_residual path)."""
    f = jax.vmap(lambda p, g, a, s1, s2: _evaluate_one(p, g, a, s1, s2, False)[1])
    return f(pres, dbg, dba, x1, x2)


def merge(a: Preint, b: Preint) -> Preint:
    """Compose consecutive preintegrations (preintegration.hpp:305-329);
    used by the window-compaction paths of loop closure / HBA."""
    dtype = a.p_delta.dtype
    p_bg = a.p_bg + a.v_bg * b.dtime + a.R_delta @ (
        b.p_bg - so3.hat(b.p_delta) @ a.R_bg
    )
    p_ba = a.p_ba + a.v_ba * b.dtime + a.R_delta @ b.p_ba
    v_bg = a.v_bg + a.R_delta @ (b.v_bg - so3.hat(b.v_delta) @ a.R_bg)
    v_ba = a.v_ba + a.R_delta @ b.v_ba
    R_bg = b.R_delta.T @ a.R_bg + b.R_bg

    Ai = jnp.eye(DIM, dtype=dtype)
    Ai = Ai.at[0:3, 0:3].set(b.R_delta.T)
    Ai = Ai.at[3:6, 0:3].set(-a.R_delta @ so3.hat(b.p_delta))
    Ai = Ai.at[3:6, 6:9].set(jnp.eye(3, dtype=dtype) * b.dtime)
    Ai = Ai.at[6:9, 0:3].set(-a.R_delta @ so3.hat(b.v_delta))
    Bi = jnp.eye(DIM, dtype=dtype)
    Bi = Bi.at[3:6, 3:6].set(a.R_delta)
    Bi = Bi.at[6:9, 6:9].set(a.R_delta)
    cov = Ai @ a.cov @ Ai.T + Bi @ b.cov @ Bi.T

    return Preint(
        R_delta=a.R_delta @ b.R_delta,
        p_delta=a.p_delta + a.v_delta * b.dtime + a.R_delta @ b.p_delta,
        v_delta=a.v_delta + a.R_delta @ b.v_delta,
        R_bg=R_bg,
        p_bg=p_bg,
        p_ba=p_ba,
        v_bg=v_bg,
        v_ba=v_ba,
        cov=cov,
        dtime=a.dtime + b.dtime,
        bg0=a.bg0,
        ba0=a.ba0,
    )
