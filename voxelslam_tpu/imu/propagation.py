"""ESIKF forward propagation and scan deskew (motion compensation).

TPU-native counterpart of the reference's `IMUEKF`
(VoxelSLAM/src/ekf_imu.hpp): midpoint propagation of the 15-DoF state
and covariance over the scan's IMU span as a `lax.scan`, followed by a
fully vectorized backward per-point motion compensation into the
scan-end frame through the LiDAR-IMU extrinsics
(ekf_imu.hpp:41-165).

Host-side packing (`pack_imu_intervals`, numpy) turns the raw IMU
message stream into fixed-size per-scan interval arrays
(dt, gyr_avg, acc_avg, offt, valid): consecutive-sample midpoint
averages, first interval clipped to the previous scan end, including
the reference's synthesized boundary samples (ekf_imu.hpp:125-133).
Device code never sees ragged message deques.

Padding convention: invalid intervals carry dt = 0 (a propagation
no-op) and offt = +inf (never selected by the deskew searchsorted).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import so3
from ..core.state import DIM, NavState

# lax.scan unroll factor for the per-IMU-interval loops (propagate /
# propagate_backward / preintegration.integrate): the body is ~30 tiny
# 15x15 ops, so loop-step overhead dominates un-unrolled on TPU.
# Module-level so perf A/B harnesses can patch it (trace-time read).
UNROLL = 8


class ImuBatch(NamedTuple):
    """Per-scan IMU intervals, padded to a static length M."""

    dt: jnp.ndarray  # (M,)   integration step (0 for padding)
    gyr: jnp.ndarray  # (M, 3) midpoint-averaged angular velocity (raw)
    acc: jnp.ndarray  # (M, 3) midpoint-averaged specific force (raw)
    offt: jnp.ndarray  # (M,)  interval-start offset from scan begin (s);
    #                          +inf for padding
    valid: jnp.ndarray  # (M,) bool


class ImuNoise(NamedTuple):
    cov_gyr: jnp.ndarray  # (3,)
    cov_acc: jnp.ndarray  # (3,)
    cov_bias_gyr: jnp.ndarray  # (3,)
    cov_bias_acc: jnp.ndarray  # (3,)


def noise_from_cfg(cov_gyr, cov_acc, rdw_gyr, rdw_acc, dtype=jnp.float32):
    f = lambda v: jnp.full((3,), v, dtype)
    return ImuNoise(f(cov_gyr), f(cov_acc), f(rdw_gyr), f(rdw_acc))


class ImuPoses(NamedTuple):
    """Interval-start poses recorded during propagation, for deskew."""

    offt: jnp.ndarray  # (M,)
    R: jnp.ndarray  # (M, 3, 3)
    p: jnp.ndarray  # (M, 3)
    v: jnp.ndarray  # (M, 3)
    w: jnp.ndarray  # (M, 3)  bias-corrected angular velocity
    a: jnp.ndarray  # (M, 3)  world acceleration (incl. gravity)


def pack_imu_intervals(
    imu_t: np.ndarray,
    imu_gyr: np.ndarray,
    imu_acc: np.ndarray,
    t_prev_end: float,
    t_begin: float,
    t_end: float,
    max_imu: int,
) -> tuple[np.ndarray, ...]:
    """Host-side: select IMU samples covering [t_prev_end, t_end] and
    midpoint-pair them into fixed-size interval arrays.

    Mirrors the reference's span selection and boundary synthesis: the
    sample before t_prev_end is prepended with its stamp clamped to
    t_prev_end, and the last sample's stamp is clamped to t_end
    (ekf_imu.hpp:59-133).  Returns numpy arrays shaped for ImuBatch
    plus the signed end-extrapolation dt (t_end - last_raw_stamp).
    """
    i0 = int(np.searchsorted(imu_t, t_prev_end, side="right"))
    i0 = max(i0 - 1, 0)
    i1 = int(np.searchsorted(imu_t, t_end, side="right"))
    i1 = min(max(i1, i0 + 2), len(imu_t))
    ts = imu_t[i0:i1].astype(np.float64).copy()
    gs = imu_gyr[i0:i1]
    as_ = imu_acc[i0:i1]
    if len(ts) < 2:
        # sensor dropout around the scan span: synthesize a boundary
        # sample (reference synthesizes samples at scan start/end,
        # ekf_imu.hpp:125-133) so propagation covers the span with the
        # single available measurement held constant
        if len(ts) == 0:
            raise ValueError(
                f"no IMU samples near scan span [{t_prev_end}, {t_end}]"
            )
        ts = np.asarray([min(ts[0], t_prev_end), t_end], np.float64)
        gs = np.repeat(gs[:1], 2, axis=0)
        as_ = np.repeat(as_[:1], 2, axis=0)
    dt_ext = float(t_end - ts[-1])
    ts[0] = max(ts[0], min(t_prev_end, ts[1] - 1e-6))
    ts[-1] = t_end if dt_ext < 0 else ts[-1]

    n = len(ts) - 1
    if n > max_imu:
        raise ValueError(f"scan spans {n} IMU intervals > max_imu={max_imu}")
    dt = np.zeros(max_imu, np.float32)
    gyr = np.zeros((max_imu, 3), np.float32)
    acc = np.zeros((max_imu, 3), np.float32)
    offt = np.full(max_imu, np.inf, np.float32)
    valid = np.zeros(max_imu, bool)
    dt[:n] = np.diff(ts)
    gyr[:n] = 0.5 * (gs[1:] + gs[:-1])
    acc[:n] = 0.5 * (as_[1:] + as_[:-1])
    offt[:n] = ts[:-1] - t_begin
    valid[:n] = True
    return dt, gyr, acc, offt, valid, np.float32(max(dt_ext, 0.0))


def propagate(
    x: NavState,
    imus: ImuBatch,
    noise: ImuNoise,
    dt_ext: jnp.ndarray,
    scale_gravity: jnp.ndarray,
    t_end: jnp.ndarray,
) -> tuple[NavState, ImuPoses]:
    """Forward propagate state + covariance through the scan's IMU span
    (ekf_imu.hpp:41-123) and extrapolate to the scan end time.

    Returns the propagated state (stamped t_end) and the interval-start
    pose log used by `deskew`.
    """
    dtype = x.p.dtype
    I3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        R, p, v, cov, w_prev, a_prev = carry
        dt, gyr, acc, valid = inp
        w = gyr - x.bg
        a = acc * scale_gravity - x.ba
        a_w = R @ a + x.g

        # pose at interval start (recorded pre-integration)
        rec = (R, p, v, w, a_w)

        # 15x15 covariance propagation (error-state midpoint model)
        F = jnp.eye(DIM, dtype=dtype)
        F = F.at[0:3, 0:3].set(so3.exp(-w * dt))
        F = F.at[0:3, 9:12].set(-I3 * dt)
        F = F.at[3:6, 6:9].set(I3 * dt)
        F = F.at[6:9, 0:3].set(-(R @ so3.hat(a)) * dt)
        F = F.at[6:9, 12:15].set(-R * dt)
        Q = jnp.zeros((DIM, DIM), dtype)
        dt2 = dt * dt
        Q = Q.at[0:3, 0:3].set(jnp.diag(noise.cov_gyr) * dt2)
        Q = Q.at[6:9, 6:9].set(R @ jnp.diag(noise.cov_acc) @ R.T * dt2)
        Q = Q.at[9:12, 9:12].set(jnp.diag(noise.cov_bias_gyr) * dt2)
        Q = Q.at[12:15, 12:15].set(jnp.diag(noise.cov_bias_acc) * dt2)
        cov_new = F @ cov @ F.T + Q

        # state integration
        p_new = p + v * dt + 0.5 * a_w * dt2
        v_new = v + a_w * dt
        R_new = R @ so3.exp(w * dt)

        keep = valid & (dt > 0)
        R = jnp.where(keep, R_new, R)
        p = jnp.where(keep, p_new, p)
        v = jnp.where(keep, v_new, v)
        cov = jnp.where(keep, cov_new, cov)
        w_last = jnp.where(valid, w, w_prev)
        a_last = jnp.where(valid, a_w, a_prev)
        return (R, p, v, cov, w_last, a_last), rec

    init = (x.R, x.p, x.v, x.cov, jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    # unroll: the per-iteration work is ~30 tiny ops on 15x15 blocks;
    # loop-step overhead dominated the fused scan step (measured
    # ~1.5 ms/scan at n_imu=64) — unrolling fuses 8 intervals per step
    (R, p, v, cov, w_last, a_last), recs = jax.lax.scan(
        step, init, (imus.dt, imus.gyr, imus.acc, imus.valid),
        unroll=UNROLL,
    )

    # signed extrapolation to scan end (ekf_imu.hpp:117-123)
    v_end = v + a_last * dt_ext
    R_end = R @ so3.exp(w_last * dt_ext)
    p_end = p + v * dt_ext + 0.5 * a_last * dt_ext * dt_ext

    x_out = x._replace(
        t=jnp.asarray(t_end, dtype), R=R_end, p=p_end, v=v_end, cov=cov
    )
    poses = ImuPoses(
        offt=imus.offt, R=recs[0], p=recs[1], v=recs[2], w=recs[3], a=recs[4]
    )
    return x_out, poses


def propagate_backward(
    x_end: NavState,
    imus: ImuBatch,
    dt_ext: jnp.ndarray,
    scale_gravity: jnp.ndarray,
) -> ImuPoses:
    """Integrate the state BACKWARD from the (refined) scan-end state
    through the scan's IMU intervals — the reference's
    `Initialization::motion_blur` semantics (voxelslam.cpp:488-561):
    within-scan poses anchor exactly at the refined scan-end state and
    velocity, so per-iteration re-deskews during dynamic initialization
    use the best current estimate instead of forward propagation from
    the previous (less-refined) scan.  Returns the interval-start pose
    log consumed by `deskew`.

    Exact inverse of `propagate`'s midpoint recurrence:
        v_i = v_{i+1} − a_w·dt ;  p_i = p_{i+1} − v_i·dt − ½·a_w·dt² ;
        R_i = R_{i+1}·Exp(−w·dt)   with a_w = R_i·a + g.
    """
    dtype = x_end.p.dtype
    bg, ba, g = x_end.bg, x_end.ba, x_end.g

    # undo the end extrapolation with the last valid interval's rates
    # (dt_ext ≤ one IMU period, so using the scan-end R here is exact
    # to O(ω·dt_ext²))
    nvalid = jnp.sum(imus.valid.astype(jnp.int32))
    last = jnp.clip(nvalid - 1, 0)
    w_l = imus.gyr[last] - bg
    R1 = x_end.R @ so3.exp(-w_l * dt_ext)
    a_w_l = R1 @ (imus.acc[last] * scale_gravity - ba) + g
    v1 = x_end.v - a_w_l * dt_ext
    p1 = x_end.p - v1 * dt_ext - 0.5 * a_w_l * dt_ext * dt_ext

    def step(carry, inp):
        R_next, p_next, v_next = carry  # state at interval END
        dt, gyr, acc, valid = inp
        w = gyr - bg
        R_i = R_next @ so3.exp(-w * dt)
        a_w = R_i @ (acc * scale_gravity - ba) + g
        v_i = v_next - a_w * dt
        p_i = p_next - v_i * dt - 0.5 * a_w * dt * dt
        keep = valid & (dt > 0)
        R_i = jnp.where(keep, R_i, R_next)
        p_i = jnp.where(keep, p_i, p_next)
        v_i = jnp.where(keep, v_i, v_next)
        rec = (R_i, p_i, v_i, w, a_w)  # state at interval START
        return (R_i, p_i, v_i), rec

    _, recs = jax.lax.scan(
        step, (R1, p1, v1), (imus.dt, imus.gyr, imus.acc, imus.valid),
        reverse=True, unroll=UNROLL,
    )
    return ImuPoses(
        offt=imus.offt, R=recs[0], p=recs[1], v=recs[2], w=recs[3],
        a=recs[4],
    )


def deskew(
    pts: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    poses: ImuPoses,
    x_end: NavState,
    ext_R: jnp.ndarray,
    ext_t: jnp.ndarray,
) -> jnp.ndarray:
    """Motion-compensate LiDAR points into the scan-end LiDAR frame.

    Vectorized version of the reference's backward per-point loop
    (ekf_imu.hpp:138-163): each point finds its IMU interval by
    searchsorted on interval-start offsets, integrates the interval
    state to its own timestamp, and maps through the extrinsics:

      p' = eRᵀ( R_endᵀ( R_i(τ)(eR p + et) + (pos_i(τ) − p_end) ) − et )

    pts: (N, 3) LiDAR-frame points, offsets: (N,) seconds from scan
    begin, mask: (N,) valid flags.
    """
    idx = jnp.clip(
        jnp.searchsorted(poses.offt, offsets, side="right") - 1, 0, poses.offt.shape[0] - 1
    )
    off0 = poses.offt[idx]
    dt = jnp.where(mask, offsets - jnp.where(jnp.isfinite(off0), off0, 0.0), 0.0)
    Ri = poses.R[idx] @ so3.exp(poses.w[idx] * dt[:, None])
    pos = (
        poses.p[idx]
        + poses.v[idx] * dt[:, None]
        + 0.5 * poses.a[idx] * (dt * dt)[:, None]
    )
    p_imu = jnp.einsum("ij,nj->ni", ext_R, pts) + ext_t
    p_w = jnp.einsum("nij,nj->ni", Ri, p_imu) + pos
    p_endf = jnp.einsum("ji,nj->ni", x_end.R, p_w - x_end.p)  # R_endᵀ (...)
    out = jnp.einsum("ji,nj->ni", ext_R, p_endf - ext_t)
    return jnp.where(mask[:, None], out, 0.0)


def static_init_gravity(mean_acc: jnp.ndarray, is_livox_g_units: bool):
    """Static initialization: gravity from the accel running mean with
    the livox g-unit autoscale (ekf_imu.hpp:167-206)."""
    norm = jnp.linalg.norm(mean_acc)
    scale = jnp.where(
        jnp.logical_and(norm < 2.0, is_livox_g_units), 9.8, 1.0
    )
    return -mean_acc * scale, scale
