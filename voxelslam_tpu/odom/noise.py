"""Per-point LiDAR noise model.

Counterpart of the reference's `calcBodyVar` + `var_init`
(voxelslam.hpp:163-201): each measured point carries a 3x3 covariance
from a range error (std `dept_err`, meters) along the beam and a
bearing error (`beam_err`, degrees) in the two tangent directions,
then maps through the LiDAR→IMU extrinsics.  Vectorized over points.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import so3
from ..ops import lanes


def body_var(pts: jnp.ndarray, dept_err, beam_err_deg) -> jnp.ndarray:
    """(N, 3) LiDAR-frame points -> (N, 3, 3) covariances."""
    z_safe = jnp.where(jnp.abs(pts[..., 2]) < 1e-4, 1e-4, pts[..., 2])
    p = pts.at[..., 2].set(z_safe) if hasattr(pts, "at") else pts
    rng = jnp.linalg.norm(p, axis=-1, keepdims=True)
    rng = jnp.maximum(rng, 1e-6)
    d = p / rng
    range_var = dept_err * dept_err
    sin_b = jnp.sin(jnp.deg2rad(beam_err_deg))
    dir_var = sin_b * sin_b

    # tangent basis (the reference's base_vector construction)
    b1 = jnp.stack(
        [
            jnp.ones_like(d[..., 0]),
            jnp.ones_like(d[..., 0]),
            -(d[..., 0] + d[..., 1]) / jnp.where(
                jnp.abs(d[..., 2]) < 1e-6, 1e-6, d[..., 2]
            ),
        ],
        axis=-1,
    )
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    b2 = jnp.cross(b1, d)
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    # hat(d) @ [b1 b2] has columns d×b1, d×b2; A Aᵀ is then a sum of
    # two outer products — lane math, not (N,3,2)@(N,2,3) batched
    # tiny matmuls (ops/lanes.py rationale)
    dl = lanes.from_vec(d)
    r = rng[..., 0]
    a1 = [r * c for c in lanes.cross(dl, lanes.from_vec(b1))]
    a2 = [r * c for c in lanes.cross(dl, lanes.from_vec(b2))]
    var = lanes.to_mat(
        [
            [
                range_var * dl[i] * dl[j]
                + dir_var * (a1[i] * a1[j] + a2[i] * a2[j])
                for j in range(3)
            ]
            for i in range(3)
        ]
    )
    return var


def to_body_frame(pts_l, var_l, ext_R, ext_t):
    """Apply LiDAR→IMU extrinsics to points + covariances
    (var_init, voxelslam.hpp:187-201)."""
    pts_b = jnp.einsum("ij,...j->...i", ext_R, pts_l) + ext_t
    var_b = jnp.einsum("ij,...jk,lk->...il", ext_R, var_l, ext_R)
    return pts_b, var_b


def world_var(pts_b, var_b, x):
    """Inflate body covariances with the posterior pose covariance and
    return world-frame covariances (pvec_update, voxelslam.hpp:203-214).
    """
    rot_var = x.cov[0:3, 0:3]
    tsl_var = x.cov[3:6, 3:6]
    # R Σ_b Rᵀ with a FIXED R is two plain dots (fine); the batched
    # hat(p) Σ_rot hat(p)ᵀ term is lane-unrolled (ops/lanes.py)
    H = lanes.hat(lanes.from_vec(pts_b))
    HS = [
        [
            sum(H[i][k] * rot_var[k, j] for k in range(3))
            for j in range(3)
        ]
        for i in range(3)
    ]
    rot_term = lanes.to_mat(lanes.mmT(HS, H))
    return (
        jnp.einsum("ij,...jk,lk->...il", x.R, var_b, x.R)
        + rot_term
        + tsl_var
    )
