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
    N = jnp.stack([b1, b2], axis=-1)  # (N, 3, 2)
    A = rng[..., None] * (so3.hat(d) @ N)  # (N, 3, 2)
    var = (
        range_var * d[..., :, None] * d[..., None, :]
        + dir_var * (A @ jnp.swapaxes(A, -1, -2))
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
    ph = so3.hat(pts_b)
    return (
        jnp.einsum("ij,...jk,lk->...il", x.R, var_b, x.R)
        + ph @ rot_var @ jnp.swapaxes(ph, -1, -2)
        + tsl_var
    )
