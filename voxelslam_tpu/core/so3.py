"""SO(3) kernels, batched and jit/vmap-friendly.

TPU-native counterpart of the reference's scalar SO(3) toolbox
(reference: VoxelSLAM/src/tools.hpp:51-133 — Exp/Log/hat/jr/jr_inv).
All functions are pure, broadcast over leading batch dims, and avoid
data-dependent control flow (small-angle branches become `jnp.where`
with Taylor fallbacks, which XLA fuses into straight-line VPU code).

Conventions: rotations are 3x3 matrices (f32 by default); tangent
vectors are length-3 axis-angle.  ``exp(w)`` is the Rodrigues map,
``log(R)`` its inverse, ``jr`` the right Jacobian of SO(3) so that
``exp(w + dw) ≈ exp(w) @ exp(jr(w) @ dw)``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix; broadcasts over leading dims. v: (..., 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([M[..., 2, 1], M[..., 0, 2], M[..., 1, 0]], axis=-1)


def _sinc(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x with Taylor fallback, safe at 0."""
    x2 = x * x
    small = jnp.abs(x) < 1e-4
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x2 / 6.0, jnp.sin(safe) / safe)


def _cosc(x: jnp.ndarray) -> jnp.ndarray:
    """(1-cos(x))/x^2 with Taylor fallback, safe at 0."""
    x2 = x * x
    small = jnp.abs(x) < 1e-4
    safe2 = jnp.where(small, 1.0, x2)
    return jnp.where(small, 0.5 - x2 / 24.0, (1.0 - jnp.cos(x)) / safe2)


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues exponential map. w: (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    K = hat(w)
    K2 = K @ K
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    a = _sinc(theta)
    b = _cosc(theta)
    return I + a * K + b * K2


def exp_dt(w: jnp.ndarray, dt) -> jnp.ndarray:
    """exp(w * dt) — angular velocity integrated over dt."""
    return exp(w * jnp.asarray(dt)[..., None])


def log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues map. R: (..., 3, 3) -> (..., 3).

    Two branchless paths blended by angle: the antisymmetric-part
    formula for θ away from π, and an axis-from-(R+I) path near π
    (where R−Rᵀ vanishes and the standard formula loses the axis).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip(0.5 * (tr - 1.0), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    K = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # standard: 0.5 * theta / sin(theta) * K  (Taylor near 0)
    s = _sinc(theta)
    w_std = (0.5 / jnp.maximum(s, 1e-6))[..., None] * K

    # near pi: R + I ≈ 2 a aᵀ — take the largest column as the axis
    B = R + jnp.eye(3, dtype=R.dtype)
    norms = jnp.sum(B * B, axis=-2)  # (..., 3) column norms²
    pick = jnp.argmax(norms, axis=-1)
    a = jnp.take_along_axis(B, pick[..., None, None], axis=-1)[..., 0]
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-20)
    # orient along the (tiny but directional) antisymmetric part
    sgn = jnp.where(jnp.sum(a * K, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * a * sgn

    near_pi = (cos_t < -0.999)[..., None]
    return jnp.where(near_pi, w_pi, w_std)


def jr(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3). w: (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1)
    K = hat(w)
    K2 = K @ K
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    t = theta[..., None, None]
    a = _cosc(t)  # (1-cos)/t^2
    # (t - sin t)/t^3 with Taylor fallback
    small = jnp.abs(t) < 1e-4
    safe3 = jnp.where(small, 1.0, t * t * t)
    b = jnp.where(small, 1.0 / 6.0 - t * t / 120.0, (t - jnp.sin(t)) / safe3)
    return I - a * K + b * K2


def jr_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian of SO(3). w: (..., 3) -> (..., 3, 3)."""
    theta = jnp.linalg.norm(w, axis=-1)
    K = hat(w)
    K2 = K @ K
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    t = theta[..., None, None]
    t2 = t * t
    # c = (1/t^2) - (1+cos t)/(2 t sin t), Taylor: 1/12 + t^2/720
    small = jnp.abs(t) < 1e-3
    safe_t = jnp.where(small, 1.0, t)
    c_exact = 1.0 / jnp.where(small, 1.0, t2) - (1.0 + jnp.cos(safe_t)) / (
        2.0 * safe_t * jnp.where(small, 1.0, jnp.sin(safe_t))
    )
    c = jnp.where(small, 1.0 / 12.0 + t2 / 720.0, c_exact)
    return I + 0.5 * K + c * K2


def jr_inv_R(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian evaluated at log(R) (reference tools.hpp:118)."""
    return jr_inv(log(R))


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation back onto SO(3) (Gram-Schmidt).

    f32 drift accumulates over thousands of `R @ exp(w)` products; the
    pipeline calls this periodically instead of carrying quaternions.
    """
    c0 = R[..., :, 0]
    c1 = R[..., :, 1]
    c0 = c0 / jnp.linalg.norm(c0, axis=-1, keepdims=True)
    c1 = c1 - jnp.sum(c0 * c1, axis=-1, keepdims=True) * c0
    c1 = c1 / jnp.linalg.norm(c1, axis=-1, keepdims=True)
    c2 = jnp.cross(c0, c1)
    return jnp.stack([c0, c1, c2], axis=-1)
