"""Batched closed-form 3x3 self-adjoint eigendecomposition.

The voxel map performs one 3x3 eigendecomposition per active voxel per
scan (plane refit — reference recut, voxel_map.hpp:1148-1194) and the
BA residual re-evaluates one per factor voxel per LM trial
(voxel_map.hpp:243-279).  General-purpose `jnp.linalg.eigh` lowers to
an iterative Jacobi sweep; for 3x3 the trigonometric closed form is a
handful of VPU ops and vectorizes perfectly over ~1e5 voxels, so that
is what we use.

Eigenvalues: Cardano/trigonometric method on the shifted matrix
B = (A − tr/3·I)/s.  Eigenvectors: cross products of (A−λI) rows with
deterministic fallbacks for (near-)degenerate pairs.  Ascending order
(λ0 ≤ λ1 ≤ λ2) to match `Eigen::SelfAdjointEigenSolver`.

All inputs are (..., 3, 3) symmetric; returns (w, V) with w (..., 3)
ascending and V (..., 3, 3) columns the corresponding unit vectors.
"""

from __future__ import annotations

import jax.numpy as jnp


def eigvals3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues only, ascending. A: (..., 3, 3) symmetric."""
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    A00 = A[..., 0, 0] - q
    A11 = A[..., 1, 1] - q
    A22 = A[..., 2, 2] - q
    A01, A02, A12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]

    p2 = (A00 * A00 + A11 * A11 + A22 * A22) / 6.0 + (
        A01 * A01 + A02 * A02 + A12 * A12
    ) / 3.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # det(B)/2 where B = (A - q I)/p
    inv_p = 1.0 / p
    b00, b11, b22 = A00 * inv_p, A11 * inv_p, A22 * inv_p
    b01, b02, b12 = A01 * inv_p, A02 * inv_p, A12 * inv_p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam0 - lam2
    # degenerate (p ~ 0): all eigenvalues equal q
    degen = p2 < 1e-28
    lam0 = jnp.where(degen, q, lam0)
    lam1 = jnp.where(degen, q, lam1)
    lam2 = jnp.where(degen, q, lam2)
    return jnp.stack([lam0, lam1, lam2], axis=-1)


def _eigvec(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for eigenvalue lam via row cross products.

    For M = A − λI (rank ≤ 2), the eigenvector spans the null space;
    any two independent rows of M have a cross product along it.  We
    take the largest-norm cross product among the three row pairs for
    numerical robustness, with a canonical-axis fallback when all are
    tiny (degenerate eigenvalue — any unit vector in the eigenspace is
    then acceptable for downstream plane math).
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3, 3)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    ok = nrm[..., 0] > 1e-20
    v = jnp.where(ok[..., None], v / jnp.maximum(nrm, 1e-30), 0.0)
    return v, ok


def eigh3(A: jnp.ndarray):
    """Full decomposition: returns (w ascending (...,3), V (...,3,3))."""
    w = eigvals3(A)
    # smallest and largest eigenvectors via cross-product method;
    # middle one completes the right-handed frame.
    v0, ok0 = _eigvec(A, w[..., 0])
    v2, ok2 = _eigvec(A, w[..., 2])
    # fallbacks: if v2 failed (A ~ isotropic) pick e_z; if v0 failed
    # (λ0≈λ1 degenerate pair) pick any unit ⟂ v2.
    ez = jnp.zeros_like(v2).at[..., 2].set(1.0)
    v2 = jnp.where(ok2[..., None], v2, ez)
    # orthogonalize v0 against v2 (guards the λ0≈λ1≈λ2 corner)
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    n0 = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    ok0 = ok0 & (n0[..., 0] > 1e-20)
    # perpendicular fallback: cross v2 with the axis least aligned to it
    helper = jnp.where(
        (jnp.abs(v2[..., 0]) < 0.9)[..., None],
        jnp.zeros_like(v2).at[..., 0].set(1.0),
        jnp.zeros_like(v2).at[..., 1].set(1.0),
    )
    fallback = jnp.cross(v2, helper)
    fallback = fallback / jnp.linalg.norm(fallback, axis=-1, keepdims=True)
    v0 = jnp.where(ok0[..., None], v0 / jnp.maximum(n0, 1e-30), fallback)
    v1 = jnp.cross(v2, v0)
    V = jnp.stack([v0, v1, v2], axis=-1)
    # Rayleigh-quotient refinement: λi ← viᵀ A vi recovers ~1 extra
    # digit in f32 (and is exactly the quantity the BA cost uses).
    AV = A @ V
    w = jnp.einsum("...ik,...ik->...k", V, AV)
    return w, V


def eigh3_packed(P6: jnp.ndarray):
    """eigh3 on packed-symmetric (..., 6) input [xx xy xz yy yz zz]."""
    from ..core.cluster import unpack_sym

    return eigh3(unpack_sym(P6))
