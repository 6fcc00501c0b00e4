"""Point-cluster (second-moment) algebra — the BALM2 sufficient statistic.

TPU-native counterpart of the reference's `PointCluster`
(VoxelSLAM/src/tools.hpp:304-365): a voxel's points enter BA cost only
through (P = Σ p pᵀ, v = Σ p, N), so clusters merge with `+`, transform
under SE(3) in closed form, and the plane cost is an eigenvalue of the
normalized covariance.

Representation: P is stored packed-symmetric as 6 floats
[xx, xy, xz, yy, yz, zz] so a map of ~1e5 voxels x 10 window slots
stays compact in HBM; helpers pack/unpack to 3x3 when doing linear
algebra.  All functions broadcast over leading batch dims.

Precision note: the reference runs f64 and accumulates absolute world
coordinates; in f32, Σ p pᵀ at |p| ~ 500 m loses the ~1e-3 m² plane
signal to cancellation.  The map layer therefore always accumulates
moments *relative to each voxel's center* — the algebra here is frame
agnostic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# index pairs of the packed upper triangle [xx xy xz yy yz zz]
_PACK_I = jnp.array([0, 0, 0, 1, 1, 2])
_PACK_J = jnp.array([0, 1, 2, 1, 2, 2])


def pack_sym(M: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) packed [xx xy xz yy yz zz]."""
    return M[..., _PACK_I, _PACK_J]


def unpack_sym(s: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) packed -> (..., 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = (s[..., k] for k in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], axis=-1),
            jnp.stack([xy, yy, yz], axis=-1),
            jnp.stack([xz, yz, zz], axis=-1),
        ],
        axis=-2,
    )


class Cluster(NamedTuple):
    """Second-moment aggregate. P: (..., 6) packed, v: (..., 3), n: (...)."""

    P: jnp.ndarray
    v: jnp.ndarray
    n: jnp.ndarray  # float count (exact for counts < 2^24)


def zero(batch_shape=(), dtype=jnp.float32) -> Cluster:
    return Cluster(
        P=jnp.zeros(batch_shape + (6,), dtype),
        v=jnp.zeros(batch_shape + (3,), dtype),
        n=jnp.zeros(batch_shape, dtype),
    )


def from_points(pts: jnp.ndarray, mask: jnp.ndarray | None = None) -> Cluster:
    """Reduce (..., K, 3) points (optionally masked) to one cluster."""
    if mask is not None:
        w = mask.astype(pts.dtype)[..., None]
        pts_w = pts * w
    else:
        w = jnp.ones(pts.shape[:-1], pts.dtype)[..., None]
        pts_w = pts
    outer = pts_w[..., :, _PACK_I] * pts[..., :, _PACK_J]
    return Cluster(
        P=jnp.sum(outer, axis=-2),
        v=jnp.sum(pts_w, axis=-2),
        n=jnp.sum(w[..., 0], axis=-1),
    )


def point_outer_packed(pts: jnp.ndarray) -> jnp.ndarray:
    """Per-point packed outer product p pᵀ: (..., 3) -> (..., 6)."""
    return pts[..., _PACK_I] * pts[..., _PACK_J]


def add(a: Cluster, b: Cluster) -> Cluster:
    return Cluster(a.P + b.P, a.v + b.v, a.n + b.n)


def sub(a: Cluster, b: Cluster) -> Cluster:
    return Cluster(a.P - b.P, a.v - b.v, a.n - b.n)


def transform(c: Cluster, R: jnp.ndarray, t: jnp.ndarray) -> Cluster:
    """Moments of {R p + t} from moments of {p} (tools.hpp:357-363):
    v' = R v + n t;  P' = R P Rᵀ + (R v) tᵀ + t (R v)ᵀ + n t tᵀ.
    Broadcasts: R (..., 3, 3), t (..., 3)."""
    P = unpack_sym(c.P)
    Rv = jnp.einsum("...ij,...j->...i", R, c.v)
    RPRt = R @ P @ jnp.swapaxes(R, -1, -2)
    n = c.n[..., None]
    cross = Rv[..., :, None] * t[..., None, :]
    P_new = RPRt + cross + jnp.swapaxes(cross, -1, -2) + (
        n[..., None] * t[..., :, None] * t[..., None, :]
    )
    return Cluster(P=pack_sym(P_new), v=Rv + n * t, n=c.n)


def mean(c: Cluster, eps: float = 1e-12) -> jnp.ndarray:
    return c.v / jnp.maximum(c.n, eps)[..., None]


def cov(c: Cluster, eps: float = 1e-12) -> jnp.ndarray:
    """Normalized covariance P/n − v̄ v̄ᵀ as (..., 3, 3) (tools.hpp:333-337)."""
    n = jnp.maximum(c.n, eps)[..., None, None]
    m = mean(c, eps)
    return unpack_sym(c.P) / n - m[..., :, None] * m[..., None, :]
