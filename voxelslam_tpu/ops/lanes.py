"""Lane-explicit small-matrix math for batched tiny operands.

A batched product like ``(N, 3, 3) @ (N, 3, 3)`` lowers to a batched
tiny-matmul kernel on TPU (per-element dot_generals at 9-lane tile
efficiency — measured ~4 ms/scan across the fused step's factor math,
round-3 forward bisect).  Representing each matrix as a Python list of
``(N,)`` lanes turns the same math into a few dozen elementwise
multiply-adds that XLA fuses into one VPU kernel.

Conventions: a "vec" is ``[x, y, z]`` of ``(N,)`` arrays; a "mat" is a
3×3 nested list of ``(N,)`` (or scalar ``()``) arrays.  Scalars
broadcast, so a fixed ``(3, 3)`` pose block can be mixed with batched
lanes freely.
"""

from __future__ import annotations

import jax.numpy as jnp


def from_vec(v):
    """(..., 3) -> [x, y, z] lanes."""
    return [v[..., 0], v[..., 1], v[..., 2]]


def to_vec(l):
    return jnp.stack(l, axis=-1)


def from_mat(M):
    """(..., 3, 3) -> 3x3 nested lanes."""
    return [[M[..., i, j] for j in range(3)] for i in range(3)]


def to_mat(L):
    return jnp.stack(
        [jnp.stack(row, axis=-1) for row in L], axis=-2
    )


def hat(v):
    """Lanes of the skew matrix of vec `v`."""
    z = jnp.zeros_like(v[0] + v[1])
    return [[z, -v[2], v[1]], [v[2], z, -v[0]], [-v[1], v[0], z]]


def mm(A, B):
    """A @ B on lane mats."""
    return [
        [sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def mmT(A, B):
    """A @ Bᵀ on lane mats."""
    return [
        [sum(A[i][k] * B[j][k] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def mv(A, b):
    """A @ b (mat lanes × vec lanes)."""
    return [sum(A[i][k] * b[k] for k in range(3)) for i in range(3)]


def mTv(A, b):
    """Aᵀ @ b."""
    return [sum(A[k][i] * b[k] for k in range(3)) for i in range(3)]


def cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def dot(a, b):
    return sum(a[i] * b[i] for i in range(3))


def quad(v, M):
    """vᵀ M v for vec lanes and mat lanes -> (N,)."""
    return sum(
        v[i] * M[i][j] * v[j] for i in range(3) for j in range(3)
    )


def outer_add(*vs):
    """Σ_k v_k v_kᵀ as mat lanes."""
    return [
        [sum(v[i] * v[j] for v in vs) for j in range(3)]
        for i in range(3)
    ]
