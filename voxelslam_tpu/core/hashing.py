"""Spatial voxel keys and hash mixing.

Counterpart of the reference's `VOXEL_LOC` + std::hash specialization
(VoxelSLAM/src/tools.hpp:24-49).  The reference uses an int64 triple
with a multiplicative hash into `unordered_map`; on device we keep the
(x, y, z, level) integer quadruple as the exact key and mix it into a
table index with a Fibonacci-style integer hash (int32 arithmetic —
JAX default; wraparound is part of the mixing).

`level` distinguishes the octree refinement levels that the TPU map
stores side by side in one open-addressing table (SURVEY.md §7:
"octree subdivision becomes 1-2 extra hash levels").
"""

from __future__ import annotations

import jax.numpy as jnp

# large odd constants for coordinate mixing (Fibonacci hashing family);
# values wrap to int32 (the wraparound is part of the mixing)
import numpy as _np

def _i32(x: int) -> jnp.ndarray:
    return jnp.int32(_np.uint32(x).astype(_np.int32))

_HX = _i32(0x9E3779B1)
_HY = _i32(0x85EBCA77)
_HZ = _i32(0xC2B2AE3D)
_HL = _i32(0x27D4EB2F)


def voxel_coord(pts: jnp.ndarray, voxel_size) -> jnp.ndarray:
    """World points (..., 3) -> integer voxel coords (..., 3) int32.

    floor(p / size); matches the reference's negative-coordinate
    handling (tools.hpp:209-214: shift-then-truncate == floor).
    """
    return jnp.floor(pts / voxel_size).astype(jnp.int32)


def voxel_center(coord: jnp.ndarray, voxel_size) -> jnp.ndarray:
    """Center of a voxel given integer coords (inverse of voxel_coord)."""
    return (coord.astype(jnp.float32) + 0.5) * voxel_size


def mix(coord: jnp.ndarray, level: jnp.ndarray) -> jnp.ndarray:
    """Hash (..., 3) int32 coords + level to int32 (well mixed).

    Combine with ADDITION, not XOR: xor of linear multiples collides
    heavily for small coordinate ranges (low-bit patterns of x·A and
    y·B align), while an additive combination of large odd constants
    is injective unless an exact lattice relation holds."""
    h = (
        coord[..., 0] * _HX
        + coord[..., 1] * _HY
        + coord[..., 2] * _HZ
        + level * _HL
    )
    # final avalanche (xorshift-multiply)
    h = h ^ (h >> 15)
    h = h * _i32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * _i32(0x9E3779B1)
    h = h ^ (h >> 16)
    return h


def slot_of(coord: jnp.ndarray, level: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Initial probe slot in a table of `capacity` (power of two)."""
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return (mix(coord, level) & jnp.int32(capacity - 1)).astype(jnp.int32)
