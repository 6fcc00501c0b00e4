"""Pallas TPU kernel: segmented inclusive prefix sum over sorted rows.

`lax.associative_scan` lowers the segmented-sum monoid to ~log2(K)
full passes over the (K, D) value array in HBM; this kernel does the
same scan in ONE pass — each (B, D) block is loaded to VMEM once, a
Hillis-Steele sweep runs in registers/VMEM, and the only cross-block
state is a (1, D) carry held in VMEM scratch across the sequential
TPU grid.

Used by ops.segsum.sorted_segment_add on the voxel scatter hot path
(reference counterpart: the per-voxel push accumulation loops,
voxel_map.hpp:969-994 — redesigned as sort + segmented scan for TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 512


def _kernel(vals_ref, first_ref, out_ref, carry_v, carry_f):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        carry_v[:] = jnp.zeros_like(carry_v)
        carry_f[:] = jnp.zeros_like(carry_f)

    v = vals_ref[:]  # (B, D)
    f = first_ref[:].astype(v.dtype)  # (B, 1)

    # Hillis-Steele segmented inclusive scan within the block:
    # monoid (v, f) ∘ (v', f') = (v' + (1-f')·v, max(f, f'))
    B = v.shape[0]
    s = 1
    while s < B:
        vz = jnp.zeros((s,) + v.shape[1:], v.dtype)
        fz = jnp.zeros((s,) + f.shape[1:], f.dtype)
        v_sh = jnp.concatenate([vz, v[:-s]], axis=0)
        f_sh = jnp.concatenate([fz, f[:-s]], axis=0)
        v = v + (1.0 - f) * v_sh
        f = jnp.maximum(f, f_sh)
        s *= 2

    # fold the carry from previous blocks into rows before this
    # block's first segment start (f == 0 after the sweep means no
    # start at or before the row)
    open_rows = 1.0 - f  # (B, 1)
    v = v + open_rows * carry_v[:]
    out_ref[:] = v

    carry_v[:] = v[-1:, :]
    carry_f[:] = f[-1:, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def segmented_scan(vals: jnp.ndarray, first: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum of (K, D) `vals` resetting where `first`
    is True.  K must be a multiple of BLOCK_ROWS (callers pad)."""
    K, D = vals.shape
    assert K % BLOCK_ROWS == 0, K
    grid = K // BLOCK_ROWS
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, D), lambda b: (b, 0)),
            pl.BlockSpec((BLOCK_ROWS, 1), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, D), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((K, D), vals.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, D), vals.dtype),
            pltpu.VMEM((1, 1), vals.dtype),
        ],
        interpret=interpret,
    )(vals, first.reshape(K, 1).astype(vals.dtype))
