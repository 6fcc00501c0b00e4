"""Sorted segment reduction via segmented associative scan.

TPU scatter-add with duplicate indices lowers to a serialized update
loop — the dominant cost of the voxel scatter path.  For data already
sorted by destination, the sums can instead be computed with a
segmented inclusive scan (`lax.associative_scan` over (value, flag)
pairs — the classic segmented-sum monoid) and written with ONE
scatter whose indices are unique and sorted, which XLA lowers to the
fast vectorized path.

Precision: each partial sum only accumulates values of its own
segment (the flag resets the carry), so there is no long-cumsum
cancellation — error matches ordinary per-voxel summation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _seg_scan(vals: jnp.ndarray, first: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive prefix sum along axis 0.

    vals: (K, ...) ; first: (K,) bool marking segment starts.
    Returns per-element running sums that reset at segment starts.
    """
    shape = (vals.shape[0],) + (1,) * (vals.ndim - 1)
    flags = first.astype(vals.dtype).reshape(shape)

    def comb(a, b):
        av, af = a
        bv, bf = b
        return (bv + (1.0 - bf) * av, jnp.maximum(af, bf))

    scanned, _ = jax.lax.associative_scan(comb, (vals, flags), axis=0)
    return scanned


def sorted_segment_add(
    out: jnp.ndarray,
    idx_sorted: jnp.ndarray,
    vals: jnp.ndarray,
    drop_beyond: int | None = None,
) -> jnp.ndarray:
    """out[idx] += vals, for idx SORTED ascending (duplicates allowed).

    Rows with idx >= drop_beyond (default: out.shape[0]) are dropped.
    Equivalent to `out.at[idx].add(vals)` but avoids the TPU
    duplicate-scatter slow path.
    """
    K = idx_sorted.shape[0]
    drop = out.shape[0] if drop_beyond is None else drop_beyond
    first = jnp.concatenate(
        [jnp.ones((1,), bool), idx_sorted[1:] != idx_sorted[:-1]]
    )
    is_last = jnp.concatenate(
        [idx_sorted[1:] != idx_sorted[:-1], jnp.ones((1,), bool)]
    )
    seg = _seg_scan(vals, first)
    # IMPORTANT: the destination sequence must honestly satisfy the
    # indices_are_sorted promise — interleaving a drop sentinel breaks
    # monotonicity and TPU lowering then writes garbage.  Keep the
    # (sorted, duplicated) indices and zero the non-last values
    # instead; out-of-range rows are already at the tail (sorted).
    dst = jnp.where(idx_sorted < drop, idx_sorted, out.shape[0])
    shape = (K,) + (1,) * (vals.ndim - 1)
    seg = seg * is_last.astype(vals.dtype).reshape(shape)
    return out.at[dst].add(
        seg, mode="drop", indices_are_sorted=True, unique_indices=False
    )
