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


_CHUNK = 512  # one-hot matmul tile (MXU-sized)


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

    Implementation: segment totals via CHUNKED ONE-HOT MATMULS — for
    each 512-row chunk, totals = one_hot(local_segment_id)ᵀ @ vals
    rides the MXU (exact: 0/1 coefficients under the package-wide
    highest-precision matmul setting), then one scatter-add writes
    per-chunk partials (a segment straddling a chunk boundary simply
    contributes two partials).  This replaces the log2(K)-pass
    segmented `associative_scan` — the sublane row-shifts it needs
    are slow on TPU (see ops/segscan_pallas.py for the measured
    single-pass Pallas scan alternative; the MXU form wins).
    """
    K = idx_sorted.shape[0]
    drop = out.shape[0] if drop_beyond is None else drop_beyond
    dst_in = jnp.where(idx_sorted < drop, idx_sorted, out.shape[0])

    B = _CHUNK
    pad = (-K) % B
    if pad:
        dst_in = jnp.concatenate(
            [dst_in, jnp.full((pad,), out.shape[0], dst_in.dtype)]
        )
        vals = jnp.concatenate(
            [vals, jnp.zeros((pad,) + vals.shape[1:], vals.dtype)]
        )
        K = K + pad

    Cn = K // B
    v2 = vals.reshape(Cn, B, -1)
    idx_c = dst_in.reshape(Cn, B)
    first = jnp.concatenate(
        [jnp.ones((Cn, 1), bool), idx_c[:, 1:] != idx_c[:, :-1]], axis=1
    )
    local = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1  # (Cn, B)
    oh = (
        local[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (Cn, B, B), 2)
    ).astype(vals.dtype)
    totals = jnp.einsum("cks,ckd->csd", oh, v2)  # (Cn, B, D)
    # local segment s's destination = idx at its start row; local ids
    # are assigned in ascending-idx order, so a per-chunk sort of the
    # (start-flagged) indices lines them up with the totals rows
    starts = jnp.where(first, idx_c, jnp.int32(2147483647))
    dst = jnp.sort(starts, axis=1).reshape(K)
    dst = jnp.where(dst < drop, dst, out.shape[0])
    return out.at[dst].add(
        totals.reshape((K,) + vals.shape[1:]), mode="drop",
        indices_are_sorted=False, unique_indices=False,
    )
