"""Device voxel-grid downsampling with static output shapes.

Counterparts of the reference's hash-map downsamplers
(`down_sampling_voxel` centroid average, tools.hpp:201-238, and
`down_sampling_close` nearest-real-point, tools.hpp:240-302) as
sort + segment-reduce over padded point arrays — the idiomatic XLA
shape: a single key sort, then scatter-adds into a fixed number of
output segments.

Outputs are padded to a static M with a validity mask; when the scan
has more occupied voxels than M the surplus segments are dropped
(hash-ordered, i.e. spatially random — diagnosable via `n_voxels`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import hashing
from ..map import hashmap
from . import segsum


class Downsampled(NamedTuple):
    pts: jnp.ndarray  # (M, 3)
    mask: jnp.ndarray  # (M,)
    n_voxels: jnp.ndarray  # () true number of occupied voxels
    aux: jnp.ndarray | None  # (M, A) carried attributes (close variant)
    # () int32 — points silently dropped BEFORE aggregation (hash-path
    # probe-chain overflow; the sort path never drops within m_out).
    # Zero-shaped scalar 0 for paths that cannot drop.
    n_dropped: jnp.ndarray | None = None


def _segments(pts, mask, voxel_size):
    """Sort points by voxel hash; return per-point segment ids (sorted
    order), the sort permutation, and segment count."""
    coord = hashing.voxel_coord(pts, voxel_size)
    key = hashing.mix(coord, jnp.int32(0))
    # push invalid points to the end
    key = jnp.where(mask, key, jnp.int32(2**31 - 1))
    order = jnp.argsort(key)
    key_s = key[order]
    coord_s = coord[order]
    mask_s = mask[order]
    new_seg = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (key_s[1:] != key_s[:-1])
            | jnp.any(coord_s[1:] != coord_s[:-1], axis=-1),
        ]
    )
    new_seg = new_seg & mask_s
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    seg_id = jnp.where(mask_s, seg_id, -1)
    return order, seg_id, mask_s, jnp.max(seg_id) + 1


def voxel_average_sort(
    pts: jnp.ndarray, mask: jnp.ndarray, voxel_size, m_out: int
) -> Downsampled:
    """Centroid per voxel via sort + segment-reduce (the original
    path; kept for A/B against the hash variant below)."""
    order, seg_id, mask_s, n_seg = _segments(pts, mask, voxel_size)
    pts_s = pts[order]
    # seg ids ascend in sorted order (invalid = -1 sorted last becomes
    # -1... mask them to m_out which also keeps monotonicity at the tail)
    dst = jnp.where(mask_s, seg_id, m_out)
    sums = segsum.sorted_segment_add(
        jnp.zeros((m_out, 3), pts.dtype), dst,
        jnp.where(mask_s[:, None], pts_s, 0.0),
    )
    cnts = segsum.sorted_segment_add(
        jnp.zeros((m_out,), pts.dtype), dst, mask_s.astype(pts.dtype)
    )
    out_mask = cnts > 0
    out = sums / jnp.maximum(cnts, 1.0)[:, None]
    return Downsampled(out, out_mask, n_seg, None)


def voxel_average_hash(
    pts: jnp.ndarray, mask: jnp.ndarray, voxel_size, m_out: int,
    *, table_mult: int = 2, max_probe: int = 32,
) -> Downsampled:
    """Centroid per voxel (down_sampling_voxel semantics).

    Sort-free: dedupe cells with the map's contended hash insert on a
    scratch table (hashmap.insert — scatter-min claims, duplicate
    queries adopt the winner's slot in the same round), scatter-add
    (Σp, n) by slot, then compact occupied slots to the padded m_out.
    The N-point argsort + 5 gathers of the sort path were the single
    most expensive stage of the fused steady step (forward bisect:
    4.05 ms/scan of ~9.4 at bench shapes); the insert's while_loop
    retires in ~probe-chain-length rounds at the scratch table's low
    load factor.

    Cell order in the output differs from the sort path (table order
    vs hash-sorted order) — every consumer treats the rows as a
    padded set.  Surplus cells beyond m_out are dropped either way
    (there: hash order, here: table order), diagnosable via n_voxels.
    """
    N = pts.shape[0]
    # the scratch table must hold every DISTINCT cell of the input
    # (worst case N, not m_out: surplus cells are dropped at the
    # compaction, but an overflowing insert would drop POINTS and
    # blow the probe chains first); 2x keeps the load factor <= 0.5
    S = 1 << (table_mult * N - 1).bit_length()  # pow2 (slot_of)
    coord = hashing.voxel_coord(pts, voxel_size)
    lvl = jnp.zeros((N,), jnp.int32)
    keys, slot, _, _ = hashmap.insert(
        hashmap.empty_keys(S), coord, lvl, mask, max_probe
    )
    ok = mask & (slot >= 0)
    # probe-overflow diagnostic: a valid point whose probe chain
    # exceeded max_probe gets slot -1 and would otherwise vanish
    # silently (a centroid shifts or a whole cell disappears)
    n_dropped = jnp.sum(mask & (slot < 0)).astype(jnp.int32)
    dst = jnp.where(ok, slot, S)
    sums = jnp.zeros((S, 3), pts.dtype).at[dst].add(
        jnp.where(ok[:, None], pts, 0.0), mode="drop"
    )
    cnts = jnp.zeros((S,), pts.dtype).at[dst].add(
        ok.astype(pts.dtype), mode="drop"
    )
    occ = cnts > 0
    n_seg = jnp.sum(occ)
    # compact occupied slots into the first ≤ m_out output rows
    idx = jnp.cumsum(occ.astype(jnp.int32)) - 1
    d2 = jnp.where(occ & (idx < m_out), idx, m_out)
    out_sum = jnp.zeros((m_out, 3), pts.dtype).at[d2].set(
        sums, mode="drop"
    )
    out_cnt = jnp.zeros((m_out,), pts.dtype).at[d2].set(
        cnts, mode="drop"
    )
    out_mask = out_cnt > 0
    out = out_sum / jnp.maximum(out_cnt, 1.0)[:, None]
    return Downsampled(out, out_mask, n_seg, None, n_dropped)


# default used by the steady step and keyframe program; flip only on
# a measured TPU A/B (scripts/ab_downsample.py) — scatter-heavy
# rewrites have LOST to the sort before (CLAUDE.md: serial-VMEM
# Pallas scatter slower than sort+one-hot)
voxel_average = voxel_average_sort


def voxel_average_pvec(
    pts: jnp.ndarray,  # (N, 3)
    var: jnp.ndarray,  # (N, 3, 3) per-point covariances
    mask: jnp.ndarray,
    voxel_size,
    m_out: int,
):
    """Joint (point, covariance) average per voxel — the reference's
    `down_sampling_pvec` (voxel_map.hpp:24-65): the representative
    point is the centroid and its covariance is the AVERAGE of the
    constituents' covariances (the reference stashes diag(var) in the
    normal fields; here the full 3x3 rides along).

    Returns (Downsampled, var_out (M, 3, 3))."""
    order, seg_id, mask_s, n_seg = _segments(pts, mask, voxel_size)
    pts_s = pts[order]
    var_s = var[order].reshape(-1, 9)
    dst = jnp.where(mask_s, seg_id, m_out)
    vals = jnp.concatenate(
        [pts_s, var_s, mask_s[:, None].astype(pts.dtype)], axis=-1
    )
    vals = jnp.where(mask_s[:, None], vals, 0.0)
    sums = segsum.sorted_segment_add(
        jnp.zeros((m_out, 13), pts.dtype), dst, vals
    )
    cnts = sums[:, 12]
    out_mask = cnts > 0
    inv = 1.0 / jnp.maximum(cnts, 1.0)
    out = sums[:, 0:3] * inv[:, None]
    var_out = (sums[:, 3:12] * inv[:, None]).reshape(-1, 3, 3)
    return Downsampled(out, out_mask, n_seg, None), var_out


def voxel_closest(
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size,
    m_out: int,
    aux: jnp.ndarray | None = None,
) -> Downsampled:
    """Keep the real point nearest each voxel's centroid
    (down_sampling_close semantics — preserves true measurements and
    their timestamps, used by initialization's re-deskew stash,
    voxelslam.cpp:1263-1276).  `aux` (N, A) rides along."""
    order, seg_id, mask_s, n_seg = _segments(pts, mask, voxel_size)
    pts_s = pts[order]
    dst = jnp.where((seg_id >= 0) & (seg_id < m_out), seg_id, m_out)
    sums = jnp.zeros((m_out, 3), pts.dtype).at[dst].add(
        jnp.where(mask_s[:, None], pts_s, 0.0), mode="drop"
    )
    cnts = jnp.zeros((m_out,), pts.dtype).at[dst].add(
        mask_s.astype(pts.dtype), mode="drop"
    )
    centroid = sums / jnp.maximum(cnts, 1.0)[:, None]
    d2 = jnp.sum((pts_s - centroid[jnp.clip(dst, 0, m_out - 1)]) ** 2, axis=-1)
    d2 = jnp.where(mask_s, d2, jnp.inf)
    best = jnp.full((m_out,), jnp.inf, pts.dtype).at[dst].min(d2, mode="drop")
    # claim: among points matching the segment min distance, lowest index wins
    is_best = mask_s & (d2 <= best[jnp.clip(dst, 0, m_out - 1)])
    idx = jnp.arange(pts.shape[0], dtype=jnp.int32)
    winner = jnp.full((m_out,), 2**31 - 1, jnp.int32).at[
        jnp.where(is_best, dst, m_out)
    ].min(idx, mode="drop")
    out_mask = cnts > 0
    sel = jnp.clip(winner, 0, pts.shape[0] - 1)
    out = jnp.where(out_mask[:, None], pts_s[sel], 0.0)
    aux_out = None
    if aux is not None:
        aux_s = aux[order]
        aux_out = jnp.where(out_mask[:, None], aux_s[sel], 0.0)
    return Downsampled(out, out_mask, n_seg, aux_out)
