"""Batched open-addressing hash table on device.

Replaces the reference's `unordered_map<VOXEL_LOC, OctoTree*>`
(voxel_map.hpp:1504-1540) with a fixed-capacity linear-probing table
held in HBM.  Keys are (x, y, z, level) int32 quadruples; an empty
slot has level = -1.

Both operations are data-parallel over K queries with a static probe
bound:

- `lookup`: K gathers per probe round; resolved queries stop updating.
- `insert` (find-or-create): per round, unresolved queries that see an
  empty slot contend by `scatter-min` of their query index into a
  claim array; winners write their key, losers whose key equals the
  winner's adopt the slot, everyone else probes on.  This makes batch
  insertion deterministic and race-free in pure XLA — the TPU-native
  equivalent of the per-voxel mutexes in the reference
  (voxel_map.hpp:959,971).

The table never resizes; `insert` returns an overflow flag per query
(probe bound exhausted).  Map-level eviction/compaction lives in
voxelmap.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import hashing

EMPTY_LEVEL = jnp.int32(-1)
INT_MAX = jnp.int32(2**31 - 1)


def empty_keys(capacity: int) -> jnp.ndarray:
    """(C, 4) int32 key table, all empty."""
    k = jnp.zeros((capacity, 4), jnp.int32)
    return k.at[:, 3].set(EMPTY_LEVEL)


def _key_equal(key_at: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(key_at == q, axis=-1)


def lookup(
    keys: jnp.ndarray, coord: jnp.ndarray, level: jnp.ndarray,
    max_probe: int, skip: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Find slots for K queries. Returns (K,) int32 slot, -1 if absent.

    coord: (K, 3) int32; level: (K,) int32.  Queries with `skip` set
    start resolved (slot -1) and cost nothing: the probe loop exits as
    soon as every pending query is done, so a mostly-skipped batch is
    near-free (the early-exit that makes level-0-first assign pay).
    """
    C = keys.shape[0]
    q = jnp.concatenate([coord, level[:, None]], axis=-1)  # (K, 4)
    h0 = hashing.slot_of(coord, level, C)

    # head: the first U probes as ONE (K, U) gather + a first-decider
    # select.  The sequential while_loop costs a gather, a select
    # chain AND a full all(done) reduction PER PROBE (each a separate
    # serialized step on TPU); at the working load factor (< 0.7)
    # nearly every query decides within 4 probes, so the head usually
    # retires the whole batch and the tail loop's cond fails once.
    U = min(4, max_probe)
    cand = (h0[:, None] + jnp.arange(U, dtype=jnp.int32)[None, :]) & (
        C - 1
    )  # (K, U)
    key_at = keys[cand]  # (K, U, 4)
    hit = jnp.all(key_at == q[:, None, :], axis=-1)  # (K, U)
    empty = key_at[..., 3] == EMPTY_LEVEL  # ⇒ key not in table
    decide = hit | empty
    first = jnp.argmax(decide, axis=1)  # first deciding probe
    has = jnp.any(decide, axis=1)
    hit_first = jnp.take_along_axis(hit, first[:, None], 1)[:, 0]
    slot = jnp.where(
        has & hit_first,
        jnp.take_along_axis(cand, first[:, None], 1)[:, 0],
        -1,
    )
    done = has
    if skip is not None:
        slot = jnp.where(skip, -1, slot)
        done = done | skip
    if U >= max_probe:
        return slot

    # tail: rare long chains continue sequentially from probe U
    def cond(carry):
        slot, done, r = carry
        return (r < max_probe) & ~jnp.all(done)

    def body(carry):
        slot, done, r = carry
        cand = (h0 + r) & (C - 1)
        key_at = keys[cand]
        hit = _key_equal(key_at, q) & ~done
        miss_empty = (key_at[:, 3] == EMPTY_LEVEL) & ~done
        slot = jnp.where(hit, cand, slot)
        done = done | hit | miss_empty
        return slot, done, r + 1

    slot, done, _ = jax.lax.while_loop(
        cond, body, (slot, done, jnp.int32(U))
    )
    return slot


def insert(
    keys: jnp.ndarray, coord: jnp.ndarray, level: jnp.ndarray,
    valid: jnp.ndarray, max_probe: int
):
    """Find-or-create slots for K queries (duplicates allowed).

    Returns (keys', slot, created, overflow):
      slot (K,) int32 (-1 on overflow), created (K,) bool (this query's
      key was newly added by this batch), overflow (K,) bool.
    Invalid queries get slot -1 and never touch the table.
    """
    C = keys.shape[0]
    K = coord.shape[0]
    q = jnp.concatenate([coord, level[:, None]], axis=-1)
    h0 = hashing.slot_of(coord, level, C)
    qidx = jnp.arange(K, dtype=jnp.int32)
    slot = jnp.full((K,), -1, jnp.int32)
    done = ~valid
    created = jnp.zeros((K,), bool)

    def cond(carry):
        keys, slot, done, created, r = carry
        return (r < max_probe) & ~jnp.all(done)

    def body(carry):
        keys, slot, done, created, r = carry
        cand = (h0 + r) & (C - 1)
        key_at = keys[cand]
        hit = _key_equal(key_at, q) & ~done
        slot = jnp.where(hit, cand, slot)
        done = done | hit

        # contend for empty slots
        empty = (key_at[:, 3] == EMPTY_LEVEL) & ~done
        claim = jnp.full((C,), INT_MAX, jnp.int32)
        claim = claim.at[jnp.where(empty, cand, C)].min(
            qidx, mode="drop"
        )
        won = empty & (claim[cand] == qidx)
        keys = keys.at[jnp.where(won, cand, C)].set(q, mode="drop")
        slot = jnp.where(won, cand, slot)
        created = created | won
        done = done | won
        # losers whose key equals what the winner just wrote adopt it
        key_at2 = keys[cand]
        adopt = empty & ~done & _key_equal(key_at2, q)
        slot = jnp.where(adopt, cand, slot)
        done = done | adopt
        return keys, slot, done, created, r + 1

    keys, slot, done, created, _ = jax.lax.while_loop(
        cond, body, (keys, slot, done, created, jnp.int32(0))
    )
    overflow = ~done & valid
    return keys, slot, created, overflow


def insert_points(
    keys: jnp.ndarray, coord: jnp.ndarray, level: jnp.ndarray,
    valid: jnp.ndarray, max_probe: int, max_unique: int,
    known_slot: jnp.ndarray | None = None,
):
    """Find-or-create for a large batch with FEW unique keys.

    `insert` contends per query — K colliding scatter rounds; point
    scatters routinely carry 40k queries over only a few thousand
    distinct voxels, so deduplicate first (sort by hash + exact-coord
    compare), insert only the ≤ max_unique representatives, then
    resolve every query with a gather-only `lookup`.  On TPU this
    turns the dominant scatter traffic into one sort + small-batch
    insert + gathers.

    `known_slot` (optional, from a prior `assign` pass) carries
    already-resolved slots: only unresolved queries (< 0) enter the
    dedupe/insert and the final lookup skips the rest, so in steady
    state (few new voxels per scan) this path degenerates to the
    handful of creations.

    Returns (keys', slot (K,), n_unique, overflow_count).
    """
    K = coord.shape[0]
    pending = valid if known_slot is None else valid & (known_slot < 0)
    if known_slot is not None:
        # FAST PATH: with an `assign` pre-pass the pending set is the
        # handful of genuinely new voxels per scan — plain contended
        # `insert` on it resolves duplicates via the adopt mechanism
        # in ~probe-chain-length rounds, with NO dedupe argsort and NO
        # final lookup (the K-point sort cost ~0.5 ms/scan fused;
        # round-3 forward bisect).
        keys, slot, created, ovf = insert(
            keys, coord, level, pending, max_probe
        )
        slot = jnp.where(pending, slot, known_slot)
        slot = jnp.where(valid, slot, -1)
        return keys, slot, jnp.sum(created), jnp.sum(ovf)
    h = hashing.mix(coord, level)
    h = jnp.where(pending, h, INT_MAX)
    order = jnp.argsort(h)
    h_s = h[order]
    c_s = coord[order]
    l_s = level[order]
    v_s = pending[order]
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (h_s[1:] != h_s[:-1])
            | jnp.any(c_s[1:] != c_s[:-1], axis=-1)
            | (l_s[1:] != l_s[:-1]),
        ]
    ) & v_s
    (uidx,) = jnp.nonzero(first, size=max_unique, fill_value=K)
    uok = uidx < K
    us = jnp.clip(uidx, 0, K - 1)
    keys, _, _, u_ovf = insert(
        keys, c_s[us], l_s[us], uok, max_probe
    )
    slot = lookup(keys, coord, level, max_probe, skip=~pending)
    if known_slot is not None:
        slot = jnp.where(pending, slot, known_slot)
    slot = jnp.where(valid, slot, -1)
    n_unique = jnp.sum(first)
    overflow = jnp.sum(u_ovf) + jnp.maximum(n_unique - max_unique, 0)
    return keys, slot, n_unique, overflow


class HashStats(NamedTuple):
    occupied: jnp.ndarray
    load: jnp.ndarray


def stats(keys: jnp.ndarray) -> HashStats:
    occ = jnp.sum(keys[:, 3] != EMPTY_LEVEL)
    return HashStats(occ, occ / keys.shape[0])
