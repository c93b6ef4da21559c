"""Vectorized hash join.

Analog of StarRocks' JoinHashMap (be/src/exec/join_hash_map.h:677, build
funcs :410-475, probe chain-walk join_hash_map.tpp:1066), redesigned for XLA:

- Build: the same deterministic scatter-min-claim open-addressing used by
  hash_agg assigns each distinct build key a slot; the slot stores the owning
  build row index. The bucket-chained `first[]/next[]` arrays of the
  reference map poorly to SIMD probing; open addressing with lockstep
  vectorized probing is the TPU shape of the same idea.
- Probe: every probe row walks its probe sequence simultaneously in a
  while_loop; a row resolves on key match or on hitting an empty slot
  (guaranteed to exist, load factor < 1). No prefetch coroutines
  (join_hash_map.h:216) needed — the vectorized gather IS the latency hiding.
- One-to-many: when the build side has duplicate keys, slots are chained
  through a `next_row` array (insertion-ordered within key, deterministic);
  `probe_expand` emits up to `fanout_cap` matches per probe row into a
  statically-shaped output (two-pass count-then-emit is the dynamic-shape
  escape hatch, mirroring the reference's two-pass probe state
  HashTableProbeState join_hash_map.h:164-200).

Join types (be/src/exec/hash_joiner.h): inner / left-outer / semi / anti via
`lookup` + mask algebra in exec.operators; right/full-outer via build-side
match flags (build_match_index analog).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops import hashing
from starrocks_tpu.ops.hash_agg import build_group_slots, _NO_OWNER


def key_equal_cross(
    probe_cols: Sequence[Column],
    build_cols: Sequence[Column],
    idx: jnp.ndarray,
) -> jnp.ndarray:
    """probe row i's key tuple == build row idx[i]'s key tuple (idx pre-clipped).

    NULL keys never match (SQL equi-join semantics)."""
    eq = None
    for p, b in zip(probe_cols, build_cols):
        if p.dtype.is_string or b.dtype.is_string:
            if p.dict_id != b.dict_id:
                raise NotImplementedError("string join keys need a shared dict")
        e = p.data == b.data[idx].astype(p.data.dtype)
        if p.valid is not None:
            e = e & p.valid
        if b.valid is not None:
            e = e & b.valid[idx]
        eq = e if eq is None else (eq & e)
    return eq


class BuildTable:
    """Device-side build result: open-addressing slots + duplicate chains."""

    def __init__(self, owner, next_row, dup_count, overflow, key_cols, capacity):
        self.owner = owner            # (C,) int32 owning build row per slot
        self.next_row = next_row      # (Nb,) int32 next build row with same key
        self.dup_count = dup_count    # scalar int64: rows beyond first per key
        self.overflow = overflow
        self.key_cols = tuple(key_cols)
        self.capacity = capacity


def build(key_cols: Sequence[Column], live: jnp.ndarray, capacity: int) -> BuildTable:
    """Insert build rows; chain duplicates in insertion order."""
    slots, owner, overflow = build_group_slots(key_cols, live, capacity)
    n = key_cols[0].data.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    # rows that share a slot but aren't the owner are duplicates; chain them
    # deterministically by row order: next_row[r] = smallest row' > r in slot.
    is_owner = owner[slots] == rows
    dup = live & ~is_owner
    dup_count = jnp.sum(dup.astype(jnp.int64))
    # Build per-slot chains with a few scatter passes: next_of[r] = min row in
    # same slot greater than r. Do it by scatter-min of row into "succ" keyed
    # by (slot, predecessor): iterate log-free via sort-based approach:
    # sort (slot, row) pairs; successor in sorted order with same slot.
    from starrocks_tpu.ops import fast_sort as fs
    slot_sortkey = jnp.where(live, slots, capacity)  # dead rows sort last
    order = fs.argsort_packed(slot_sortkey.astype(jnp.uint64),
                              fs._bl(capacity))
    sorted_slots = slot_sortkey[order]
    sorted_rows = rows[order]
    sorted_live = live[order]
    nxt = jnp.roll(sorted_rows, -1)
    nxt_slot = jnp.roll(sorted_slots, -1)
    nxt_live = jnp.roll(sorted_live, -1)
    not_last = jnp.arange(n) < (n - 1)
    has_next = (nxt_slot == sorted_slots) & nxt_live & sorted_live & not_last
    next_row = jnp.full((n,), _NO_OWNER, jnp.int32)
    next_row = next_row.at[sorted_rows].set(jnp.where(has_next, nxt, _NO_OWNER))
    return BuildTable(owner, next_row, dup_count, overflow, key_cols, capacity)


# longest probe walk a lookup tolerates before declaring the table too
# clustered and asking for a capacity retry. Without a tight cap, probing a
# COMPLETELY FULL table (build overflowed) spins `capacity` iterations of
# full-width gathers — measured: a 32k-iteration x 2M-lane loop ran long
# enough that the TPU worker was killed mid-query (TPC-H q10).
PROBE_CAP = 512


def _probe_slots(bt: BuildTable, probe_cols: Sequence[Column], probe_live: jnp.ndarray):
    """Find each probe row's first matching build row (or none).

    Returns (matched, match_row, probe_overflow); probe_overflow means the
    walk gave up (build table overflowed or pathologically clustered) and
    the caller must retry with a larger capacity."""
    cap = bt.capacity
    n = probe_cols[0].data.shape[0]
    h = hashing.hash_columns(probe_cols)
    slot = (h & jnp.uint64(cap - 1)).astype(jnp.int32)
    # NULL probe keys never match: resolve them immediately
    nullkey = jnp.zeros((n,), jnp.bool_)
    for c in probe_cols:
        if c.valid is not None:
            nullkey = nullkey | ~c.valid
    unresolved = probe_live & ~nullkey
    matched = jnp.zeros((n,), jnp.bool_)
    match_row = jnp.zeros((n,), jnp.int32)
    iter_cap = min(cap, PROBE_CAP)

    def cond(state):
        unresolved, _, _, _, t = state
        return jnp.any(unresolved) & (t < iter_cap) & ~bt.overflow

    def body(state):
        unresolved, matched, match_row, slot, t = state
        owner_row = bt.owner[slot]
        empty = owner_row == _NO_OWNER
        safe = jnp.where(empty, 0, owner_row)
        eq = key_equal_cross(probe_cols, bt.key_cols, safe) & ~empty
        found = unresolved & eq
        matched = matched | found
        match_row = jnp.where(found, safe, match_row)
        unresolved = unresolved & ~eq & ~empty
        slot = jnp.where(unresolved, (slot + 1) & (cap - 1), slot)
        return unresolved, matched, match_row, slot, t + 1

    unresolved, matched, match_row, _, _ = jax.lax.while_loop(
        cond, body, (unresolved, matched, match_row, slot, jnp.int32(0)))
    probe_ovf = bt.overflow | jnp.any(unresolved)
    return matched, match_row, probe_ovf


def lookup(bt: BuildTable, probe_cols: Sequence[Column], probe_live: jnp.ndarray):
    """Unique-build lookup join core: returns (matched (Np,), build_row (Np,),
    overflow flag — retry with larger capacity when set).

    With duplicate build keys this returns the first row of each chain (used
    by semi/anti); use probe_expand for full many-match output.
    """
    return _probe_slots(bt, probe_cols, probe_live)


def build_match_flags(first_match, matched, nbuild: int):
    """Mark build rows reached by any probe row (right/full-outer support,
    the analog of build_match_index, join_hash_map.h:181). Works for both the
    lookup path (first_match/matched per probe row) and the expansion path
    (build_idx/pair_valid per output pair)."""
    flags = jnp.zeros((nbuild,), jnp.bool_)
    flags = flags.at[jnp.where(matched, first_match, nbuild)].set(True, mode="drop")
    return flags


def probe_expand(
    bt: BuildTable,
    probe_cols: Sequence[Column],
    probe_live: jnp.ndarray,
    fanout_cap: int,
):
    """Many-match probe: emit up to fanout_cap matches per probe row.

    Returns (probe_idx (Np*f,), build_idx (Np*f,), pair_valid (Np*f,),
    truncated flag). Static output shape Np*fanout_cap; exec layer retries
    with larger cap if truncated (counting-sort two-pass analog,
    exchange_sink_operator.cpp:595-610).
    """
    n = probe_cols[0].data.shape[0]
    matched, first_row, probe_ovf = _probe_slots(bt, probe_cols, probe_live)
    cur = jnp.where(matched, first_row, _NO_OWNER)
    outs_build = []
    outs_valid = []
    overflowed = jnp.zeros((n,), jnp.bool_)
    for k in range(fanout_cap):
        valid = cur != _NO_OWNER
        outs_build.append(jnp.where(valid, cur, 0))
        outs_valid.append(valid)
        nxt = bt.next_row[jnp.where(valid, cur, 0)]
        cur = jnp.where(valid, nxt, _NO_OWNER)
    truncated = jnp.any(cur != _NO_OWNER) | probe_ovf
    build_idx = jnp.stack(outs_build, axis=1).reshape(-1)
    pair_valid = jnp.stack(outs_valid, axis=1).reshape(-1)
    probe_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), fanout_cap)
    return probe_idx, build_idx, pair_valid, truncated
