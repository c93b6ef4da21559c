"""Sort-merge join lookup.

The TPU-native replacement for large hash-join probes. Measured on v5e,
XLA gathers/scatters run at ~10-55M ops/s while multi-operand sorts run at
160-320M rows/s and blocked segmented scans at ~2B rows/s — so for large
build sides a sort-merge plan beats open-addressing probing:

  1. concatenate build+probe key rows, tagged build=0 / probe=1
  2. ONE lax.sort, keys = (dead-last flag, key columns..., tag) — build rows
     sort immediately before the probe rows with equal keys
  3. segmented propagate-last carries each key run's build row id to its
     probe rows (blocked associative scan, no gathers)
  4. two scatters return (matched, build_row) to probe row space

This is the same trade the reference's partitioned hash join (P10,
hash_join_components.h:85) makes — restructure for memory behavior — taken
to its TPU conclusion. Used by exec.plan.HashJoin for builds above
MERGE_THRESHOLD; small builds keep the open-addressing lookup (the table
fits cache and gathers are cheap).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from starrocks_tpu.column.column import Column
from starrocks_tpu.ops import scan_utils as su

MERGE_THRESHOLD = 1 << 16


def _merge_vrange(a: Column, b: Column):
    if a.vrange is None or b.vrange is None:
        return None
    return (min(a.vrange[0], b.vrange[0]), max(a.vrange[1], b.vrange[1]))


def merge_lookup(
    build_cols: Sequence[Column],
    build_live: jnp.ndarray,
    probe_cols: Sequence[Column],
    probe_live: jnp.ndarray,
):
    """Returns (matched bool (Np,), build_row int32 (Np,)).

    Matches the contract of hash_join.lookup: with duplicate build keys an
    arbitrary (deterministic) matching row is reported — callers needing all
    matches use probe_expand. NULL keys never match.
    """
    nb = build_cols[0].data.shape[0]
    np_ = probe_cols[0].data.shape[0]
    n = nb + np_

    bl = build_live
    pl = probe_live
    for c in build_cols:
        if c.valid is not None:
            bl = bl & c.valid
    for c in probe_cols:
        if c.valid is not None:
            pl = pl & c.valid

    from starrocks_tpu.ops import fast_sort as fs

    part_live = jnp.concatenate([bl, pl])
    # sort (dead, keys..., tag) via bit-packed passes (fast_sort docstring:
    # a variadic 1-D lax.sort costs minutes of TPU compile time)
    norm: list = [(jnp.where(part_live, jnp.uint64(0), jnp.uint64(1)), 1)]
    key_datas = []
    for bc, pc in zip(build_cols, probe_cols):
        data = jnp.concatenate([bc.data, pc.data.astype(bc.data.dtype)])
        key_datas.append(data)
        merged = Column(data, None, bc.dtype, bc.dict_id,
                        _merge_vrange(bc, pc))
        norm.extend(fs.normalize_keys(merged))
    tag = jnp.concatenate([
        jnp.zeros((nb,), jnp.int32), jnp.ones((np_,), jnp.int32)])
    rowid = jnp.concatenate([
        jnp.arange(nb, dtype=jnp.int32), jnp.arange(np_, dtype=jnp.int32)])
    norm.append((tag.astype(jnp.uint64), 1))

    perm = fs.stable_argsort(norm, n)
    s_dead = ~part_live[perm]
    s_live = ~s_dead
    s_tag = tag[perm]
    s_rid = rowid[perm]

    # key-run starts (tag excluded: build+probe with equal keys share a run;
    # the live flag participates — dead-row bytes are arbitrary)
    start = su.segment_starts_from_neq(
        (s_dead, None), *[(d[perm], None) for d in key_datas])

    bval = jnp.where((s_tag == 0) & s_live, s_rid, jnp.int32(-1))
    prop = su.seg_scan(
        lambda a, b: jnp.where(b >= 0, b, a), start, bval, jnp.int32(-1))

    is_probe = s_tag == 1
    matched_s = s_live & is_probe & (prop >= 0)
    idx = jnp.where(is_probe, s_rid, np_)  # build entries dropped
    matched = jnp.zeros((np_,), jnp.bool_).at[idx].set(matched_s, mode="drop")
    build_row = jnp.zeros((np_,), jnp.int32).at[idx].set(
        jnp.where(prop >= 0, prop, 0), mode="drop")
    return matched, build_row
