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
# probe sides at least this large take the merge path regardless of build
# size: the open-addressing probe loop pays per-iteration full-probe-width
# gathers (~15ns/row/iteration on v5e), so a 2M-probe x 32k-build join
# costs ~3x a sort-merge of the same inputs
MERGE_PROBE_ROWS = 1 << 20


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
    # sort (dead, keys...) via bit-packed passes (fast_sort docstring:
    # a variadic 1-D lax.sort costs minutes of TPU compile time). No tag
    # key: build rows occupy positions < nb of the concatenation, so the
    # STABLE rowid tiebreak already orders build before probe within a run.
    norm: list = [(jnp.where(part_live, jnp.uint64(0), jnp.uint64(1)), 1)]
    key_datas = []
    for bc, pc in zip(build_cols, probe_cols):
        data = jnp.concatenate([bc.data, pc.data.astype(bc.data.dtype)])
        key_datas.append(data)
        merged = Column(data, None, bc.dtype, bc.dict_id,
                        _merge_vrange(bc, pc))
        norm.extend(fs.normalize_keys(merged))

    perm, codes, _ = fs.stable_argsort_with_codes(norm, n)
    is_probe = perm >= nb
    s_rid = jnp.where(is_probe, perm - nb, perm).astype(jnp.int32)
    s_live = part_live[perm] if codes is None else ~_dead_bit(codes, norm)
    if codes is not None:
        # run starts by adjacent code compare — zero gathers
        start = jnp.concatenate([
            jnp.ones((1,), jnp.bool_), codes[1:] != codes[:-1]])
    else:
        start = su.segment_starts_from_neq(
            (~s_live, None), *[(d[perm], None) for d in key_datas])

    bval = jnp.where(~is_probe & s_live, s_rid, jnp.int32(-1))
    prop = su.seg_scan(
        lambda a, b: jnp.where(b >= 0, b, a), start, bval, jnp.int32(-1))

    matched_s = s_live & is_probe & (prop >= 0)
    # return to probe row order WITHOUT scatters (XLA scatter runs ~140ns
    # per update on v5e — one more packed sort is ~5x cheaper): pack
    # (probe rowid | matched | build_row) and sort; build entries carry
    # rowid np_ and fall off the tail.
    rb = fs._bl(max(nb - 1, 1))
    idx = jnp.where(is_probe, s_rid, np_).astype(jnp.uint64)
    code2 = ((idx << jnp.uint64(rb + 1))
             | (matched_s.astype(jnp.uint64) << jnp.uint64(rb))
             | jnp.where(prop >= 0, prop, 0).astype(jnp.uint64))
    s2 = fs.sort_packed(code2)[:np_]
    matched = ((s2 >> jnp.uint64(rb)) & jnp.uint64(1)) != 0
    build_row = (s2 & jnp.uint64((1 << rb) - 1)).astype(jnp.int32)
    return matched, build_row


def _dead_bit(codes: jnp.ndarray, norm) -> jnp.ndarray:
    """The dead-last flag is norm[0] (most significant key bit)."""
    total = sum(nb for _, nb in norm)
    return ((codes >> jnp.uint64(total - 1)) & jnp.uint64(1)) != 0
