"""Vectorized hash aggregation (GROUP BY).

Analog of StarRocks' Aggregator / AggHashMapVariant
(be/src/exec/aggregator.cpp:971,1357; be/src/exec/aggregate/agg_hash_map.h),
redesigned for XLA's static-shape SPMD model:

- The hash table is a fixed-capacity open-addressing table in device memory
  (capacity chosen by the planner from stats; on overflow the host retries
  with 4x capacity — the analog of the reference's two-level conversion,
  aggregator.cpp:1132).
- Insertion is the *scatter-min claim* scheme: all unresolved rows scatter
  their row-id into their probe slot with a `min` reduction; the winner owns
  the slot, everyone compares their key tuple against the owner's and either
  resolves or moves to the next slot. All rows with equal keys probe in
  lockstep (their decisions depend only on (key, slot, table state)), so a
  key can never own two slots. Deterministic — only add/min/max scatters.
- Aggregate state update is one scatter-add/min/max per aggregate over all
  rows at once (the analog of compute_batch_agg_states, aggregator.cpp:858).
- Group keys are NOT packed/hashed into the table: each key column keeps its
  own array and equality compares the full tuple, so results are exact for
  arbitrary key types (vs. the reference's 70 specialized map variants,
  agg_hash_variant.h:35 — XLA specializes per dtype for free).

Output is a `capacity`-row Table whose `live` mask marks owned slots.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops import hashing

_NO_OWNER = jnp.iinfo(jnp.int32).max


@dataclasses.dataclass(frozen=True)
class AggSpec:
    fn: str                    # sum | count | min | max | count_star | any
    col: Optional[str]         # input column (None for count_star)
    out: str                   # output column name


def build_group_slots(
    key_cols: Sequence[Column],
    live: jnp.ndarray,
    capacity: int,
    max_probes: int = 1024,
):
    """Assign each live row a group slot in [0, capacity).

    Returns (slots int32 (N,), owner int32 (capacity,), overflow bool scalar).
    owner[s] = row index that owns slot s, or _NO_OWNER.
    """
    n = key_cols[0].data.shape[0]
    cap = capacity
    assert cap & (cap - 1) == 0, "capacity must be a power of two"
    h = hashing.hash_columns(key_cols)
    slot0 = (h & jnp.uint64(cap - 1)).astype(jnp.int32)
    rows = jnp.arange(n, dtype=jnp.int32)

    def cond(state):
        _, _, _, unresolved, t = state
        return jnp.any(unresolved) & (t < max_probes)

    def body(state):
        slot, owner, frozen, unresolved, t = state
        can_claim = unresolved & ~frozen[slot]
        owner = owner.at[slot].min(jnp.where(can_claim, rows, _NO_OWNER))
        owner_row = owner[slot]
        has_owner = owner_row != _NO_OWNER
        safe_owner = jnp.where(has_owner, owner_row, 0)
        match = has_owner & hashing.key_equal_at(key_cols, safe_owner)
        resolved_now = unresolved & match
        unresolved = unresolved & ~match
        frozen = frozen | (owner != _NO_OWNER)
        slot = jnp.where(unresolved, (slot + 1) & (cap - 1), slot)
        return slot, owner, frozen, unresolved, t + 1

    owner = jnp.full((cap,), _NO_OWNER, jnp.int32)
    frozen = jnp.zeros((cap,), jnp.bool_)
    state = (slot0, owner, frozen, live, jnp.int32(0))
    slot, owner, frozen, unresolved, _ = jax.lax.while_loop(cond, body, state)
    overflow = jnp.any(unresolved)
    return slot, owner, overflow


def _agg_init(spec: AggSpec, in_col: Optional[Column], capacity: int):
    if spec.fn in ("count", "count_star"):
        return jnp.zeros((capacity,), jnp.int64)
    d = in_col.data
    if spec.fn == "sum":
        z = jnp.zeros((capacity,), jnp.int64 if not jnp.issubdtype(d.dtype, jnp.floating) else d.dtype)
        return z
    if spec.fn == "min":
        return jnp.full((capacity,), _type_max(d.dtype), d.dtype)
    if spec.fn == "max":
        return jnp.full((capacity,), _type_min(d.dtype), d.dtype)
    if spec.fn == "any":
        return jnp.zeros((capacity,), d.dtype)
    raise ValueError(spec.fn)


def _type_max(dtype):
    return jnp.inf if jnp.issubdtype(dtype, jnp.floating) else jnp.iinfo(dtype).max


def _type_min(dtype):
    return -jnp.inf if jnp.issubdtype(dtype, jnp.floating) else jnp.iinfo(dtype).min


def _agg_out_dtype(spec: AggSpec, in_dtype: Optional[dt.DataType]) -> dt.DataType:
    if spec.fn in ("count", "count_star"):
        return dt.INT64
    if spec.fn == "sum":
        if in_dtype.is_decimal:
            return in_dtype
        if in_dtype.kind is dt.TypeKind.FLOAT64:
            return dt.FLOAT64
        return dt.INT64
    return in_dtype  # min/max/any


def hash_groupby(
    table: Table,
    key_names: Sequence[str],
    aggs: Sequence[AggSpec],
    capacity: int,
):
    """GROUP BY over a (possibly mask-filtered) table.

    Returns (result Table with key+agg columns, live mask = owned slots,
    overflow flag). Host wrapper `groupby_with_retry` handles overflow.
    """
    key_cols = [table[k] for k in key_names]
    live = table.live_mask()
    slots, owner, overflow = build_group_slots(key_cols, live, capacity)

    out_cols: dict[str, Column] = {}
    has_owner = owner != _NO_OWNER
    safe_owner = jnp.where(has_owner, owner, 0)
    for k in key_names:
        out_cols[k] = table[k].gather(safe_owner, has_owner if table[k].valid is not None else None)
        # keys of unowned slots are garbage; live mask excludes them
    for spec in aggs:
        in_col = table[spec.col] if spec.col is not None else None
        acc = _agg_init(spec, in_col, capacity)
        if spec.fn == "count_star":
            contrib = live
            acc = acc.at[slots].add(contrib.astype(jnp.int64))
            valid = None
        else:
            cv = in_col.validity() if in_col.valid is not None else None
            contrib_mask = live if cv is None else (live & cv)
            if spec.fn == "count":
                acc = acc.at[slots].add(contrib_mask.astype(jnp.int64))
                valid = None
            elif spec.fn == "sum":
                vals = in_col.data.astype(acc.dtype)
                acc = acc.at[slots].add(jnp.where(contrib_mask, vals, 0))
                # SQL: sum over empty/all-null group = NULL
                nn = jnp.zeros((capacity,), jnp.int64).at[slots].add(contrib_mask.astype(jnp.int64))
                valid = nn > 0
            elif spec.fn == "min":
                vals = jnp.where(contrib_mask, in_col.data, _type_max(in_col.data.dtype))
                acc = acc.at[slots].min(vals)
                nn = jnp.zeros((capacity,), jnp.int64).at[slots].add(contrib_mask.astype(jnp.int64))
                valid = nn > 0
            elif spec.fn == "max":
                vals = jnp.where(contrib_mask, in_col.data, _type_min(in_col.data.dtype))
                acc = acc.at[slots].max(vals)
                nn = jnp.zeros((capacity,), jnp.int64).at[slots].add(contrib_mask.astype(jnp.int64))
                valid = nn > 0
            elif spec.fn == "any":
                acc = acc.at[slots].max(jnp.where(contrib_mask, in_col.data, _type_min(in_col.data.dtype)))
                valid = None
            else:
                raise ValueError(spec.fn)
        out_dtype = _agg_out_dtype(spec, in_col.dtype if in_col is not None else None)
        dict_id = in_col.dict_id if (in_col is not None and in_col.dtype.is_string) else 0
        out_cols[spec.out] = Column(
            data=acc.astype(out_dtype.jnp_dtype), valid=valid,
            dtype=out_dtype, dict_id=dict_id,
        )
    result = Table(columns=out_cols, live=has_owner)
    return result, overflow


def groupby_with_retry(table: Table, key_names, aggs, est_groups: int, jit_fn=None):
    """Host wrapper: run jitted group-by, grow capacity x4 on overflow.

    The analog of StarRocks' two-level map conversion / streaming preagg
    passthrough decisions (aggregator.cpp:770,1132) — here the only dynamic
    decision is capacity, and it costs a recompile (rare, cached after)."""
    cap = _next_pow2(max(16, int(est_groups * 2)))
    nmax = table.nrows
    fn = jit_fn or jax.jit(hash_groupby, static_argnums=(1, 2, 3))
    while True:
        result, overflow = fn(table, tuple(key_names), tuple(aggs), cap)
        if not bool(overflow):
            return result
        if cap > 4 * _next_pow2(nmax + 1):
            raise RuntimeError("group-by capacity runaway; keys unresolvable")
        cap *= 4


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p
