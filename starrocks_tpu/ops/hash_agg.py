"""Vectorized aggregation (GROUP BY).

Analog of StarRocks' Aggregator / AggHashMapVariant
(be/src/exec/aggregator.cpp:971,1357; be/src/exec/aggregate/agg_hash_map.h),
redesigned around what TPU hardware is actually fast at. Measured on v5e:
XLA scatter is ~10M updates/s for int64 (serialized read-modify-write), while
sorts run at 320M rows/s and blocked prefix scans at ~2B rows/s. So, unlike
the reference's hash-map-everything design, this engine picks per-query
between two scatter-free strategies (the 70 AggHashMapVariant dispatch
collapses to two):

- `dense_groupby`: when every key column carries static (lo,hi) bounds
  (dict-coded strings, catalog zone maps) whose span product is small, keys
  map directly to slots (the reference's direct-mapping variant,
  join_hash_map.h:422) and every aggregate is a masked whole-column
  reduction per slot — XLA fuses all G x n_aggs reductions into ONE pass
  over the data (HBM-bandwidth bound, ~10B rows/s class).

- `sorted_groupby`: rows multi-key sort (one lax.sort moving agg inputs as
  payload operands), then segmented scans (blocked prefix sums / min-max
  propagation, ops/scan_utils) produce every aggregate with zero gathers or
  scatters. Output stays in sorted row space: `live` marks each segment's
  last row. No hash table -> no capacity, no overflow retries.

`build_group_slots` (the deterministic scatter-min-claim open-addressing
insert) remains for the hash-join build path, where a slot table is the
point.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops import hashing
from starrocks_tpu.ops import scan_utils as su

_NO_OWNER = jnp.iinfo(jnp.int32).max

DENSE_LIMIT = 64  # max slots for the masked-reduction dense path


VAR_FNS = ("var_pop", "var_samp", "stddev_pop", "stddev_samp")
PCTL_FNS = ("percentile_cont", "percentile_disc")
# HyperLogLog approximate distinct count (the reference's HLL sketch,
# be/src/types/hll.h): register-array states are max-mergeable, which makes
# them psum-class collectives distributed (lax.pmax over the register array)
HLL_FNS = ("approx_count_distinct",)
HLL_P_GROUPED = 10      # 1024 registers per group, ~3.2% std error
HLL_P_GLOBAL = 14       # 16384 registers, ~0.8% std error


@dataclasses.dataclass(frozen=True)
class AggSpec:
    fn: str                    # sum | count | min | max | count_star | any |
                               # var_pop | var_samp | stddev_pop | stddev_samp |
                               # percentile_cont | percentile_disc
    col: Optional[str]         # input column (None for count_star)
    out: str                   # output column name
    param: Optional[float] = None  # percentile fraction q in [0, 1]


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _type_max(dtype):
    return jnp.inf if jnp.issubdtype(dtype, jnp.floating) else jnp.iinfo(dtype).max


def _type_min(dtype):
    return -jnp.inf if jnp.issubdtype(dtype, jnp.floating) else jnp.iinfo(dtype).min


def _agg_out_dtype(spec: AggSpec, in_dtype: Optional[dt.DataType]) -> dt.DataType:
    if spec.fn in ("count", "count_star"):
        return dt.INT64
    if spec.fn in VAR_FNS or spec.fn == "percentile_cont":
        return dt.FLOAT64
    if spec.fn == "sum":
        if in_dtype.is_decimal:
            return in_dtype
        if in_dtype.kind is dt.TypeKind.FLOAT64:
            return dt.FLOAT64
        return dt.INT64
    return in_dtype  # min/max/any/percentile_disc


def _as_float(v, in_dtype: dt.DataType):
    """Numeric value as float64 in natural units (decimals descaled)."""
    f = v.astype(jnp.float64)
    if in_dtype.is_decimal:
        f = f / (10.0 ** in_dtype.scale)
    return f


def _variance_from_moments(fn, s1, s2, nn):
    """var/stddev from per-group sum, sum-of-squares, count (float64)."""
    nf = nn.astype(jnp.float64)
    m2 = jnp.maximum(s2 - s1 * s1 / jnp.maximum(nf, 1.0), 0.0)
    if fn.endswith("_pop"):
        data, ok = m2 / jnp.maximum(nf, 1.0), nn > 0
    else:
        data, ok = m2 / jnp.maximum(nf - 1.0, 1.0), nn > 1
    if fn.startswith("stddev"):
        data = jnp.sqrt(data)
    return data, ok


def _hll_reg_rho(c: Column, p: int):
    """Per-row HLL (register index, rank): register = top p bits of the
    64-bit value hash; rank = leading-zero count of the remaining bits + 1
    (capped), the hll.h rho."""
    from jax import lax
    h = hashing.hash_columns([c])
    reg = (h >> jnp.uint64(64 - p)).astype(jnp.int32)
    rem = h << jnp.uint64(p)
    rho = jnp.minimum(lax.clz(rem), 64 - p).astype(jnp.int32) + 1
    return reg, rho


def _hll_estimate(S, used, R):
    """HLL harmonic-mean estimate with the linear-counting small-range
    correction. S = sum over all R registers of 2^-M (empty registers
    contribute 1); used = count of nonempty registers."""
    alpha = 0.7213 / (1.0 + 1.079 / R)
    E = alpha * R * R / S
    zeros = (R - used).astype(jnp.float64)
    lc = R * jnp.log(R / jnp.maximum(zeros, 1.0))
    return jnp.where((E <= 2.5 * R) & (zeros > 0), lc, E)


def hll_registers(c: Column, mask, p: int = HLL_P_GLOBAL):
    """Register-max array (2^p,) int32 over masked rows — the mergeable HLL
    state (elementwise max merges; lax.pmax merges across devices)."""
    reg, rho = _hll_reg_rho(c, p)
    R = 1 << p
    idx = jnp.where(mask, reg, R)
    return jnp.zeros((R,), jnp.int32).at[idx].max(
        jnp.where(mask, rho, 0), mode="drop")


def hll_estimate_registers(regs):
    R = regs.shape[0]
    S = jnp.sum(jnp.exp2(-regs.astype(jnp.float64)))
    used = jnp.sum((regs > 0).astype(jnp.int64))
    return _hll_estimate(S, used, R)


# ---------------------------------------------------------------------------
# dense direct-mapping group-by
# ---------------------------------------------------------------------------

def dense_ranges(table: Table, key_names: Sequence[str], limit: int = DENSE_LIMIT):
    """Static (lo, span) per key if the dense path applies, else None."""
    ranges = []
    total = 1
    for k in key_names:
        c = table[k]
        if c.valid is not None or c.vrange is None:
            return None
        lo, hi = c.vrange
        span = hi - lo + 1
        if span <= 0:
            return None
        total *= span
        if total > limit:
            return None
        ranges.append((lo, span))
    return ranges


def dense_groupby(table: Table, key_names, aggs, ranges) -> Table:
    """Direct-mapped group-by: G = prod(spans) slots, masked reductions.

    XLA fuses the per-slot masked sums into a single pass over the input."""
    live = table.live_mask()
    n = table.nrows
    slot = jnp.zeros((n,), jnp.int32)
    strides = []
    stride = 1
    for (lo, span) in reversed(ranges):
        strides.append(stride)
        stride *= span
    strides = list(reversed(strides))
    G = stride
    for (kname, (lo, span), st) in zip(key_names, ranges, strides):
        slot = slot + (table[kname].data.astype(jnp.int32) - lo) * st

    cols: dict[str, Column] = {}
    # group key values, reconstructed from the slot index (no gathers)
    gidx = jnp.arange(G, dtype=jnp.int32)
    for (kname, (lo, span), st) in zip(key_names, ranges, strides):
        c = table[kname]
        vals = (lo + (gidx // st) % span).astype(c.dtype.jnp_dtype)
        cols[kname] = Column(vals, None, c.dtype, c.dict_id, c.vrange)

    counts_star = jnp.stack(
        [jnp.sum(jnp.where(live & (slot == g), 1, 0).astype(jnp.int64))
         for g in range(G)])
    for spec in aggs:
        in_col = table[spec.col] if spec.col is not None else None
        if spec.fn == "count_star":
            cols[spec.out] = Column(counts_star, None, dt.INT64)
            continue
        cv = live if in_col.valid is None else (live & in_col.valid)
        if spec.fn == "count":
            data = jnp.stack(
                [jnp.sum((cv & (slot == g)).astype(jnp.int64)) for g in range(G)])
            cols[spec.out] = Column(data, None, dt.INT64)
            continue
        v = in_col.data
        if spec.fn in VAR_FNS:
            vf = _as_float(v, in_col.dtype)
            s1 = jnp.stack(
                [jnp.sum(jnp.where(cv & (slot == g), vf, 0.0)) for g in range(G)])
            s2 = jnp.stack(
                [jnp.sum(jnp.where(cv & (slot == g), vf * vf, 0.0)) for g in range(G)])
            nn = jnp.stack(
                [jnp.sum((cv & (slot == g)).astype(jnp.int64)) for g in range(G)])
            data, ok = _variance_from_moments(spec.fn, s1, s2, nn)
            cols[spec.out] = Column(data, ok, dt.FLOAT64)
            continue
        if spec.fn == "sum":
            v64 = v.astype(jnp.int64) if not jnp.issubdtype(v.dtype, jnp.floating) else v
            data = jnp.stack(
                [jnp.sum(jnp.where(cv & (slot == g), v64, 0)) for g in range(G)])
        elif spec.fn in ("min", "any"):
            sent = _type_max(v.dtype)
            data = jnp.stack(
                [jnp.min(jnp.where(cv & (slot == g), v, sent)) for g in range(G)])
        elif spec.fn == "max":
            sent = _type_min(v.dtype)
            data = jnp.stack(
                [jnp.max(jnp.where(cv & (slot == g), v, sent)) for g in range(G)])
        else:
            raise ValueError(spec.fn)
        nn = jnp.stack([jnp.sum((cv & (slot == g)).astype(jnp.int64)) for g in range(G)])
        out_dtype = _agg_out_dtype(spec, in_col.dtype)
        cols[spec.out] = Column(
            data.astype(out_dtype.jnp_dtype), nn > 0, out_dtype,
            in_col.dict_id if in_col.dtype.is_string else 0)
    return Table(columns=cols, live=counts_star > 0)


# ---------------------------------------------------------------------------
# sort-based group-by
# ---------------------------------------------------------------------------

def sorted_groupby(table: Table, key_names, aggs) -> Table:
    """Sort by keys + segmented scans; output N rows, live = segment ends.

    The sort is ops/fast_sort.stable_argsort — keys bit-packed into (usually
    one) single-operand tiled sort pass; key/payload columns are then
    gathered by the permutation. A variadic 1-D lax.sort here would cost
    minutes of XLA compile time per query on TPU (fast_sort docstring)."""
    from starrocks_tpu.ops import fast_sort as fs

    n = table.nrows
    live = table.live_mask()
    # dead rows sort last — the live flag MUST lead: dead rows carry
    # arbitrary key bytes (e.g. shuffle padding zeros) that can equal a live
    # key, and the live->dead transition has to break the segment.
    norm: list = [(jnp.where(live, jnp.uint64(0), jnp.uint64(1)), 1)]
    key_cols = [table[k] for k in key_names]
    for c in key_cols:
        norm.extend(fs.normalize_keys(c, nulls_first=True))
    # bits that define a group segment: the dead flag + the key codes
    # (order-extras appended below do not split segments)
    seg_bits = sum(nb for _, nb in norm)
    # percentile inputs participate in the sort ORDER (value-sorted within
    # each group, NULLs last) but not in segment detection
    pctl_cols = {spec.col for spec in aggs
                 if spec.fn in PCTL_FNS and spec.col not in key_names}
    for name in sorted(pctl_cols):
        norm.extend(fs.normalize_keys(table[name], nulls_first=False))
    # HLL inputs sort by their hash REGISTER so per-(group, register) rank
    # maxima are segment scans. One HLL column per aggregate (nested
    # orderings would fragment each other's register runs) — the planner
    # splits multiple approx-distincts into separate rejoined aggregates.
    hll_cols = {spec.col for spec in aggs if spec.fn in HLL_FNS}
    if hll_cols:
        if len(hll_cols) > 1 or pctl_cols:
            raise ValueError(
                "one approx_count_distinct column per aggregate (and not "
                "mixed with percentiles); the planner splits these")
        (hname,) = hll_cols
        hreg0, _ = _hll_reg_rho(table[hname], HLL_P_GROUPED)
        norm.append((hreg0.astype(jnp.uint64), HLL_P_GROUPED))

    perm, codes, total_bits = fs.stable_argsort_with_codes(norm, n)

    # ONE stacked row gather moves live + keys + every payload column
    # (Table.gather packs them into u64 lanes; k separate gathers cost
    # ~15ns/row EACH on v5e — the dominant cost of the old formulation)
    payload_names = sorted({sp.col for sp in aggs
                            if sp.col is not None
                            and sp.col not in key_names})
    sub = Table({**{k: table[k] for k in key_names},
                 **{pn: table[pn] for pn in payload_names}}, live=live)
    g_t = sub.gather(perm)
    live_s = g_t.live_mask()

    # key columns: NULL rows' data zeroed so the NULL group is one segment
    # under data+valid inequality
    cols: dict[str, Column] = {}
    for name in key_names:
        g = g_t[name]
        if g.valid is not None:
            g = Column(jnp.where(g.valid, g.data, jnp.zeros((), g.data.dtype)),
                       g.valid, g.dtype, g.dict_id, g.vrange)
        cols[name] = g

    if codes is not None:
        # segment starts by adjacent compare of the sorted (dead|keys)
        # code bits — the extras (pctl/hll order keys) shift off
        kc = codes >> jnp.uint64(total_bits - seg_bits)
        start = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                 kc[1:] != kc[:-1]])
    else:
        start = su.segment_starts_from_neq(
            (live_s, None), *[(cols[k].data, cols[k].valid)
                              for k in key_names])
    is_end = jnp.roll(start, -1).at[-1].set(True)
    live_out = is_end & live_s

    def payload_of(spec):
        c = cols[spec.col] if spec.col in key_names else g_t[spec.col]
        return c.data, c.valid

    seg_count_star = su.seg_sum(start, live_s.astype(jnp.int64))
    for spec in aggs:
        if spec.fn == "count_star":
            cols[spec.out] = Column(seg_count_star, None, dt.INT64)
            continue
        v, vvalid = payload_of(spec)
        mask = live_s if vvalid is None else (live_s & vvalid)
        nn = su.seg_sum(start, mask.astype(jnp.int64))
        if spec.fn == "count":
            cols[spec.out] = Column(nn, None, dt.INT64)
            continue
        in_col_ = table[spec.col]
        if spec.fn in HLL_FNS:
            # rows are (group, register)-sorted: per-register rank maxima are
            # nested segment scans; each register-run end contributes 2^-max
            # to the group's harmonic sum (hll.h estimate, distributed-free)
            R = 1 << HLL_P_GROUPED
            hc = Column(v, vvalid, in_col_.dtype, in_col_.dict_id)
            reg, rho = _hll_reg_rho(hc, HLL_P_GROUPED)
            regseg = start | (reg != jnp.roll(reg, 1))
            regseg = regseg.at[0].set(True)
            maxrho = su.seg_scan(jnp.maximum, regseg,
                                 jnp.where(mask, rho, 0),
                                 jnp.zeros((), jnp.int32))
            reg_n = su.seg_sum(regseg, mask.astype(jnp.int64))
            reg_end = jnp.roll(regseg, -1).at[-1].set(True)
            has = reg_end & (reg_n > 0)
            S_used = su.seg_sum(start, jnp.where(has, jnp.exp2(
                -maxrho.astype(jnp.float64)), 0.0))
            used = su.seg_sum(start, has.astype(jnp.int64))
            S = S_used + (R - used).astype(jnp.float64)
            E = _hll_estimate(S, used, R)
            data = jnp.where(nn > 0, jnp.round(E), 0.0).astype(jnp.int64)
            cols[spec.out] = Column(data, None, dt.INT64)
            continue
        if spec.fn in VAR_FNS:
            vf = _as_float(v, in_col_.dtype)
            s1 = su.seg_sum(start, jnp.where(mask, vf, 0.0))
            s2 = su.seg_sum(start, jnp.where(mask, vf * vf, 0.0))
            data, ok = _variance_from_moments(spec.fn, s1, s2, nn)
            cols[spec.out] = Column(data, ok, dt.FLOAT64)
            continue
        if spec.fn in PCTL_FNS:
            # values are sorted (NULLs last) within each segment; pick by rank
            q = float(spec.param if spec.param is not None else 0.5)
            rank = su.seg_sum(start, mask.astype(jnp.int64)) - 1
            total = su.seg_broadcast_from_end(is_end, nn, jnp.zeros((), jnp.int64))
            # single-row select by rank: max-propagate within the segment
            # (exactly one row matches; segmented SUM of floats would pick up
            # prefix-sum rounding, seg_sum's exclusive-base subtraction)
            def pick(hit, vals):
                sent = _type_min(vals.dtype)
                return su.seg_scan(jnp.maximum, start,
                                   jnp.where(hit, vals, sent),
                                   jnp.asarray(sent, vals.dtype))
            if spec.fn == "percentile_disc":
                tgt = jnp.maximum(jnp.ceil(q * total.astype(jnp.float64)) - 1, 0
                                  ).astype(jnp.int64)
                data = pick(mask & (rank == tgt), v)
                out_dtype = _agg_out_dtype(spec, in_col_.dtype)
                cols[spec.out] = Column(
                    data.astype(out_dtype.jnp_dtype), total > 0, out_dtype,
                    in_col_.dict_id if in_col_.dtype.is_string else 0)
                continue
            vf = _as_float(v, in_col_.dtype)
            t = q * jnp.maximum(total.astype(jnp.float64) - 1.0, 0.0)
            lo, hi = jnp.floor(t).astype(jnp.int64), jnp.ceil(t).astype(jnp.int64)
            vlo = pick(mask & (rank == lo), vf)
            vhi = pick(mask & (rank == hi), vf)
            data = vlo + (vhi - vlo) * (t - jnp.floor(t))
            cols[spec.out] = Column(data, total > 0, dt.FLOAT64)
            continue
        if spec.fn == "sum":
            v64 = v.astype(jnp.int64) if not jnp.issubdtype(v.dtype, jnp.floating) else v
            data = su.seg_sum(start, jnp.where(mask, v64, 0))
        elif spec.fn in ("min", "any"):
            sent = _type_max(v.dtype)
            data = su.seg_scan(jnp.minimum, start, jnp.where(mask, v, sent),
                               jnp.asarray(sent, v.dtype))
        elif spec.fn == "max":
            sent = _type_min(v.dtype)
            data = su.seg_scan(jnp.maximum, start, jnp.where(mask, v, sent),
                               jnp.asarray(sent, v.dtype))
        else:
            raise ValueError(spec.fn)
        in_col = table[spec.col]
        out_dtype = _agg_out_dtype(spec, in_col.dtype)
        cols[spec.out] = Column(
            data.astype(out_dtype.jnp_dtype), nn > 0, out_dtype,
            in_col.dict_id if in_col.dtype.is_string else 0)
    return Table(columns=cols, live=live_out)


def groupby(table: Table, key_names: Sequence[str], aggs: Sequence[AggSpec]) -> Table:
    """GROUP BY dispatcher: dense direct-mapping when static key ranges are
    small (the AggHashMapVariant phase/width dispatch analog), else
    sort-based. Pure function of the table; no capacities, no retries."""
    ranges = dense_ranges(table, key_names)
    if ranges is not None and not any(s.fn in PCTL_FNS or s.fn in HLL_FNS
                                      for s in aggs):
        return dense_groupby(table, key_names, aggs, ranges)
    return sorted_groupby(table, key_names, aggs)


# ---------------------------------------------------------------------------
# deterministic open-addressing insert (used by the hash-join build)
# ---------------------------------------------------------------------------

def build_group_slots(
    key_cols: Sequence[Column],
    live: jnp.ndarray,
    capacity: int,
    max_probes: int = 1024,
):
    """Assign each live row a slot in [0, capacity) via scatter-min claims.

    All rows with equal keys probe in lockstep (their decisions depend only
    on (key, slot, table state)), so a key can never own two slots.
    Deterministic — only min scatters. Returns (slots, owner, overflow)."""
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


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p
