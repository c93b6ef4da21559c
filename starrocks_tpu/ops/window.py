"""Window / analytic function evaluation.

Analog of StarRocks' Analytor (be/src/exec/analytor.h:52, analytic_node.cpp),
redesigned for XLA: instead of frame-by-frame evaluation over sorted chunk
runs, rows are sorted by (partition, order) once, per-partition results are
computed with segmented scans (cumsum + segment-start gather — pure
vectorized ops), and scattered back through the inverse permutation. All
static shapes; dead rows sort last and are excluded via masks.

Supported functions:
  row_number, rank, dense_rank, percent_rank, cume_dist, ntile(n),
  lag/lead(col, offset), first_value/last_value,
  sum/min/max/count/avg over the whole partition, or as a running
  (unbounded-preceding) frame when `running=True` (`peers=True` gives
  RANGE-frame semantics: order-by ties share the frame end).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops import scan_utils as su
from starrocks_tpu.ops.sort import SortKey, sort_permutation


@dataclasses.dataclass(frozen=True)
class WindowSpec:
    fn: str                      # row_number | rank | dense_rank | percent_rank
                                 # | cume_dist | ntile | lag | lead
                                 # | first_value | last_value
                                 # | sum | min | max | count | avg
    col: Optional[str]           # input column (None for row_number/rank/count(*))
    out: str
    running: bool = False        # unbounded-preceding frame instead of whole partition
    peers: bool = False          # RANGE frame: order-by ties share the frame end
    offset: int = 1              # lag/lead distance
    param: Optional[int] = None  # ntile bucket count
    # bounded ROWS frame (p, f): p rows preceding .. f rows following the
    # current row (either may be None for unbounded; negative values shift
    # the frame edge past the current row). Overrides running/peers.
    # The general-frame half of the Analytor (be/src/exec/analytor.h:52):
    # sum/count/avg resolve by prefix-sum difference, min/max by prefix /
    # suffix scans or a static shifted-window reduction.
    frame: Optional[tuple] = None
    # RANGE frame with numeric offsets (p, f) in ORDER-BY VALUE units:
    # frame = rows of the partition whose single order-key value lies in
    # [v - p, v + f] (direction-adjusted for DESC). Bounds resolve with a
    # per-row vectorized binary search inside the partition; min/max over
    # the variable-width bounds uses a sparse-table RMQ.
    range_frame: Optional[tuple] = None


def _segment_starts(sorted_cols, live_sorted):
    """Boolean: row starts a new partition (first live row of each group)."""
    n = live_sorted.shape[0]
    start = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    for c in sorted_cols:
        prev = jnp.roll(c.data, 1)
        neq = c.data != prev
        if c.valid is not None:
            pv = jnp.roll(c.valid, 1)
            neq = neq | (c.valid != pv)
        start = start | neq
    return start.at[0].set(True)


def _order_changes(sorted_cols):
    n = sorted_cols[0].data.shape[0]
    ch = jnp.zeros((n,), jnp.bool_)
    for c in sorted_cols:
        prev = jnp.roll(c.data, 1)
        ch = ch | (c.data != prev)
        if c.valid is not None:
            ch = ch | (c.valid != jnp.roll(c.valid, 1))
    return ch.at[0].set(True)


def window(
    table: Table,
    partition_by: Sequence[str],
    order_by: Sequence[SortKey],
    specs: Sequence[WindowSpec],
) -> Table:
    """Returns `table` with window result columns appended."""
    n = table.nrows
    keys = [SortKey(k) for k in partition_by] + list(order_by)
    perm = sort_permutation(table, keys)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    sorted_t = table.gather(perm)
    live_s = sorted_t.live_mask()
    part_cols = [sorted_t[k] for k in partition_by]
    start = _segment_starts(part_cols, live_s) if partition_by else \
        jnp.zeros((n,), jnp.bool_).at[0].set(True)
    # liveness changes also start a segment: dead rows sort last globally but
    # the first dead row could share key values with the last live partition —
    # it must not extend that partition's seg_end
    start = start | (live_s != jnp.roll(live_s, 1))
    start = start.at[0].set(True)

    # segment id and index of each row's segment start
    seg_id = su.prefix_sum(start.astype(jnp.int32)) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    seg_first = jnp.where(start, idx, 0)
    seg_first = jax_max_scan(seg_first)
    seg_end = _segment_end(seg_first, n)
    n_part = (seg_end - seg_first + 1).astype(jnp.int64)

    # order-by peer groups (RANGE frame granularity) and rank positions
    ordc = [sorted_t[k.name] for k in order_by]
    change = (_order_changes(ordc) | start) if order_by else start
    peer_first = jax_max_scan(jnp.where(change, idx, 0))
    peer_end = _segment_end(peer_first, n)
    rank_vals = (peer_first - seg_first + 1).astype(jnp.int64)

    out = table
    for spec in specs:
        if spec.fn == "row_number":
            vals = (idx - seg_first + 1).astype(jnp.int64)
            col = Column(vals[inv], None, dt.INT64)
        elif spec.fn == "rank":
            col = Column(rank_vals[inv], None, dt.INT64)
        elif spec.fn == "dense_rank":
            dr = su.prefix_sum(change.astype(jnp.int64))
            first_dr = jax_max_scan(jnp.where(start, dr, 0))
            vals = dr - first_dr + 1
            col = Column(vals[inv], None, dt.INT64)
        elif spec.fn == "percent_rank":
            denom = jnp.maximum(n_part - 1, 1).astype(jnp.float64)
            vals = jnp.where(n_part > 1,
                             (rank_vals - 1).astype(jnp.float64) / denom, 0.0)
            col = Column(vals[inv], None, dt.FLOAT64)
        elif spec.fn == "cume_dist":
            reach = (peer_end - seg_first + 1).astype(jnp.float64)
            vals = reach / jnp.maximum(n_part, 1).astype(jnp.float64)
            col = Column(vals[inv], None, dt.FLOAT64)
        elif spec.fn == "ntile":
            b = int(spec.param)
            k = (idx - seg_first).astype(jnp.int64)
            size = n_part // b
            rem = n_part % b
            big = rem * (size + 1)
            vals = jnp.where(
                k < big,
                k // jnp.maximum(size + 1, 1),
                rem + (k - big) // jnp.maximum(size, 1)) + 1
            col = Column(vals[inv], None, dt.INT64)
        elif spec.fn in ("lag", "lead"):
            c = sorted_t[spec.col]
            off = int(spec.offset)
            src = idx - off if spec.fn == "lag" else idx + off
            ok = (src >= seg_first) if spec.fn == "lag" else (src <= seg_end)
            srcc = jnp.clip(src, 0, n - 1)
            data = c.data[srcc]
            valid = ok & live_s[srcc]
            if c.valid is not None:
                valid = valid & c.valid[srcc]
            col = Column(data[inv], valid[inv], c.dtype, c.dict_id)
        elif spec.fn in ("first_value", "last_value"):
            c = sorted_t[spec.col]
            if spec.frame is not None or spec.range_frame is not None:
                if spec.range_frame is not None:
                    a, bnd, nonempty = _frame_bounds_range(
                        spec.range_frame, sorted_t, live_s, order_by[0],
                        seg_first, seg_end, peer_first, peer_end, n)
                else:
                    a, bnd, nonempty = _frame_bounds(spec.frame, idx,
                                                     seg_first, seg_end, n)
                at = a if spec.fn == "first_value" else bnd
                data = c.data[at]
                valid = nonempty & live_s[at]
                if c.valid is not None:
                    valid = valid & c.valid[at]
                col = Column(data[inv], valid[inv], c.dtype, c.dict_id)
                out = out.with_column(spec.out, col)
                continue
            if spec.fn == "first_value":
                at = seg_first
            elif spec.running and spec.peers:
                at = peer_end
            elif spec.running:
                at = idx
            else:
                at = seg_end
            data = c.data[at]
            valid = live_s[at] if c.valid is None else (live_s[at] & c.valid[at])
            col = Column(data[inv], valid[inv], c.dtype, c.dict_id)
        elif spec.frame is not None or spec.range_frame is not None:
            col = _framed_agg(spec, sorted_t, live_s, idx, seg_first, seg_end,
                              n, inv, order_by, peer_first, peer_end)
        else:
            c = sorted_t[spec.col] if spec.col else None
            if spec.fn == "count":
                contrib = (live_s if c is None else
                           (live_s & c.validity() if c.valid is not None else live_s)
                           ).astype(jnp.int64)
                running = _running_sum(contrib, seg_first)
                if spec.running and spec.peers:
                    vals = running[peer_end]
                elif spec.running:
                    vals = running
                else:
                    vals = _segment_total(running, seg_id, n, seg_first)
                col = Column(vals[inv], None, dt.INT64)
            elif spec.fn in ("sum", "avg"):
                mask = live_s if c.valid is None else (live_s & c.valid)
                data = jnp.where(mask, c.data.astype(jnp.int64)
                                 if not jnp.issubdtype(c.data.dtype, jnp.floating)
                                 else c.data, 0)
                running = _running_sum(data, seg_first)
                cnt = _running_sum(mask.astype(jnp.int64), seg_first)
                if spec.running and spec.peers:
                    running = running[peer_end]
                    cnt = cnt[peer_end]
                elif not spec.running:
                    running = _segment_total(running, seg_id, n, seg_first)
                    cnt = _segment_total(cnt, seg_id, n, seg_first)
                if spec.fn == "avg":
                    fv = running.astype(jnp.float64) / jnp.maximum(cnt, 1)
                    if c.dtype.is_decimal:
                        # decimal columns hold scaled ints; avg is a float
                        # in value units
                        fv = fv / (10 ** c.dtype.scale)
                    col = Column(fv[inv], (cnt > 0)[inv], dt.FLOAT64)
                else:
                    out_dt = c.dtype if c.dtype.is_decimal else (
                        dt.FLOAT64
                        if jnp.issubdtype(c.data.dtype, jnp.floating)
                        else dt.INT64)
                    col = Column(running[inv].astype(out_dt.jnp_dtype),
                                 (cnt > 0)[inv], out_dt)
            elif spec.fn in ("min", "max"):
                from starrocks_tpu.ops.hash_agg import _type_max, _type_min
                sent = _type_max(c.data.dtype) if spec.fn == "min" else _type_min(c.data.dtype)
                mask = live_s if c.valid is None else (live_s & c.valid)
                data = jnp.where(mask, c.data, sent)
                running = _running_minmax(data, seg_first, spec.fn)
                cnt = _running_sum(mask.astype(jnp.int64), seg_first)
                if spec.running and spec.peers:
                    running = running[peer_end]
                    cnt = cnt[peer_end]
                elif not spec.running:
                    running = _segment_reduce_pick_last(running, seg_id, n, seg_first)
                    cnt = _segment_total(cnt, seg_id, n, seg_first)
                col = Column(running[inv], (cnt > 0)[inv], c.dtype, c.dict_id)
            else:
                raise ValueError(spec.fn)
        out = out.with_column(spec.out, col)
    return out


def jax_max_scan(x):
    """Inclusive running maximum (blocked — VMEM-safe at any length)."""
    return su.running_reduce(jnp.maximum, x, jnp.zeros((), x.dtype))


def _running_sum(data, seg_first):
    """Running sum within segments: cumsum minus prefix before segment."""
    s = su.prefix_sum(data)
    before = jnp.where(seg_first > 0, s[jnp.maximum(seg_first - 1, 0)], 0)
    return s - before


def _running_minmax(data, seg_first, fn):
    op = jnp.minimum if fn == "min" else jnp.maximum
    idx = jnp.arange(data.shape[0], dtype=seg_first.dtype)
    start = seg_first == idx
    identity = jnp.asarray(
        (jnp.iinfo(data.dtype).max if fn == "min" else jnp.iinfo(data.dtype).min)
        if not jnp.issubdtype(data.dtype, jnp.floating)
        else (jnp.inf if fn == "min" else -jnp.inf), data.dtype)
    return su.seg_scan(op, start, data, identity)


def _segment_end(seg_first, n):
    """Index of each row's segment-final row (deterministic: the row before
    the next segment start, or n-1 for the last segment)."""
    import jax
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = seg_first == idx
    a = jnp.where(is_start, idx, n)
    a_shift = jnp.concatenate([a[1:], jnp.array([n], a.dtype)])
    nxt = jnp.flip(su.running_reduce(
        jnp.minimum, jnp.flip(a_shift), jnp.asarray(n, a.dtype)))
    return jnp.minimum(nxt - 1, n - 1)


def _segment_total(running, seg_id, n, seg_first=None):
    """Broadcast each segment's final running value to all its rows."""
    if seg_first is None:
        raise ValueError("seg_first required")
    return running[_segment_end(seg_first, n)]


def _segment_reduce_pick_last(running, seg_id, n, seg_first=None):
    return _segment_total(running, seg_id, n, seg_first)


# ---------------------------------------------------------------------------
# bounded ROWS frames (the general-frame half of the Analytor,
# be/src/exec/analytor.h:52): sum/count/avg via prefix-sum difference,
# min/max via prefix / suffix segment scans or a static shifted reduction
# ---------------------------------------------------------------------------

_MAX_SHIFT_WINDOW = 1024   # widest two-side-bounded min/max frame (static)


def _frame_bounds(frame, idx, seg_first, seg_end, n):
    """Per-row frame [a, b] clipped to the partition; nonempty = a <= b."""
    p, f = frame
    a = seg_first if p is None else jnp.maximum(idx - p, seg_first)
    b = seg_end if f is None else jnp.minimum(idx + f, seg_end)
    nonempty = a <= b
    return jnp.clip(a, 0, n - 1), jnp.clip(b, 0, n - 1), nonempty


def _frame_sum(running, a, b, nonempty, seg_first):
    """sum over [a, b] from an inclusive within-segment running sum."""
    base = jnp.where(a > seg_first, running[jnp.maximum(a - 1, 0)],
                     jnp.zeros((), running.dtype))
    return jnp.where(nonempty, running[b] - base,
                     jnp.zeros((), running.dtype))


def _suffix_minmax(data, seg_end_idx, idx, fn):
    """Within-segment suffix min/max: value over [i, seg_end] per row."""
    op = jnp.minimum if fn == "min" else jnp.maximum
    identity = jnp.asarray(
        (jnp.iinfo(data.dtype).max if fn == "min" else jnp.iinfo(data.dtype).min)
        if not jnp.issubdtype(data.dtype, jnp.floating)
        else (jnp.inf if fn == "min" else -jnp.inf), data.dtype)
    start_rev = jnp.flip(seg_end_idx == idx)
    out_rev = su.seg_scan(op, start_rev, jnp.flip(data), identity)
    return jnp.flip(out_rev)


def _value_units(x, dtype, jdtype):
    """Convert a frame offset literal into order-key storage units
    (decimals are scaled ints; dates are int days; floats stay floats)."""
    if x is None:
        return None
    if jnp.issubdtype(jdtype, jnp.floating):
        return float(x)
    scale = 10 ** dtype.scale if dtype.is_decimal else 1
    return int(round(float(x) * scale))


def _part_searchsorted(vals, nullmask, nulls_first, lo0, hi0, target, asc,
                       side, n):
    """Per-row binary search: insertion point of `target[i]` within the
    sorted run vals[lo0[i]:hi0[i]] under the sort direction. All rows search
    simultaneously (log2(n) gather rounds)."""
    import numpy as np
    lo = lo0.astype(jnp.int32)
    hi = hi0.astype(jnp.int32)
    for _ in range(int(np.ceil(np.log2(max(n, 2)))) + 1):
        mid = (lo + hi) // 2
        mc = jnp.clip(mid, 0, n - 1)
        mv = vals[mc]
        if asc:
            cmp = (mv < target) if side == "left" else (mv <= target)
        else:
            cmp = (mv > target) if side == "left" else (mv >= target)
        # a NULL at mid sorts before every real target iff nulls-first
        pred = jnp.where(nullmask[mc], nulls_first, cmp)
        go = lo < hi
        lo = jnp.where(go & pred, mid + 1, lo)
        hi = jnp.where(go & pred, hi, jnp.where(go, mid, hi))
    return lo


def _frame_bounds_range(range_frame, sorted_t, live_s, order_key, seg_first,
                        seg_end, peer_first, peer_end, n):
    """Per-row [a, b] for RANGE BETWEEN p PRECEDING AND f FOLLOWING over the
    single numeric order key (the value-offset half of the Analytor's RANGE
    frames, be/src/exec/analytor.h:52): binary-search the partition for the
    first/last row whose key value lies within [v-p, v+f]."""
    p, f = range_frame
    c = sorted_t[order_key.name]
    v = c.data
    pu = _value_units(p, c.dtype, v.dtype)
    fu = _value_units(f, c.dtype, v.dtype)
    isnull = (~c.validity() if c.valid is not None
              else jnp.zeros((n,), jnp.bool_)) | ~live_s
    nulls_first = order_key.resolve_nulls_first()
    sign = 1 if order_key.asc else -1
    if pu is None:
        a = seg_first
    else:
        lo_val = v - sign * jnp.asarray(pu, v.dtype)
        a = _part_searchsorted(v, isnull, nulls_first, seg_first, seg_end + 1,
                               lo_val, order_key.asc, "left", n)
    if fu is None:
        b = seg_end
    else:
        hi_val = v + sign * jnp.asarray(fu, v.dtype)
        b = _part_searchsorted(v, isnull, nulls_first, seg_first, seg_end + 1,
                               hi_val, order_key.asc, "right", n) - 1
    # a NULL order key's offset frame is its peer group (the other NULLs),
    # extended by any unbounded side
    if pu is not None:
        a = jnp.where(isnull, peer_first, a)
    if fu is not None:
        b = jnp.where(isnull, peer_end, b)
    nonempty = a <= b
    return jnp.clip(a, 0, n - 1), jnp.clip(b, 0, n - 1), nonempty


def _rmq(data, a, b, fn, sent):
    """Range min/max over arbitrary per-row [a, b] via a sparse table:
    level j holds the reduce over [i, i+2^j); query = op(T[j,a],
    T[j,b-2^j+1]) with j = floor(log2(width))."""
    from jax import lax
    op = jnp.minimum if fn == "min" else jnp.maximum
    n = data.shape[0]
    tabs = [data]
    shift = 1
    while shift < n:
        prev = tabs[-1]
        shifted = jnp.concatenate(
            [prev[shift:], jnp.full((shift,), sent, data.dtype)])
        tabs.append(op(prev, shifted))
        shift *= 2
    T = jnp.stack(tabs)                     # (L, n)
    w = jnp.maximum(b - a + 1, 1).astype(jnp.int32)
    j = (31 - lax.clz(w)).astype(jnp.int32)
    right = jnp.clip(b - (1 << j) + 1, 0, n - 1)
    return op(T[j, a], T[j, right])


def _framed_agg(spec, sorted_t, live_s, idx, seg_first, seg_end, n, inv,
                order_by=(), peer_first=None, peer_end=None):
    """sum/avg/count/min/max over a bounded ROWS or value-RANGE frame."""
    if spec.range_frame is not None:
        a, b, nonempty = _frame_bounds_range(
            spec.range_frame, sorted_t, live_s, order_by[0], seg_first,
            seg_end, peer_first, peer_end, n)
    else:
        a, b, nonempty = _frame_bounds(spec.frame, idx, seg_first, seg_end, n)
    c = sorted_t[spec.col] if spec.col else None
    mask = live_s if (c is None or c.valid is None) else (live_s & c.valid)

    if spec.fn == "count":
        running = _running_sum(mask.astype(jnp.int64), seg_first)
        vals = _frame_sum(running, a, b, nonempty, seg_first)
        return Column(vals[inv], None, dt.INT64)

    if spec.fn in ("sum", "avg"):
        data = jnp.where(mask, c.data.astype(jnp.int64)
                         if not jnp.issubdtype(c.data.dtype, jnp.floating)
                         else c.data, 0)
        s = _frame_sum(_running_sum(data, seg_first), a, b, nonempty,
                       seg_first)
        cnt = _frame_sum(_running_sum(mask.astype(jnp.int64), seg_first),
                         a, b, nonempty, seg_first)
        if spec.fn == "avg":
            fv = s.astype(jnp.float64) / jnp.maximum(cnt, 1)
            if c.dtype.is_decimal:
                fv = fv / (10 ** c.dtype.scale)
            return Column(fv[inv], (cnt > 0)[inv], dt.FLOAT64)
        out_dt = c.dtype if c.dtype.is_decimal else (
            dt.FLOAT64 if jnp.issubdtype(c.data.dtype, jnp.floating)
            else dt.INT64)
        return Column(s[inv].astype(out_dt.jnp_dtype), (cnt > 0)[inv], out_dt)

    if spec.fn in ("min", "max"):
        from starrocks_tpu.ops.hash_agg import _type_max, _type_min
        sent = _type_max(c.data.dtype) if spec.fn == "min" \
            else _type_min(c.data.dtype)
        data = jnp.where(mask, c.data, sent)
        cnt = _frame_sum(_running_sum(mask.astype(jnp.int64), seg_first),
                         a, b, nonempty, seg_first)
        p, f = spec.frame if spec.frame is not None else (1, 1)
        if spec.range_frame is not None:
            # variable-width bounds: sparse-table range min/max
            vals = _rmq(data, a, b, spec.fn, sent)
        elif spec.frame[0] is None:
            # [seg_first, b]: prefix scan evaluated at the frame end
            vals = _running_minmax(data, seg_first, spec.fn)[b]
        elif spec.frame[1] is None:
            # [a, seg_end]: suffix scan evaluated at the frame start
            vals = _suffix_minmax(data, seg_end, idx, spec.fn)[a]
        elif p + f + 1 > _MAX_SHIFT_WINDOW:
            vals = _rmq(data, a, b, spec.fn, sent)
        else:
            op = jnp.minimum if spec.fn == "min" else jnp.maximum
            vals = jnp.full((n,), sent, data.dtype)
            for d in range(-p, f + 1):
                src = idx + d
                ok = (src >= seg_first) & (src <= seg_end) & (src >= 0) \
                    & (src < n)
                cand = jnp.where(ok, data[jnp.clip(src, 0, n - 1)], sent)
                vals = op(vals, cand)
        return Column(vals[inv], (cnt > 0)[inv], c.dtype, c.dict_id)

    raise ValueError(f"frame unsupported for {spec.fn}")
