"""Physical query plans.

Analog of StarRocks' ExecNode tree + pipeline decomposition
(be/src/exec/exec_node.h:211, be/src/exec/pipeline/). On TPU the pipeline
driver loop (pipeline_driver.cpp:246) disappears: a plan is a tree of pure
functions over Table pytrees, and XLA compiles the whole fragment into one
program — operator fusion, scheduling and parallelism are the compiler's job
(the analog of 'decompose_to_pipeline' is jit tracing).

Dynamic sizing (hash-table capacities, join fanout) is static per compile;
each sizing decision is owned by a plan node and reported via overflow flags.
The host `execute` loop retries with grown capacities on overflow — the
analog of StarRocks' two-level hash map conversion and spill decisions, paid
as a (cached) recompile instead.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exprs.expr import Expr
from starrocks_tpu.ops import hash_join as hj
from starrocks_tpu.ops import hash_agg
from starrocks_tpu.ops.hash_agg import AggSpec
from starrocks_tpu.ops.sort import SortKey, sort_table

_node_counter = itertools.count()


class ExecContext:
    """Per-execution state: static capacities + collected overflow flags."""

    def __init__(self, tables: dict[str, Table], capacities: dict[int, int]):
        self.tables = tables
        self.capacities = capacities
        self.overflows: dict[int, jnp.ndarray] = {}

    def capacity(self, node_id: int, default: int) -> int:
        return self.capacities.get(node_id, default)

    def report(self, node_id: int, flag):
        self.overflows[node_id] = flag


class PlanNode:
    def __post_init__(self):
        self.node_id = next(_node_counter)

    def run(self, ctx: ExecContext) -> Table:
        raise NotImplementedError

    def children(self) -> list["PlanNode"]:
        return [
            v for f in dataclasses.fields(self)
            for v in [getattr(self, f.name)]
            if isinstance(v, PlanNode)
        ]

    def walk(self):
        yield self
        for c in self.children():
            yield from c.walk()


@dataclasses.dataclass(eq=False)
class Scan(PlanNode):
    table: str
    columns: Optional[tuple[str, ...]] = None

    def run(self, ctx):
        t = ctx.tables[self.table]
        if self.columns is not None:
            t = t.select(list(self.columns))
        return t


@dataclasses.dataclass(eq=False)
class Filter(PlanNode):
    child: PlanNode
    predicate: Expr

    def run(self, ctx):
        t = self.child.run(ctx)
        p = self.predicate.eval(t)
        mask = p.data if p.valid is None else (p.data & p.valid)
        return t.filter(mask)


@dataclasses.dataclass(eq=False)
class Project(PlanNode):
    """Output exactly `outputs` (name -> Expr or column-name str)."""
    child: PlanNode
    outputs: dict

    def run(self, ctx):
        t = self.child.run(ctx)
        cols = {}
        for name, e in self.outputs.items():
            cols[name] = t[e] if isinstance(e, str) else e.eval(t)
        return Table(columns=cols, live=t.live)


@dataclasses.dataclass(eq=False)
class AddColumns(PlanNode):
    """Keep child columns, add computed ones."""
    child: PlanNode
    outputs: dict

    def run(self, ctx):
        t = self.child.run(ctx)
        for name, e in self.outputs.items():
            t = t.with_column(name, e.eval(t))
        return t


@dataclasses.dataclass(eq=False)
class HashJoin(PlanNode):
    """probe (left) JOIN build (right) ON left_keys == right_keys.

    join_type: inner | left_outer | semi | anti
    `unique=True` asserts the build side has unique keys (FK->PK joins — all
    of TPC-H when sides are chosen right); the lookup path then avoids
    expansion entirely. With unique=False, a fanout-capped expansion join
    runs (output rows = probe_rows * fanout).
    build_cols: build columns carried to the output (none for semi/anti).
    """
    probe: PlanNode
    build: PlanNode
    left_keys: tuple[str, ...]
    right_keys: tuple[str, ...]
    join_type: str = "inner"
    build_cols: tuple[str, ...] = ()
    capacity: int = 4096
    unique: bool = True
    fanout: int = 4

    def run(self, ctx):
        from starrocks_tpu.ops import merge_join

        p = self.probe.run(ctx)
        b = self.build.run(ctx)
        cap = ctx.capacity(self.node_id, self.capacity)
        probe_cols = [p[k] for k in self.left_keys]
        build_cols = [b[k] for k in self.right_keys]
        if self.unique:
            if cap >= merge_join.MERGE_THRESHOLD:
                # large build: sort-merge lookup (no hash table, no overflow)
                matched, row = merge_join.merge_lookup(
                    build_cols, b.live_mask(), probe_cols, p.live_mask())
            else:
                bt = hj.build(build_cols, b.live_mask(), cap)
                ctx.report(self.node_id, bt.overflow)
                matched, row = hj.lookup(bt, probe_cols, p.live_mask())
            out = p
            if self.join_type == "inner":
                out = out.filter(matched)
                add_valid = None
            elif self.join_type == "left_outer":
                add_valid = matched
            elif self.join_type == "semi":
                return p.filter(matched)
            elif self.join_type == "anti":
                return p.filter(~matched)
            else:
                raise ValueError(self.join_type)
            for name in self.build_cols:
                c = b[name].gather(row, add_valid)
                out = out.with_column(name, c)
            return out
        # expansion join (duplicate build keys)
        bt = hj.build(build_cols, b.live_mask(), cap)
        ctx.report(self.node_id, bt.overflow)
        fanout = ctx.capacity(-self.node_id - 1, self.fanout)
        pi, bi, ok, truncated = hj.probe_expand(bt, probe_cols, p.live_mask(), fanout)
        ctx.report(-self.node_id - 1, truncated)
        if self.join_type in ("semi", "anti"):
            matched, _ = hj.lookup(bt, probe_cols, p.live_mask())
            return p.filter(matched if self.join_type == "semi" else ~matched)
        out = p.gather(pi, ok if self.join_type == "inner" else None)
        if self.join_type == "inner":
            out = out.with_live(out.live_mask() & ok)
            add_valid = None
            for name in self.build_cols:
                out = out.with_column(name, b[name].gather(bi))
            return out
        if self.join_type == "left_outer":
            # keep one row per unmatched probe row (the k=0 lane), NULL build
            matched_pair = ok
            first_lane = (jnp.arange(pi.shape[0]) % fanout) == 0
            probe_matched, _ = hj.lookup(bt, probe_cols, p.live_mask())
            keep = matched_pair | (first_lane & ~probe_matched[pi])
            out = out.with_live(out.live_mask() & keep)
            for name in self.build_cols:
                out = out.with_column(name, b[name].gather(bi, matched_pair))
            return out
        raise ValueError(self.join_type)


@dataclasses.dataclass(eq=False)
class Aggregate(PlanNode):
    child: PlanNode
    keys: tuple[str, ...]
    aggs: tuple[AggSpec, ...]
    est_groups: int = 1024

    def run(self, ctx):
        t = self.child.run(ctx)
        if not self.keys:
            return _global_agg(t, self.aggs)
        return hash_agg.groupby(t, self.keys, self.aggs)


def _global_agg(t: Table, aggs: Sequence[AggSpec]) -> Table:
    """Aggregate without GROUP BY: always one output row."""
    live = t.live_mask()
    cols = {}
    for spec in aggs:
        if spec.fn == "count_star":
            data = jnp.sum(live.astype(jnp.int64))[None]
            cols[spec.out] = Column(data, None, dt.INT64)
            continue
        c = t[spec.col]
        mask = live if c.valid is None else (live & c.valid)
        nn = jnp.sum(mask.astype(jnp.int64))
        if spec.fn == "count":
            cols[spec.out] = Column(nn[None], None, dt.INT64)
            continue
        if spec.fn == "sum":
            vals = c.data.astype(jnp.int64) if not jnp.issubdtype(c.data.dtype, jnp.floating) else c.data
            data = jnp.sum(jnp.where(mask, vals, 0))[None]
            out_dtype = hash_agg._agg_out_dtype(spec, c.dtype)
        elif spec.fn == "min":
            data = jnp.min(jnp.where(mask, c.data, hash_agg._type_max(c.data.dtype)))[None]
            out_dtype = c.dtype
        elif spec.fn == "max":
            data = jnp.max(jnp.where(mask, c.data, hash_agg._type_min(c.data.dtype)))[None]
            out_dtype = c.dtype
        else:
            raise ValueError(spec.fn)
        cols[spec.out] = Column(
            data.astype(out_dtype.jnp_dtype), (nn > 0)[None], out_dtype,
            dict_id=c.dict_id if c.dtype.is_string else 0)
    return Table(columns=cols, live=None)


@dataclasses.dataclass(eq=False)
class SetOp(PlanNode):
    """UNION [ALL] / INTERSECT / EXCEPT of two inputs with positionally
    aligned columns (analog of be/src/exec/union_node.cpp,
    except_hash_set.h / intersect_hash_set.h — implemented as concat +
    distinct-aggregate / semi / anti joins over all columns)."""
    left: PlanNode
    right: PlanNode
    kind: str          # union_all | union | intersect | except
    est_rows: int = 4096

    def run(self, ctx):
        from starrocks_tpu.column import dtypes as _dt
        from starrocks_tpu.ops import hash_agg as _ha
        from starrocks_tpu.ops import hash_join as _hj

        lt = self.left.run(ctx)
        rt = self.right.run(ctx)
        lnames = lt.column_names()
        rnames = rt.column_names()
        assert len(lnames) == len(rnames), "set op arity mismatch"
        # unify string dictionaries positionally
        lcols, rcols = {}, {}
        for ln, rn in zip(lnames, rnames):
            a, b = lt[ln], rt[rn]
            if a.dtype.is_string and a.dict_id != b.dict_id:
                a, b = _unify_dicts(a, b)
            lcols[ln], rcols[ln] = a, b

        if self.kind in ("union_all", "union"):
            cols = {}
            for ln in lnames:
                a, b = lcols[ln], rcols[ln]
                data = jnp.concatenate([a.data, b.data.astype(a.data.dtype)])
                if a.valid is None and b.valid is None:
                    valid = None
                else:
                    valid = jnp.concatenate([a.validity(), b.validity()])
                cols[ln] = Column(data, valid, a.dtype, a.dict_id)
            live = jnp.concatenate([lt.live_mask(), rt.live_mask()])
            out = Table(columns=cols, live=live)
            if self.kind == "union":
                out = _ha.groupby(out, tuple(lnames), ())
            return out

        # intersect / except: distinct left, then semi/anti join on all cols
        ltab = Table(columns=lcols, live=lt.live)
        rtab = Table(columns=rcols, live=rt.live)
        dl = _ha.groupby(ltab, tuple(lnames), ())
        bt = _hj.build([rtab[n] for n in lnames], rtab.live_mask(),
                       ctx.capacity(-self.node_id - 1, _cap_pow2(rt.nrows)))
        ctx.report(-self.node_id - 1, bt.overflow)
        matched, _ = _hj.lookup(bt, [dl[n] for n in lnames], dl.live_mask())
        keep = matched if self.kind == "intersect" else ~matched
        return dl.filter(keep)


def _cap_pow2(n):
    p = 16
    while p < 2 * max(n, 1):
        p *= 2
    return p


def _unify_dicts(a: Column, b: Column):
    """Remap two dict-encoded columns onto their union dictionary
    (trace-time host work; dictionaries are static metadata)."""
    import numpy as np
    from starrocks_tpu.column import dtypes as _dt

    va, vb = _dt.dict_values(a.dict_id), _dt.dict_values(b.dict_id)
    union = np.unique(np.concatenate([va, vb]))
    did = _dt.register_dict(union)
    la = jnp.asarray(np.searchsorted(union, va).astype(np.int32))
    lb = jnp.asarray(np.searchsorted(union, vb).astype(np.int32))
    return (Column(la[a.data], a.valid, a.dtype, did),
            Column(lb[b.data], b.valid, b.dtype, did))


@dataclasses.dataclass(eq=False)
class BroadcastScalar(PlanNode):
    """Attach columns of a single-row source (e.g. a global aggregate) to
    every row of child — the engine's scalar-subquery primitive (the analog
    of StarRocks' uncorrelated subquery -> cross-join-broadcast rewrite)."""
    child: PlanNode
    source: PlanNode
    columns: tuple[str, ...]

    def run(self, ctx):
        t = self.child.run(ctx)
        s = self.source.run(ctx)
        n = t.nrows
        for name in self.columns:
            c = s[name]
            data = jnp.broadcast_to(c.data[0], (n,))
            valid = None if c.valid is None else jnp.broadcast_to(c.valid[0], (n,))
            t = t.with_column(name, Column(data, valid, c.dtype, c.dict_id))
        return t


@dataclasses.dataclass(eq=False)
class Sort(PlanNode):
    child: PlanNode
    keys: tuple[SortKey, ...]
    limit: Optional[int] = None

    def run(self, ctx):
        t = self.child.run(ctx)
        return sort_table(t, self.keys, self.limit)


@dataclasses.dataclass(eq=False)
class Limit(PlanNode):
    child: PlanNode
    n: int

    def run(self, ctx):
        t = self.child.run(ctx)
        live = t.live_mask()
        rank = jnp.cumsum(live.astype(jnp.int32)) - 1
        return t.with_live(live & (rank < self.n))


def execute(plan: PlanNode, tables: dict[str, Table], max_retries: int = None) -> Table:
    """Compile + run a plan; grow capacities and retry on overflow.

    The jitted function is cached per (plan identity, capacities) — repeated
    executions of the same plan are compile-free.
    """
    from starrocks_tpu.config import CONFIG
    if max_retries is None:
        max_retries = CONFIG.max_capacity_retries
    growth = CONFIG.capacity_growth_factor
    capacities: dict[int, int] = getattr(plan, "_converged_caps", {}).copy()
    jit_cache = getattr(plan, "_jit_cache", None)
    if jit_cache is None:
        jit_cache = plan._jit_cache = {}

    def make_fn(caps):
        def run_fn(tabs):
            ctx = ExecContext(tabs, caps)
            out = plan.run(ctx)
            return out, ctx.overflows
        return jax.jit(run_fn)

    for _ in range(max_retries):
        key = tuple(sorted(capacities.items()))
        if key not in jit_cache:
            jit_cache[key] = make_fn(dict(capacities))
        out, overflows = jit_cache[key](tables)
        flagged = [nid for nid, f in overflows.items() if bool(f)]
        if not flagged:
            plan._converged_caps = dict(capacities)
            return out
        for nid in flagged:
            node = next((n for n in plan.walk() if n.node_id == nid), None)
            if nid < 0:  # fanout overflow
                real = next(n for n in plan.walk() if -n.node_id - 1 == nid)
                capacities[nid] = capacities.get(nid, real.fanout) * growth
            else:
                base = getattr(node, "capacity", None)
                if base is None:
                    base = hash_agg._next_pow2(max(16, node.est_groups * 2))
                capacities[nid] = capacities.get(nid, base) * growth
    raise RuntimeError(f"plan did not converge after {max_retries} capacity retries")
