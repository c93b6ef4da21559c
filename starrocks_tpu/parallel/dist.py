"""Distributed (SPMD) plan execution over a jax.sharding.Mesh.

This replaces StarRocks' whole distributed runtime: the FE coordinator's
fragment deployment (qe/DefaultCoordinator.java:559), the BE pipeline engine,
and the bRPC exchange — with ONE shard_map-decorated program per query:

- Tables are hash-partitioned by a chosen key across the mesh axis "d"
  (the analog of OLAP table bucketing / colocate groups,
  ColocatedBackendSelector.java) or replicated (small dims).
- Operators run on local shards; repartitioning happens via
  parallel.shuffle (all_to_all) exactly where the reference would plant an
  ExchangeNode; broadcast joins all_gather the build side (UNPARTITIONED
  exchange); global aggregates finish with psum.
- Two-phase aggregation (P8 in SURVEY.md §2.3): local pre-agg -> shuffle by
  group key -> final agg, with partial-state merging (count->sum etc).
- The partitioning property system mirrors the optimizer's physical property
  enforcement (ChildOutputPropertyGuarantor.java): each DistTable carries
  the keys it is partitioned on; joins/aggs only exchange when required.

The coordinator is the host Python: it pads + places shards, launches the
jitted SPMD program, retries on capacity overflow, and collects results.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec import plan as plan_mod
from starrocks_tpu.exec.plan import (
    AddColumns, Aggregate, BroadcastScalar, Filter, HashJoin, Limit, PlanNode,
    Project, Scan, Sort,
)
from starrocks_tpu.ops import hash_agg, hashing
from starrocks_tpu.ops.hash_agg import AggSpec
from starrocks_tpu.ops.sort import sort_table
from starrocks_tpu.parallel import shuffle as shuf

AXIS = "d"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


# ---------------------------------------------------------------------------
# host-side table placement
# ---------------------------------------------------------------------------

def partition_table(table: Table, keys: Optional[tuple[str, ...]], ndev: int) -> Table:
    """Reorder + pad rows so shard d holds rows with hash(keys)%ndev == d.

    keys=None -> round-robin (random) partitioning. Returns a Table whose
    arrays are (ndev*per,) with dead-row padding, ready for device_put with
    P('d') sharding.
    """
    n = table.nrows
    if keys:
        dest = np.asarray(shuf.partition_ids([table[k] for k in keys], ndev))
    else:
        dest = np.arange(n) % ndev
    order = np.argsort(dest, kind="stable")
    counts = np.bincount(dest, minlength=ndev)
    per = int(counts.max()) if n else 1
    idx = np.full((ndev, per), -1, np.int64)
    starts = np.zeros(ndev + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    for d in range(ndev):
        idx[d, : counts[d]] = order[starts[d]:starts[d + 1]]
    flat = idx.reshape(-1)
    ok = flat >= 0
    safe = np.where(ok, flat, 0)
    cols = {}
    for name, c in table.columns.items():
        data = jnp.asarray(np.asarray(c.data)[safe])
        valid = None if c.valid is None else jnp.asarray(np.asarray(c.valid)[safe])
        cols[name] = Column(data, valid, c.dtype, c.dict_id)
    live = np.asarray(table.live_mask())[safe] & ok
    return Table(columns=cols, live=jnp.asarray(live))


@dataclasses.dataclass
class DistTable:
    """A Table + its distribution property (inside shard_map: local shard)."""
    table: Table
    part_keys: Optional[tuple[str, ...]]  # hash-partitioned on these keys
    replicated: bool = False


def place_tables(
    tables: dict[str, Table],
    mesh: Mesh,
    partitioning: dict[str, Optional[tuple[str, ...]]],
) -> dict[str, DistTable]:
    """Host: partition+pad+device_put every base table onto the mesh."""
    ndev = mesh.devices.size
    out = {}
    for name, t in tables.items():
        spec = partitioning.get(name, None)
        if spec == "replicated":
            sharded = jax.device_put(t, NamedSharding(mesh, P()))
            out[name] = DistTable(sharded, None, replicated=True)
        else:
            pt = partition_table(t, spec, ndev)
            sharded = jax.device_put(pt, NamedSharding(mesh, P(AXIS)))
            out[name] = DistTable(sharded, spec, replicated=False)
    return out


# TPC-H default distribution (colocate lineitem/orders on orderkey,
# part/partsupp on partkey — P6 in SURVEY.md §2.3, the biggest scaling lever)
TPCH_PARTITIONING: dict[str, object] = {
    "lineitem": ("l_orderkey",),
    "orders": ("o_orderkey",),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "partsupp": ("ps_partkey",),
    "supplier": ("s_suppkey",),
    "nation": "replicated",
    "region": "replicated",
}


# ---------------------------------------------------------------------------
# distributed executor (runs inside shard_map)
# ---------------------------------------------------------------------------

_PARTIAL = {"sum": "sum", "count": "sum", "count_star": "sum", "min": "min",
            "max": "max", "any": "any"}


class DistExecutor:
    def __init__(self, ctx: plan_mod.ExecContext, dist_tables: dict[str, DistTable]):
        self.ctx = ctx
        self.dist = dist_tables
        self._memo: dict[int, DistTable] = {}   # shared CTE subplans (DAGs)

    # -- helpers -----------------------------------------------------------
    def _keys_cover(self, part_keys, names) -> bool:
        """Partitioned-on-part_keys data needs no exchange for grouping/join
        on `names` iff part_keys is a subset of names (equal keys colocate)."""
        return part_keys is not None and set(part_keys) <= set(names)

    def _shuffle(self, dt: DistTable, keys: tuple[str, ...], node_id: int,
                 slot: int = 100) -> DistTable:
        # sizing key (node_id, slot): slots >= 100 are shuffle bucket caps,
        # disjoint from HashJoin/SetOp kernel size slots
        key = (node_id, slot)
        cap = self.ctx.capacity(key, 0)
        if cap == 0:
            ndev = lax.axis_size(AXIS)
            cap = max(64, (2 * dt.table.nrows) // ndev)
            self.ctx.capacities[key] = cap
        out, overflow = shuf.shuffle_by_key(dt.table, keys, AXIS, cap)
        self.ctx.report(key, overflow)
        return DistTable(out, keys, replicated=False)

    # -- dispatch ------------------------------------------------------------
    def run(self, node: PlanNode) -> DistTable:
        r = self._memo.get(node.node_id)
        if r is not None:
            return r
        m = getattr(self, f"_run_{type(node).__name__}", None)
        if m is None:
            raise NotImplementedError(type(node).__name__)
        r = m(node)
        self._memo[node.node_id] = r
        return r

    def _run_Scan(self, node: Scan) -> DistTable:
        dt = self.dist[node.table]
        t = dt.table
        if node.columns is not None:
            t = t.select(list(node.columns))
        return DistTable(t, dt.part_keys, dt.replicated)

    def _run_BlockScan(self, node) -> DistTable:
        # zone-map block ids are computed against the global row order; a
        # hash-placed shard has its own — fall back to the full shard scan
        # (the following Filter keeps semantics; pruning is a single-chip
        # optimization for now)
        dt = self.dist[node.table]
        t = dt.table
        if node.columns is not None:
            t = t.select(list(node.columns))
        return DistTable(t, dt.part_keys, dt.replicated)

    def _run_Filter(self, node: Filter) -> DistTable:
        dt = self.run(node.child)
        p = node.predicate.eval(dt.table)
        mask = p.data if p.valid is None else (p.data & p.valid)
        return DistTable(dt.table.filter(mask), dt.part_keys, dt.replicated)

    def _run_Project(self, node: Project) -> DistTable:
        dt = self.run(node.child)
        cols = {}
        for name, e in node.outputs.items():
            cols[name] = dt.table[e] if isinstance(e, str) else e.eval(dt.table)
        # partition keys survive only if present (possibly renamed by ColRef)
        new_keys = None
        if dt.part_keys is not None:
            mapping = {}
            for name, e in node.outputs.items():
                src = e if isinstance(e, str) else (
                    e.name if type(e).__name__ == "ColRef" else None)
                if src:
                    mapping[src] = name
            if all(k in mapping for k in dt.part_keys):
                new_keys = tuple(mapping[k] for k in dt.part_keys)
        return DistTable(Table(columns=cols, live=dt.table.live), new_keys, dt.replicated)

    def _run_AddColumns(self, node: AddColumns) -> DistTable:
        dt = self.run(node.child)
        t = dt.table
        for name, e in node.outputs.items():
            t = t.with_column(name, e.eval(t))
        return DistTable(t, dt.part_keys, dt.replicated)

    def _run_HashJoin(self, node: HashJoin) -> DistTable:
        pdt = self.run(node.probe)
        bdt = self.run(node.build)
        ndev = lax.axis_size(AXIS)
        # local if build replicated, or both sides colocated on the join keys
        colocated = (
            self._keys_cover(pdt.part_keys, node.left_keys)
            and self._keys_cover(bdt.part_keys, node.right_keys)
            and pdt.part_keys is not None and bdt.part_keys is not None
            and [node.left_keys.index(k) for k in pdt.part_keys]
                == [node.right_keys.index(k) for k in bdt.part_keys]
        )
        if not (bdt.replicated or colocated):
            if pdt.replicated:
                # replicated probe x sharded build: keep each device's build
                # shard, then the probe output is sharded by build match —
                # simplest correct strategy: gather build (rare case: small)
                bdt = DistTable(shuf.gather_rows(bdt.table, AXIS), None, True)
            else:
                # broadcast the build side (UNPARTITIONED exchange, P5)
                bdt = DistTable(shuf.gather_rows(bdt.table, AXIS), None, True)
        # after localization, reuse the single-chip join logic
        sub = plan_mod.HashJoin.run
        shim = _JoinShim(node, pdt.table, bdt.table)
        out = sub(shim, self.ctx)
        out_keys = pdt.part_keys
        return DistTable(out, out_keys, pdt.replicated and bdt.replicated)

    def _run_Aggregate(self, node: Aggregate) -> DistTable:
        dt = self.run(node.child)
        ndev = lax.axis_size(AXIS)
        if not node.keys:
            return self._global_agg(node, dt)
        if dt.replicated:
            # replicated input: aggregate locally, stays replicated
            return DistTable(hash_agg.groupby(dt.table, node.keys, node.aggs),
                             None, True)
        if self._keys_cover(dt.part_keys, node.keys):
            # colocated group-by: purely local, result sharded by part_keys
            return DistTable(hash_agg.groupby(dt.table, node.keys, node.aggs),
                             dt.part_keys, False)
        # two-phase: local pre-agg -> shuffle by keys -> final merge agg
        partial = hash_agg.groupby(dt.table, node.keys, node.aggs)
        shuffled = self._shuffle(DistTable(partial, None, False), node.keys,
                                 node.node_id, slot=101)
        final_aggs = tuple(
            AggSpec(_PARTIAL[a.fn], a.out, a.out) for a in node.aggs
        )
        res = hash_agg.groupby(shuffled.table, node.keys, final_aggs)
        return DistTable(res, node.keys, False)

    def _global_agg(self, node: Aggregate, dt: DistTable) -> DistTable:
        local = plan_mod._global_agg(dt.table, node.aggs)
        if dt.replicated:
            return DistTable(local, None, True)
        cols = {}
        for a in node.aggs:
            c = local[a.out]
            if a.fn in ("sum", "count", "count_star"):
                data = lax.psum(jnp.where(c.validity(), c.data, 0)
                                if c.valid is not None else c.data, AXIS)
                valid = None if c.valid is None else (lax.psum(
                    c.valid.astype(jnp.int32), AXIS) > 0)
            elif a.fn == "min":
                big = hash_agg._type_max(c.data.dtype)
                data = lax.pmin(jnp.where(c.validity(), c.data, big), AXIS)
                valid = (lax.psum(c.validity().astype(jnp.int32), AXIS) > 0)
            elif a.fn == "max":
                small = hash_agg._type_min(c.data.dtype)
                data = lax.pmax(jnp.where(c.validity(), c.data, small), AXIS)
                valid = (lax.psum(c.validity().astype(jnp.int32), AXIS) > 0)
            else:
                raise ValueError(a.fn)
            cols[a.out] = Column(data, valid, c.dtype, c.dict_id)
        return DistTable(Table(columns=cols, live=None), None, True)

    def _run_BroadcastScalar(self, node: BroadcastScalar) -> DistTable:
        dt = self.run(node.child)
        src = self.run(node.source)
        if not src.replicated:
            src = DistTable(shuf.gather_rows(src.table, AXIS), None, True)
        t = dt.table
        n = t.nrows
        src_row = jnp.argmax(src.table.live_mask())
        for name in node.columns:
            c = src.table[name]
            data = jnp.broadcast_to(c.data[src_row], (n,))
            valid = None if c.valid is None else jnp.broadcast_to(
                c.valid[src_row], (n,))
            t = t.with_column(name, Column(data, valid, c.dtype, c.dict_id))
        return DistTable(t, dt.part_keys, dt.replicated)

    def _run_CrossJoin(self, node) -> DistTable:
        # nested-loop product: replicate the (small) right side, expand
        # locally against each device's left shard
        ldt = self.run(node.left)
        rdt = self.run(node.right)
        if not rdt.replicated:
            rdt = DistTable(shuf.gather_rows(rdt.table, AXIS), None, True)
        t, b = ldt.table, rdt.table
        n, m = t.nrows, b.nrows
        li = jnp.repeat(jnp.arange(n, dtype=jnp.int32), m)
        ri = jnp.tile(jnp.arange(m, dtype=jnp.int32), n)
        cols = {}
        for name, c in t.columns.items():
            cols[name] = Column(c.data[li],
                                None if c.valid is None else c.valid[li],
                                c.dtype, c.dict_id)
        for name in node.right_cols:
            c = b[name]
            cols[name] = Column(c.data[ri],
                                None if c.valid is None else c.valid[ri],
                                c.dtype, c.dict_id)
        live = t.live_mask()[li] & b.live_mask()[ri]
        return DistTable(Table(columns=cols, live=live), ldt.part_keys,
                         ldt.replicated)

    def _run_SetOp(self, node) -> DistTable:
        from starrocks_tpu.exec.plan import SetOp
        ldt, rdt = self.run(node.left), self.run(node.right)
        # align replication: both local shards or both replicated
        if ldt.replicated != rdt.replicated:
            if ldt.replicated:
                rdt = DistTable(shuf.gather_rows(rdt.table, AXIS), None, True)
            else:
                ldt = DistTable(shuf.gather_rows(ldt.table, AXIS), None, True)
        if node.kind == "union_all":
            shim = _SetShim(node, ldt.table, rdt.table)
            out = SetOp.run(shim, self.ctx)
            return DistTable(out, None, ldt.replicated)
        # distinct set ops dedupe across shards: shuffle both sides by all
        # columns so equal rows colocate, then run the local kernel
        if not ldt.replicated:
            names = ldt.table.column_names()
            ldt = self._shuffle(ldt, tuple(names), node.node_id, slot=102)
            rplan = rdt.table.select(list(names)) \
                if rdt.table.column_names() != names else rdt.table
            rdt = self._shuffle(DistTable(rplan, None, False), tuple(names),
                                node.node_id, slot=103)
        shim = _SetShim(node, ldt.table, rdt.table)
        out = SetOp.run(shim, self.ctx)
        return DistTable(out, None, ldt.replicated)

    def _run_Window(self, node) -> DistTable:
        from starrocks_tpu.ops.window import window as _window
        dt = self.run(node.child)
        # correct for any partition_by: gather so every partition is whole.
        # (colocated fast path when partition keys cover the sharding)
        if not dt.replicated and not (
                node.partition_by
                and self._keys_cover(dt.part_keys, node.partition_by)):
            dt = DistTable(shuf.gather_rows(dt.table, AXIS), None, True)
        out = _window(dt.table, node.partition_by, node.order_by, node.specs)
        return DistTable(out, dt.part_keys, dt.replicated)

    def _run_Sort(self, node: Sort) -> DistTable:
        dt = self.run(node.child)
        if dt.replicated:
            return DistTable(sort_table(dt.table, node.keys, node.limit), None, True)
        # local (pre-limit) sort, gather, final merge sort — the analog of
        # merge-sort exchange receive (data_stream_recvr.h:103)
        local = sort_table(dt.table, node.keys, node.limit)
        gathered = shuf.gather_rows(local, AXIS)
        return DistTable(sort_table(gathered, node.keys, node.limit), None, True)

    def _run_Limit(self, node: Limit) -> DistTable:
        dt = self.run(node.child)
        if not dt.replicated:
            dt = DistTable(shuf.gather_rows(dt.table, AXIS), None, True)
        t = dt.table
        live = t.live_mask()
        from starrocks_tpu.ops import scan_utils as su
        rank = su.prefix_sum(live.astype(jnp.int32)) - 1
        return DistTable(t.with_live(live & (rank < node.n)), None, True)


class _JoinShim:
    """Adapter letting HashJoin.run execute on already-localized tables."""

    def __init__(self, node: HashJoin, probe_t: Table, build_t: Table):
        self.__dict__.update(dataclasses.asdict_shallow(node) if hasattr(
            dataclasses, "asdict_shallow") else {
            f.name: getattr(node, f.name) for f in dataclasses.fields(node)})
        self.node_id = node.node_id
        self.probe = _Const(probe_t)
        self.build = _Const(build_t)

    run = plan_mod.HashJoin.run
    _keys = plan_mod.HashJoin._keys
    _naa_kernel = plan_mod.HashJoin._naa_kernel
    _unique_kernel = plan_mod.HashJoin._unique_kernel
    _semi_kernel = plan_mod.HashJoin._semi_kernel
    _rsemi_kernel = plan_mod.HashJoin._rsemi_kernel
    _expand_kernel = plan_mod.HashJoin._expand_kernel


class _SetShim:
    """SetOp with its inputs already resolved to device-local Tables."""

    def __init__(self, node, left_t: Table, right_t: Table):
        self.__dict__.update({
            f.name: getattr(node, f.name) for f in dataclasses.fields(node)})
        self.node_id = node.node_id
        self.left = _Const(left_t)
        self.right = _Const(right_t)

    run = plan_mod.SetOp.run
    _prep = plan_mod.SetOp._prep
    _union_kernel = plan_mod.SetOp._union_kernel
    _setop_kernel = plan_mod.SetOp._setop_kernel


class _Const:
    def __init__(self, t: Table):
        self.t = t

    def run(self, ctx):
        return self.t


# ---------------------------------------------------------------------------
# coordinator entry point
# ---------------------------------------------------------------------------

def dist_execute(
    plan: PlanNode,
    dist_tables: dict[str, DistTable],
    mesh: Mesh,
    max_retries: int = 8,
) -> Table:
    """Run a plan SPMD over the mesh; returns the (replicated) result Table.

    dist_tables come from place_tables(). Capacity overflow -> host retry
    with grown capacities, like exec.plan.execute.
    """
    from jax import shard_map

    capacities: dict[int, int] = dict(getattr(plan, "_dist_caps", {}))
    jit_cache = getattr(plan, "_dist_jit_cache", None)
    if jit_cache is None:
        jit_cache = plan._dist_jit_cache = {}

    names = sorted(dist_tables)
    meta = {n: (dist_tables[n].part_keys, dist_tables[n].replicated) for n in names}

    def make_fn(caps):
        def body(*tabs):
            dts = {
                n: DistTable(t, meta[n][0], meta[n][1])
                for n, t in zip(names, tabs)
            }
            ctx = plan_mod.ExecContext({}, dict(caps))
            ex = DistExecutor(ctx, dts)
            out = ex.run(plan)
            table = out.table
            if not out.replicated:
                table = shuf.gather_rows(table, AXIS)
            flags = {k: lax.psum(jnp.asarray(v, jnp.int32), AXIS)
                     for k, v in ctx.overflows.items()}
            return table, flags

        in_specs = tuple(
            jax.tree_util.tree_map(
                lambda _: P() if meta[n][1] else P(AXIS), dist_tables[n].table)
            for n in names
        )
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P()), check_vma=False)
        return jax.jit(fn)

    for _ in range(max_retries):
        key = tuple(sorted(capacities.items()))
        if key not in jit_cache:
            jit_cache[key] = make_fn(dict(capacities))
        out, flags = jit_cache[key](*[dist_tables[n].table for n in names])
        flagged = [k for k, f in flags.items() if int(f) > 0]
        if not flagged:
            plan._dist_caps = dict(capacities)
            return out
        for k in flagged:
            cur = capacities.get(k)
            if cur is None:
                nid = k[0] if isinstance(k, tuple) else k
                node = next((n for n in plan.walk() if n.node_id == nid), None)
                if node is not None and hasattr(node, "capacity"):
                    cur = node.capacity
                elif node is not None and hasattr(node, "est_groups"):
                    cur = hash_agg._next_pow2(max(16, node.est_groups * 2))
                else:
                    cur = 1024
            capacities[k] = cur * 4
    raise RuntimeError("distributed plan did not converge after capacity retries")
