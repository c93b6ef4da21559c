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
    np_cols, np_valids = {}, {}
    for name, c in table.columns.items():
        np_cols[name] = np.asarray(c.data)[safe]
        np_valids[name] = None if c.valid is None \
            else np.asarray(c.valid)[safe]
    live_np = np.asarray(table.live_mask())[safe] & ok
    cols = {name: Column(jnp.asarray(np_cols[name]),
                         None if np_valids[name] is None
                         else jnp.asarray(np_valids[name]),
                         c.dtype, c.dict_id)
            for name, c in table.columns.items()}
    out = Table(columns=cols, live=jnp.asarray(live_np))
    out._np_shards = (np_cols, np_valids, live_np, ndev, per)
    return out


def shard_zone_maps(table: Table) -> tuple[dict, int]:
    """Per-shard per-block [min, max] zone maps for a partition_table result
    (the per-tablet zonemap index the reference keeps per rowset segment,
    be/src/storage/rowset/zone_map_index.h). partition_table is order-stable
    within each shard, so a cluster-sort on the source column survives
    placement and pruning stays effective in dist mode. Returns
    ({col: (mins, maxs) of shape (ndev, nblocks)}, block_rows)."""
    np_cols, np_valids, live_np, ndev, per = table._np_shards
    B = max(64, 1 << max(0, (max(per, 1) // 64).bit_length() - 1))
    nb = -(-per // B)
    pad = nb * B - per
    live = live_np.reshape(ndev, per)
    zm = {}
    for name, arr in np_cols.items():
        if arr.dtype.kind not in "iu":
            continue
        a = arr.reshape(ndev, per)
        v = live if np_valids[name] is None \
            else (live & np_valids[name].reshape(ndev, per))
        info = np.iinfo(arr.dtype)
        lo = np.where(v, a, info.max)
        hi = np.where(v, a, info.min)
        if pad:
            lo = np.concatenate(
                [lo, np.full((ndev, pad), info.max, arr.dtype)], axis=1)
            hi = np.concatenate(
                [hi, np.full((ndev, pad), info.min, arr.dtype)], axis=1)
        zm[name] = (lo.reshape(ndev, nb, B).min(axis=2),
                    hi.reshape(ndev, nb, B).max(axis=2))
    return zm, B


@dataclasses.dataclass
class DistTable:
    """A Table + its distribution property (inside shard_map: local shard)."""
    table: Table
    part_keys: Optional[tuple[str, ...]]  # hash-partitioned on these keys
    replicated: bool = False
    # host-side per-shard zone maps (set by place_tables, used by the
    # coordinator to prune BlockScans before launching the SPMD program)
    zone_maps: Optional[dict] = None
    zone_block_rows: int = 0


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
            zm, brows = shard_zone_maps(pt)
            sharded = jax.device_put(pt, NamedSharding(mesh, P(AXIS)))
            out[name] = DistTable(sharded, spec, replicated=False,
                                  zone_maps=zm, zone_block_rows=brows)
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

# join types whose OUTPUT rows come from (or are flagged on) the build side;
# these need every build row on exactly one device (or a replicated probe),
# never a broadcast build (which would duplicate unmatched-build emission
# per device)
_RIGHT_FAMILY = ("right_semi", "right_anti", "right_outer", "full_outer")


# trace-time record of each Aggregate node's chosen exchange strategy
# (observable by tests and EXPLAIN; keyed by node_id, overwritten per trace)
AGG_STRATEGY: dict[int, str] = {}


class DistExecutor:
    def __init__(self, ctx: plan_mod.ExecContext,
                 dist_tables: dict[str, DistTable],
                 block_sel: Optional[dict] = None):
        self.ctx = ctx
        self.dist = dist_tables
        # node_id -> (local surviving-block ids (maxb,), block_rows): the
        # coordinator's per-shard zone-map pruning (dist_execute)
        self.block_sel = block_sel or {}
        self._memo: dict[int, DistTable] = {}   # shared CTE subplans (DAGs)

    # -- helpers -----------------------------------------------------------
    def _compact(self, dt: DistTable, node: PlanNode, slot: int,
                 frac: int = 32) -> DistTable:
        """Sized shard compaction with overflow-flag retry — the traced-mode
        analog of the eager executor's adaptive maybe_compact. Without it,
        chained fanout-expansion joins and union branches compound their
        PADDED shapes multiplicatively (each expand join multiplies the
        static shape by its fanout even when almost every row is dead),
        which blows up compile memory and overflows int32 index math on
        deep TPC-DS plans. Shrinks a shard to a pow2 capacity (initially
        nrows/frac); a capacity retry grows it if the live count exceeds."""
        from starrocks_tpu.column.column import compact_table
        t = dt.table
        key = (node.node_id, slot)
        if t.nrows < 4096:          # not worth the partition pass
            return dt
        # start SMALL (nrows/frac, floor 2048): a too-small cap costs a few
        # overflow-retry recompiles that converge and cache on the plan; a
        # too-big cap lets fanout-expansion chains outgrow every shrink
        cap = self.ctx.capacity(key, 0) or max(
            2048, hash_agg._next_pow2(max(t.nrows // frac, 1)))
        self.ctx.capacities[key] = cap
        if cap >= t.nrows:
            return dt
        self.ctx.report(
            key, jnp.sum(t.live_mask().astype(jnp.int32)) > cap)
        return DistTable(compact_table(t, cap), dt.part_keys, dt.replicated,
                         dt.zone_maps, dt.zone_block_rows)

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
        # the plan-time block ids are global-row-order; after hash placement
        # each shard has its OWN zone maps, so the coordinator re-pruned
        # against them and passed per-device surviving-block id arrays in
        # (dist_execute). Without them: full shard scan (the following
        # Filter keeps semantics).
        dt = self.dist[node.table]
        t = dt.table
        if node.columns is not None:
            t = t.select(list(node.columns))
        sel = self.block_sel.get(node.node_id)
        if sel is None or dt.replicated:
            return DistTable(t, dt.part_keys, dt.replicated)
        blocks, B = sel
        blocks = blocks.reshape(-1)
        n = t.nrows
        idx = (blocks.astype(jnp.int32)[:, None] * B
               + jnp.arange(B, dtype=jnp.int32)[None, :]).reshape(-1)
        inb = idx < n               # sentinel blocks start at >= n
        safe = jnp.where(inb, idx, 0)
        cols = {name: Column(c.data[safe],
                             None if c.valid is None
                             else (c.valid[safe] & inb),
                             c.dtype, c.dict_id)
                for name, c in t.columns.items()}
        live = inb if t.live is None else (t.live[safe] & inb)
        return DistTable(Table(columns=cols, live=live), dt.part_keys, False)

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

    def _shuffle_join_sides(self, node: HashJoin, pdt: DistTable,
                            bdt: DistTable) -> tuple[DistTable, DistTable]:
        """Hash-partition BOTH join inputs on the join keys so matching rows
        colocate — the reference's primary join exchange (HASH_PARTITIONED,
        exchange_sink_operator.cpp:569-636), here one all_to_all per side.
        With node.skew_salt > 1 (ANALYZE heavy-hitter annotation) the probe
        side salts across `salt` devices and matching build rows replicate
        (P13, the is_skew_join analog, hash_joiner.h:75)."""
        from starrocks_tpu.config import CONFIG
        ndev = lax.axis_size(AXIS)
        p, b = pdt.table, bdt.table
        # equal string keys must hash equally: unify dictionaries pre-exchange
        for pk, bk in zip(node.left_keys, node.right_keys):
            pc, bc = p[pk], b[bk]
            if (pc.dtype.is_string and bc.dtype.is_string
                    and pc.dict_id != bc.dict_id):
                pc2, bc2 = plan_mod._unify_dicts(pc, bc)
                p = p.with_column(pk, pc2)
                b = b.with_column(bk, bc2)
        if (CONFIG.enable_bloom_rf and node.join_type in HashJoin._RF_TYPES):
            # cross-fragment bloom RF (runtime_filter_worker.h:127): each
            # device blooms its LOCAL build shard, one pmax OR-merges the
            # global filter, and probe rows that cannot join die BEFORE the
            # exchange — they never cross ICI (filter-before-shuffle)
            from starrocks_tpu.ops import bloom
            nbits = bloom.nbits_for(b.nrows * ndev,
                                    CONFIG.bloom_rf_bits_per_key)
            local = bloom.build([b[k] for k in node.right_keys],
                                b.live_mask(), nbits)
            bits = lax.pmax(local.astype(jnp.int32), AXIS) > 0
            ok = bloom.query(bits, [p[k] for k in node.left_keys])
            p = p.with_live(p.live_mask() & ok)
        salt = max(1, min(int(getattr(node, "skew_salt", 1)), ndev))
        pkey, bkey = (node.node_id, 104), (node.node_id, 105)
        pcap = self.ctx.capacity(pkey, 0) or max(64, (2 * p.nrows) // ndev)
        bcap = self.ctx.capacity(bkey, 0) or max(
            64, (2 * salt * b.nrows) // ndev)
        self.ctx.capacities[pkey] = pcap
        self.ctx.capacities[bkey] = bcap
        if salt > 1 and node.join_type in ("inner", "left_outer", "semi",
                                           "anti"):
            (p2, b2), ovf = shuf.shuffle_salted(
                p, b, node.left_keys, node.right_keys, AXIS, pcap, bcap, salt)
            self.ctx.report(pkey, ovf)
            self.ctx.report(bkey, ovf)
            # build rows are replicated -> the result is NOT hash-partitioned
            return (DistTable(p2, None, False), DistTable(b2, None, False))
        p2, povf = shuf.shuffle_by_key(p, node.left_keys, AXIS, pcap)
        b2, bovf = shuf.shuffle_by_key(b, node.right_keys, AXIS, bcap)
        self.ctx.report(pkey, povf)
        self.ctx.report(bkey, bovf)
        return (DistTable(p2, node.left_keys, False),
                DistTable(b2, node.right_keys, False))

    def _run_HashJoin(self, node: HashJoin) -> DistTable:
        from starrocks_tpu.config import CONFIG
        pdt = self.run(node.probe)
        bdt = self.run(node.build)
        ndev = lax.axis_size(AXIS)
        right_family = node.join_type in _RIGHT_FAMILY
        # local if build replicated, or both sides colocated on the join keys
        colocated = (
            self._keys_cover(pdt.part_keys, node.left_keys)
            and self._keys_cover(bdt.part_keys, node.right_keys)
            and pdt.part_keys is not None and bdt.part_keys is not None
            and [node.left_keys.index(k) for k in pdt.part_keys]
                == [node.right_keys.index(k) for k in bdt.part_keys]
        )
        shuffled_out_keys = None
        if not colocated:
            if right_family:
                # build-side match flags must be globally exact
                if pdt.replicated and not bdt.replicated:
                    # full probe vs disjoint build shards is local ONLY for
                    # types whose output rows come solely from the build side
                    # (right_semi/anti/outer). full_outer also emits unmatched
                    # PROBE rows, which would duplicate per device and judge
                    # matches against one build shard only — gather the build
                    # so every device computes the identical full join.
                    if node.join_type == "full_outer":
                        bdt = DistTable(shuf.gather_rows(bdt.table, AXIS),
                                        None, True)
                elif not pdt.replicated and not bdt.replicated:
                    pdt, bdt = self._shuffle_join_sides(node, pdt, bdt)
                elif bdt.replicated and not pdt.replicated:
                    # replicated build + sharded probe: replicate the probe
                    # too; every device computes the identical full join
                    pdt = DistTable(shuf.gather_rows(pdt.table, AXIS), None,
                                    True)
            elif not bdt.replicated:
                if pdt.replicated:
                    # replicated probe x sharded build: gather the (rare,
                    # small) build so the output stays replicated — local
                    # probe-filtering joins (semi/anti) differ per shard
                    bdt = DistTable(shuf.gather_rows(bdt.table, AXIS), None,
                                    True)
                elif (node.join_type != "null_aware_anti"
                      and bdt.table.nrows * ndev
                          > CONFIG.dist_broadcast_threshold_rows):
                    # shuffle-hash join (P4): too big to broadcast.
                    # (null-aware anti never shuffles: its build-has-NULL /
                    # build-empty decisions are global.)
                    pdt, bdt = self._shuffle_join_sides(node, pdt, bdt)
                    shuffled_out_keys = pdt.part_keys
                else:
                    # broadcast the build side (UNPARTITIONED exchange, P5)
                    bdt = DistTable(shuf.gather_rows(bdt.table, AXIS), None,
                                    True)
        # after exchange placement, the node's own local kernels run;
        # compact both inputs first (the eager path's maybe_compact analog —
        # bounds the multiplicative padded-shape growth of chained
        # fanout-expansion joins)
        pdt = self._compact(pdt, node, 110)
        bdt = self._compact(bdt, node, 111)
        out = node.run_local(self.ctx, pdt.table, bdt.table)
        repl = pdt.replicated and bdt.replicated
        if right_family:
            # output carries build rows (with NULL probe keys when
            # unmatched): no usable hash-partitioning property
            return DistTable(out, None, repl)
        out_keys = shuffled_out_keys if shuffled_out_keys is not None \
            else pdt.part_keys
        return DistTable(out, out_keys, repl)

    def _run_Aggregate(self, node: Aggregate) -> DistTable:
        from starrocks_tpu.column import dtypes as dtp
        from starrocks_tpu.config import CONFIG
        dt = self.run(node.child)
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
        if any(a.fn in hash_agg.PCTL_FNS or a.fn in hash_agg.HLL_FNS
               for a in node.aggs):
            # percentile states don't merge (the reference ships full
            # percentile_union serialized state, be/src/exprs/agg/percentile
            # — here raw rows shuffle instead); grouped HLL also runs
            # single-phase after exchange (per-group register arrays are
            # mergeable but bulky as shuffle payload)
            shuffled = self._shuffle(dt, node.keys, node.node_id, slot=101)
            return DistTable(
                hash_agg.groupby(shuffled.table, node.keys, node.aggs),
                node.keys, False)
        # streaming pre-agg passthrough decision (the reference's
        # should_expand_preagg_hash_tables, be/src/exec/aggregator.cpp:770):
        # when the planner's group estimate says the local pre-agg would
        # barely reduce (group count ~ row count, e.g. GROUP BY a
        # near-unique key), skip it — shuffle RAW rows and aggregate once,
        # one sort instead of two
        global_rows = dt.table.nrows * jax.lax.axis_size(AXIS)
        if (node.est_groups
                >= CONFIG.dist_preagg_passthrough_ratio * global_rows):
            AGG_STRATEGY[node.node_id] = "passthrough"
            shuffled = self._shuffle(dt, node.keys, node.node_id, slot=101)
            return DistTable(
                hash_agg.groupby(shuffled.table, node.keys, node.aggs),
                node.keys, False)
        AGG_STRATEGY[node.node_id] = "two_phase"
        # two-phase (P8): local pre-agg -> shuffle by keys -> merge partial
        # states (the aggregator state-merge analog, aggregator.cpp:858).
        # var/stddev decompose into psum-mergeable moments (s1, s2, n).
        t = dt.table
        pre_specs: list[AggSpec] = []
        merge_specs: list[AggSpec] = []
        var_posts: list[tuple] = []        # (spec, s1, s2, n) column names
        for a in node.aggs:
            if a.fn in hash_agg.VAR_FNS:
                c = t[a.col]
                base = f"_mom{node.node_id}_{a.out}"
                vf = hash_agg._as_float(c.data, c.dtype)
                t = t.with_column(base + "v",
                                  Column(vf, c.valid, dtp.FLOAT64))
                t = t.with_column(base + "v2",
                                  Column(vf * vf, c.valid, dtp.FLOAT64))
                pre_specs += [AggSpec("sum", base + "v", base + "s1"),
                              AggSpec("sum", base + "v2", base + "s2"),
                              AggSpec("count", a.col, base + "n")]
                merge_specs += [AggSpec("sum", base + "s1", base + "s1"),
                                AggSpec("sum", base + "s2", base + "s2"),
                                AggSpec("sum", base + "n", base + "n")]
                var_posts.append((a, base + "s1", base + "s2", base + "n"))
            else:
                pre_specs.append(a)
                merge_specs.append(AggSpec(_PARTIAL[a.fn], a.out, a.out))
        partial = hash_agg.groupby(t, node.keys, tuple(pre_specs))
        merge_specs = tuple(merge_specs)
        if partial.nrows >= CONFIG.dist_ring_agg_threshold_rows:
            # big partials: ppermute-ring exchange with per-step merge so
            # XLA overlaps each hop's communication with the previous
            # step's merge compute (P12, the SinkBuffer in-flight analog)
            res = self._ring_merge(node, partial, merge_specs)
        else:
            shuffled = self._shuffle(DistTable(partial, None, False),
                                     node.keys, node.node_id, slot=101)
            res = hash_agg.groupby(shuffled.table, node.keys, merge_specs)
        if var_posts:
            cols = dict(res.columns)
            for a, s1n, s2n, nnn in var_posts:
                s1, s2 = cols.pop(s1n), cols.pop(s2n)
                nn = cols.pop(nnn)
                m1 = jnp.where(s1.validity(), s1.data, 0.0) \
                    if s1.valid is not None else s1.data
                m2 = jnp.where(s2.validity(), s2.data, 0.0) \
                    if s2.valid is not None else s2.data
                data, ok = hash_agg._variance_from_moments(
                    a.fn, m1, m2, nn.data)
                cols[a.out] = Column(data, ok, dtp.FLOAT64)
            res = Table(columns=cols, live=res.live)
        return DistTable(res, node.keys, False)

    def _ring_merge(self, node, partial: Table, merge_specs) -> Table:
        """Merge pre-aggregated partials over a ppermute ring. Static shapes
        grow by one bucket per hop (the liveness, not the footprint, is what
        the per-step groupby bounds); the win is comm/compute overlap."""
        from starrocks_tpu.column.column import concat_tables
        ndev = lax.axis_size(AXIS)
        key = (node.node_id, 101)
        cap = self.ctx.capacity(key, 0)
        if cap == 0:
            cap = max(64, (2 * partial.nrows) // ndev)
            self.ctx.capacities[key] = cap
        acc, overflow = shuf.ring_shuffle_reduce(
            partial, node.keys, AXIS, cap,
            init_fn=lambda c: hash_agg.groupby(c, node.keys, merge_specs),
            step_fn=lambda acc, c: hash_agg.groupby(
                concat_tables(acc, c), node.keys, merge_specs))
        self.ctx.report(key, overflow)
        return acc

    def _global_agg(self, node: Aggregate, dt: DistTable) -> DistTable:
        from starrocks_tpu.column import dtypes as dtp
        if not dt.replicated and any(
                a.fn in hash_agg.PCTL_FNS for a in node.aggs):
            # percentiles need the whole value set: gather, then local
            dt = DistTable(shuf.gather_rows(dt.table, AXIS), None, True)
        local = plan_mod._global_agg(
            dt.table,
            tuple(a for a in node.aggs
                  if a.fn not in hash_agg.VAR_FNS
                  and a.fn not in hash_agg.HLL_FNS)
            if not dt.replicated else node.aggs)
        if dt.replicated:
            return DistTable(local, None, True)
        t = dt.table
        live = t.live_mask()
        cols = {}
        for a in node.aggs:
            if a.fn in hash_agg.HLL_FNS:
                # register arrays merge with ONE elementwise pmax across the
                # mesh — the sketch's whole distributed advantage (hll.h
                # serialize/merge collapses to a collective)
                c = t[a.col]
                mask = live if c.valid is None else (live & c.valid)
                regs = hash_agg.hll_registers(c, mask)
                regs = lax.pmax(regs, AXIS)
                nn = lax.psum(jnp.sum(mask.astype(jnp.int64)), AXIS)
                e = hash_agg.hll_estimate_registers(regs)
                data = jnp.where(nn > 0, jnp.round(e), 0.0).astype(jnp.int64)
                cols[a.out] = Column(data[None], None, dtp.INT64)
                continue
            if a.fn in hash_agg.VAR_FNS:
                # psum-merged moments (exactly the two-phase decomposition)
                c = t[a.col]
                mask = live if c.valid is None else (live & c.valid)
                vf = hash_agg._as_float(c.data, c.dtype)
                s1 = lax.psum(jnp.sum(jnp.where(mask, vf, 0.0)), AXIS)
                s2 = lax.psum(jnp.sum(jnp.where(mask, vf * vf, 0.0)), AXIS)
                nn = lax.psum(jnp.sum(mask.astype(jnp.int64)), AXIS)
                data, ok = hash_agg._variance_from_moments(
                    a.fn, s1[None], s2[None], nn[None])
                cols[a.out] = Column(data, ok, dtp.FLOAT64)
                continue
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
        from starrocks_tpu.column.column import compact_table
        ldt = self.run(node.left)
        rdt = self.run(node.right)
        if not rdt.replicated:
            rdt = DistTable(shuf.gather_rows(rdt.table, AXIS), None, True)
        t, b = ldt.table, rdt.table
        # compact both sides to fitted pow2 capacities before the quadratic
        # expansion (the single-chip path compacts eagerly; here a sized
        # compaction + overflow-flag retry bounds n*m to ~live rows, not
        # dead-padded capacities)
        for key, tag in (((node.node_id, 108), "l"), ((node.node_id, 109), "r")):
            side = t if tag == "l" else b
            cap = self.ctx.capacity(key, 0) or max(
                16, hash_agg._next_pow2(max(side.nrows // 4, 1)))
            self.ctx.capacities[key] = cap
            if cap < side.nrows:
                self.ctx.report(
                    key, jnp.sum(side.live_mask().astype(jnp.int32)) > cap)
                side = compact_table(side, cap)
                if tag == "l":
                    t = side
                else:
                    b = side
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
            # compact both branches: rollup/grouping-sets plans chain many
            # union_all nodes, and concatenating padded branch outputs
            # compounds dead rows linearly down the chain
            ldt = self._compact(ldt, node, 112)
            rdt = self._compact(rdt, node, 113)
            out = node.run_local(self.ctx, ldt.table, rdt.table)
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
        out = node.run_local(self.ctx, ldt.table, rdt.table)
        return DistTable(out, None, ldt.replicated)

    def _run_Window(self, node) -> DistTable:
        from starrocks_tpu.ops.window import window as _window
        dt = self._compact(self.run(node.child), node, 114)
        if not dt.replicated and node.partition_by and not self._keys_cover(
                dt.part_keys, node.partition_by):
            # repartition so every window partition is whole on one device —
            # each row moves ONCE (vs the old gather-everything-everywhere)
            dt = self._shuffle(dt, tuple(node.partition_by), node.node_id,
                               slot=106)
        elif not dt.replicated and not node.partition_by:
            # no partitioning: the frame can span everything — gather
            dt = DistTable(shuf.gather_rows(dt.table, AXIS), None, True)
        out = _window(dt.table, node.partition_by, node.order_by, node.specs)
        return DistTable(out, dt.part_keys, dt.replicated)

    def _run_Sort(self, node: Sort) -> DistTable:
        from starrocks_tpu.config import CONFIG
        dt = self._compact(self.run(node.child), node, 115)
        if dt.replicated:
            return DistTable(sort_table(dt.table, node.keys, node.limit),
                             None, True)
        ndev = lax.axis_size(AXIS)
        if (node.limit is not None
                or dt.table.nrows * ndev
                <= CONFIG.dist_range_sort_threshold_rows):
            # top-N / small: local (pre-limit) sort, gather, final merge sort
            # — the merge-sort exchange receive analog (data_stream_recvr.h:103)
            local = sort_table(dt.table, node.keys, node.limit)
            gathered = shuf.gather_rows(local, AXIS)
            return DistTable(sort_table(gathered, node.keys, node.limit),
                             None, True)
        return self._range_sort(node, dt)

    def _range_sort(self, node: Sort, dt: DistTable) -> DistTable:
        """Range-partitioned distributed ORDER BY: sample -> splitters ->
        all_to_all -> local sort. Each row moves exactly once and per-device
        peak rows stay ~N/ndev (vs gather's N per device). Replaces the
        merge-path receive of the reference (merge_path.h:371): device-major
        range order + per-device sorted order IS the merged total order,
        since equal split codes always land on one device."""
        from starrocks_tpu.ops import fast_sort as fs
        t = dt.table
        n = t.nrows
        ndev = lax.axis_size(AXIS)
        live = t.live_mask()
        # split code: the leading <=56 normalized key bits (direction- and
        # NULL-placement-adjusted), so ascending code == output order
        code = jnp.zeros((n,), jnp.uint64)
        used = 0
        for k in node.keys:
            if used >= 56:
                break
            for codes, nbits in fs.normalize_keys(
                    t[k.name], k.asc, k.resolve_nulls_first()):
                take = min(nbits, 56 - used)
                if take <= 0:
                    break
                code = (code << jnp.uint64(take)) | (
                    codes >> jnp.uint64(nbits - take))
                used += take
        # per-device sample of the local code distribution (dead rows pushed
        # to the top sentinel; they are dropped by the exchange anyway)
        S = 64
        sorted_codes = fs.sort_packed(
            jnp.where(live, code, jnp.uint64((1 << 62))))
        samples = sorted_codes[(jnp.arange(S) * n) // S]
        all_samples = lax.all_gather(samples, AXIS, axis=0, tiled=True)
        (ssorted,) = lax.sort((all_samples,), num_keys=1)
        splitters = ssorted[(jnp.arange(1, ndev) * (ndev * S)) // ndev]
        dest = jnp.searchsorted(splitters, code, side="right").astype(
            jnp.int32)
        key = (node.node_id, 107)
        cap = self.ctx.capacity(key, 0)
        if cap == 0:
            cap = max(64, (2 * n) // ndev)
            self.ctx.capacities[key] = cap
        shuffled, ovf = shuf._scatter_exchange(t, dest, AXIS, cap)
        self.ctx.report(key, ovf)
        # local sort; the final all_gather (device-major) yields total order
        return DistTable(sort_table(shuffled, node.keys, None), None, False)

    def _run_Limit(self, node: Limit) -> DistTable:
        from starrocks_tpu.column.column import compact_table
        dt = self.run(node.child)
        if not dt.replicated:
            # local limit below the exchange (the reference pushes LIMIT
            # into each LocalExchange source, local_exchange.h:110): each
            # shard compacts its first n live rows into an n-row buffer, so
            # the gather moves ndev*n rows instead of whole padded shards
            local = dt.table
            if node.n < local.nrows:
                local = compact_table(local, node.n)
            dt = DistTable(shuf.gather_rows(local, AXIS), None, True)
        t = dt.table
        live = t.live_mask()
        from starrocks_tpu.ops import scan_utils as su
        rank = su.prefix_sum(live.astype(jnp.int32)) - 1
        return DistTable(t.with_live(live & (rank < node.n)), None, True)


# ---------------------------------------------------------------------------
# plan-time skew annotation (P13 detection: ANALYZE heavy hitters)
# ---------------------------------------------------------------------------

def resolve_base_column(node: PlanNode, colname: str):
    """Trace a column on `node`'s output back through renames, projections,
    filters and join pass-throughs to its base-table origin. Returns
    (table_name, base_column) or None when the column is derived (an
    expression) or the lineage leaves the plan's scan leaves."""
    while True:
        t = type(node).__name__
        if t == "Filter":
            node = node.child
        elif t == "AddColumns":
            e = node.outputs.get(colname)
            if e is not None:
                if type(e).__name__ == "ColRef":
                    colname = e.name
                else:
                    return None
            node = node.child
        elif t == "Project":
            e = node.outputs.get(colname)
            if e is None:
                return None
            if isinstance(e, str):
                colname = e
            elif type(e).__name__ == "ColRef":
                colname = e.name
            else:
                return None
            node = node.child
        elif t == "HashJoin":
            # probe columns pass through; build_cols come from the build
            node = node.build if colname in node.build_cols else node.probe
        elif t == "BroadcastScalar":
            node = node.source if colname in node.columns else node.child
        elif t in ("Scan", "BlockScan"):
            return (node.table, colname)
        else:
            return None


def annotate_skew(plan: PlanNode, catalog, ndev: int) -> None:
    """Set HashJoin.skew_salt from catalog heavy-hitter stats: when the
    probe side's join-key column traces back (through filters, projections,
    and upstream joins) to a base-table column that concentrates more than
    CONFIG.skew_hot_key_fraction of rows on one value, a plain hash shuffle
    floods one device — salt it across ~frac*ndev devices instead.
    Detection (not a user hint) — the automatic counterpart of the
    reference's is_skew_join hint (be/src/exec/hash_joiner.h:75) /
    AdaptivePassthroughExchanger (local_exchange.h:334)."""
    from starrocks_tpu.config import CONFIG

    for node in plan.walk():
        if not isinstance(node, HashJoin) or len(node.left_keys) != 1:
            continue
        res = resolve_base_column(node.probe, node.left_keys[0])
        if res is None:
            continue
        tname, cname = res
        if tname not in getattr(catalog, "tables", {}):
            continue
        st = catalog.tables[tname].stats.get(cname)
        frac = getattr(st, "top_freq", 0.0) if st else 0.0
        if frac > CONFIG.skew_hot_key_fraction:
            node.skew_salt = max(2, min(ndev, int(frac * ndev) + 1))


# ---------------------------------------------------------------------------
# coordinator entry point
# ---------------------------------------------------------------------------

def plan_block_selections(plan: PlanNode, dist_tables: dict[str, DistTable],
                          ndev: int) -> dict[int, tuple]:
    """Coordinator-side zone-map pruning: re-evaluate each BlockScan's
    pruning intervals against the PER-SHARD zone maps place_tables recorded,
    producing per-device surviving-block id arrays (pow2-padded with a
    sentinel). Restores P3/zonemap pruning in dist mode
    (segment_iterator.cpp:220). Returns {node_id: ((ndev, maxb) int32, B)}."""
    sels: dict[int, tuple] = {}
    for node in plan.walk():
        if (type(node).__name__ != "BlockScan"
                or not getattr(node, "pred_ranges", ())):
            continue
        dt = dist_tables.get(node.table)
        if dt is None or dt.replicated or not dt.zone_maps:
            continue
        zm, B = dt.zone_maps, dt.zone_block_rows
        nb = next(iter(zm.values()))[0].shape[1]
        keep = np.ones((ndev, nb), bool)
        for cname, lo, hi in node.pred_ranges:
            if cname not in zm:
                continue
            mins, maxs = zm[cname]
            if lo is not None:
                keep &= maxs >= lo
            if hi is not None:
                keep &= mins <= hi
        maxb = 1 << max(int(keep.sum(axis=1).max()) - 1, 0).bit_length()
        if maxb >= nb:
            continue                     # pruning wouldn't shrink the shape
        sel = np.full((ndev, maxb), nb, np.int32)   # sentinel: dead rows
        for d in range(ndev):
            ids = np.nonzero(keep[d])[0][:maxb]
            sel[d, :len(ids)] = ids
        sels[node.node_id] = (sel, B)
    return sels

def dist_execute(
    plan: PlanNode,
    dist_tables: dict[str, DistTable],
    mesh: Mesh,
    max_retries: int = 8,
    replicate_result: bool = False,
) -> Table:
    """Run a plan SPMD over the mesh; the result Table stays device-sharded
    (collected host-side device-major — no final all_gather replicating the
    whole result to every device). replicate_result=True restores the
    replicated output (needed when every PROCESS of a multi-host mesh must
    read the rows locally, parallel/multihost.py).

    dist_tables come from place_tables(). Capacity overflow -> host retry
    with grown capacities, like exec.plan.execute.
    """
    from jax import shard_map

    # pre-trace rejection of nodes with no distributed execution (raising
    # NotImplementedError from inside the shard_map trace is opaque —
    # r3 advisor): name the node and the supported path up front
    unsupported = {n for n in (type(x).__name__ for x in plan.walk())
                   if not hasattr(DistExecutor, f"_run_{n}")}
    if unsupported:
        raise NotImplementedError(
            f"plan nodes {sorted(unsupported)} have no distributed "
            "execution; run this query on a single-chip Session "
            "(mesh=None) instead")

    capacities: dict[int, int] = dict(getattr(plan, "_dist_caps", {}))
    jit_cache = getattr(plan, "_dist_jit_cache", None)
    if jit_cache is None:
        jit_cache = plan._dist_jit_cache = {}

    names = sorted(dist_tables)
    meta = {n: (dist_tables[n].part_keys, dist_tables[n].replicated) for n in names}
    ndev = mesh.devices.size

    sels = plan_block_selections(plan, dist_tables, ndev)
    sel_ids = sorted(sels)

    trace_holder: dict = {}

    def make_fn(caps):
        def body(*args):
            tabs, selarrs = args[:len(names)], args[len(names):]
            dts = {
                n: DistTable(t, meta[n][0], meta[n][1])
                for n, t in zip(names, tabs)
            }
            block_sel = {nid: (sarr, sels[nid][1])
                         for nid, sarr in zip(sel_ids, selarrs)}
            ctx = plan_mod.ExecContext({}, dict(caps))
            trace_holder["ctx"] = ctx
            ex = DistExecutor(ctx, dts, block_sel)
            out = ex.run(plan)
            table = out.table
            if replicate_result:
                if not out.replicated:
                    table = shuf.gather_rows(table, AXIS)
            elif out.replicated:
                # keep one copy: only device 0's rows stay live in the
                # host-collected (device-major) output
                table = table.with_live(
                    table.live_mask() & (lax.axis_index(AXIS) == 0))
            flags = {k: lax.psum(jnp.asarray(v, jnp.int32), AXIS)
                     for k, v in ctx.overflows.items()}
            return table, flags

        in_specs = tuple(
            jax.tree_util.tree_map(
                lambda _: P() if meta[n][1] else P(AXIS), dist_tables[n].table)
            for n in names
        ) + tuple(P(AXIS) for _ in sel_ids)
        # the result stays SHARDED (device-major concat on collection): no
        # final all_gather replicating the whole result to every device
        tspec = P() if replicate_result else P(AXIS)
        fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=(tspec, P()), check_vma=False)
        return jax.jit(fn)

    sel_args = [jnp.asarray(sels[i][0]) for i in sel_ids]
    from starrocks_tpu.utils import failpoint
    for _ in range(max_retries):
        failpoint.hit("dist.execute")
        key = (replicate_result,) + tuple(sorted(capacities.items()))
        if key not in jit_cache:
            jit_cache[key] = make_fn(dict(capacities))
        out, flags = jit_cache[key](
            *[dist_tables[n].table for n in names], *sel_args)
        flagged = [k for k, f in flags.items() if int(f) > 0]
        if not flagged:
            plan._dist_caps = dict(capacities)
            return out
        tctx = trace_holder.get("ctx")
        for k in flagged:
            cur = capacities.get(k)
            if cur is None and tctx is not None:
                # seed growth from the size the trace ACTUALLY used (its
                # default insert), not the node's cold 4096 default —
                # avoids restarting capacity growth from scratch on big
                # shuffles (each wasted step is a minutes-scale recompile)
                cur = tctx.capacities.get(k)
            if cur is None:
                nid = k[0] if isinstance(k, tuple) else k
                node = next((n for n in plan.walk() if n.node_id == nid), None)
                if node is not None and hasattr(node, "capacity"):
                    cur = node.capacity
                elif node is not None and hasattr(node, "est_groups"):
                    cur = hash_agg._next_pow2(max(16, node.est_groups * 2))
                else:
                    cur = 1024
            # compaction slots (>=110) start deliberately small; grow them
            # fast so a dense input costs at most ~2 extra recompiles
            growth = 16 if (isinstance(k, tuple) and len(k) == 2
                            and isinstance(k[1], int) and k[1] >= 110) else 4
            capacities[k] = cur * growth
    raise RuntimeError("distributed plan did not converge after capacity retries")
