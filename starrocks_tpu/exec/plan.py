"""Physical query plans.

Analog of StarRocks' ExecNode tree + pipeline decomposition
(be/src/exec/exec_node.h:211, be/src/exec/pipeline/). Execution is
OPERATOR-AT-A-TIME: each plan node's kernel is its own jitted XLA module
over Table pytrees (intermediates stay in HBM; a Filter shares its child's
column arrays and only adds a live mask, so materialization is masks, not
copies). This is deliberate — compiling a whole query as one module made
the TPU compiler re-lower every sort network per query (200s+ compiles,
compiler OOM on join-heavy plans), while per-operator modules are small,
fast to compile, and dedupe across queries in the persistent compilation
cache (two queries grouping 6M rows compile the same module once).
The driver loop of the reference (pipeline_driver.cpp:246) maps to this
eager node walk; DOP/fusion inside an operator are XLA's.

Dynamic sizing (hash-table capacities, join fanout) is static per compile;
each sizing decision is owned by a plan node: in eager mode the node sees
its overflow flag immediately and retries itself with grown sizes (the
analog of StarRocks' two-level hash map conversion, paid as a cached
recompile). In traced mode (multi-chip SPMD programs, graft dry-runs) flags
are reported to the context and the caller owns the retry loop.
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

_live_count = jax.jit(lambda live: jnp.sum(live.astype(jnp.int32)))

# Device dispatch fence (utils/dispatch.py docstring): serializes module
# execution host-side; required for thread safety of jaxlib's client.
from starrocks_tpu.utils.dispatch import EXEC_LOCK as _EXEC_LOCK


class ExecContext:
    """Per-execution state: sizing registry + (traced mode) overflow flags."""

    def __init__(self, tables: dict[str, Table], capacities: Optional[dict] = None,
                 eager: bool = False, frozen: bool = False):
        self.tables = tables
        self.capacities = capacities if capacities is not None else {}
        self.overflows: dict = {}
        self.used_sizes: dict = {}
        self.eager = eager
        # frozen: whole-query traced execution with sizes converged by a
        # prior eager run — compaction/runtime filters apply with their
        # recorded sizes and every correctness flag lands in `overflows`
        # for ONE post-execution readback (the warm path: a query is one
        # jitted dispatch instead of one per operator)
        self.frozen = frozen
        # diagnostic counters (EXPLAIN ANALYZE only: `profile` gates the
        # host syncs they cost) — e.g. runtime-filter probe-row reduction
        self.profile = False
        self.counters: dict = {}
        # node-result memo: a materialized CTE is one shared subplan
        # referenced from several joins (the reference's CTE reuse,
        # MultiCastDataStreamSink analog) — it must run once per execution
        self.results: dict[int, Table] = {}
        # deferred correctness flags: on warm runs (sizes already converged)
        # nodes append device-scalar overflow/fit flags here instead of
        # forcing a host sync each — execute() reads them ALL in one
        # round trip at the end and retries if any fired. The relay round
        # trip is ~30ms; per-op checks made it O(ops) per query.
        self.deferred: list = []

    # -- sizing ------------------------------------------------------------
    def sizes(self, node: "PlanNode", defaults: tuple) -> tuple:
        return tuple(self.capacities.get((node.node_id, i), d)
                     for i, d in enumerate(defaults))

    def capacity(self, key, default: int) -> int:
        """Single-size lookup (used by the distributed executor)."""
        return self.capacities.get(key, default)

    def report(self, key, flag):
        self.overflows[key] = flag

    # -- kernel execution --------------------------------------------------
    def op(self, node: "PlanNode", fn, *args, key=()):
        """Run a pure kernel: inline when traced, as the node's own jitted
        module (cached per static `key`) when eager."""
        if not self.eager:
            return fn(*args)
        from starrocks_tpu.utils import failpoint
        failpoint.hit(f"exec.op.{type(node).__name__}")
        self.dispatches = getattr(self, "dispatches", 0) + 1
        cache = node.__dict__.setdefault("_op_jits", {})
        if key not in cache:
            cache[key] = jax.jit(fn)
        return cache[key](*args)

    def maybe_compact(self, node: "PlanNode", t: Table, tag: str = "c",
                      pre=None, pre_args=(), pre_key=()) -> Table:
        """Eager-mode adaptive compaction: when a table's live fraction is
        low, shrink it to a pow2-padded array of just the live rows so every
        downstream operator runs on the smaller shape. Pow2 targets bound the
        number of compiled shapes; the live-count readback is the same class
        of host sync the capacity-retry flags already pay.

        `pre` (fn(t, *pre_args) -> t) is a pure row-masking transform (e.g.
        a join's runtime filter) fused INTO the compaction dispatch: every
        jitted call costs a fixed round trip on a relay-attached device, so
        pre+compact runs as one kernel on the warm path instead of two.

        In frozen (whole-query traced) mode the sizes a prior eager run
        fitted replay as static shapes with their fit flags reported to
        `overflows` — no host syncs, identical shapes to the warm eager
        path."""
        from starrocks_tpu.config import CONFIG
        if self.frozen:
            ckey = (node.node_id, f"compact:{tag}")
            m = self.capacities.get(ckey)
            if pre is not None:
                t = pre(t, *pre_args)
            if not m:              # never fitted, or fitted as "don't"
                return t
            from starrocks_tpu.column.column import compact_table
            self.overflows[ckey] = _live_count(t.live_mask()) > m
            return compact_table(t, m)
        if (not self.eager or not CONFIG.enable_compaction
                or t.live is None or t.nrows < CONFIG.compaction_min_rows):
            if pre is not None:
                return self.op(node, pre, t, *pre_args, key=("pre",) + pre_key)
            return t
        from starrocks_tpu.column.column import compact_table
        ckey = (node.node_id, f"compact:{tag}")
        m = self.capacities.get(ckey)
        if m is not None:
            # warm path: reuse the fitted size without a live-count readback;
            # a deferred fit-flag catches data that outgrew it
            if m == 0:                  # previously decided "don't compact"
                if pre is not None:
                    return self.op(node, pre, t, *pre_args,
                                   key=("pre",) + pre_key)
                return t

            def kernel(t, *a):
                if pre is not None:
                    t = pre(t, *a)
                return compact_table(t, m), _live_count(t.live_mask()) > m
            out, flag = self.op(node, kernel, t, *pre_args,
                                key=("cfit", tag, m) + pre_key)
            self.deferred.append((ckey, flag))
            return out
        if pre is not None:
            t = self.op(node, pre, t, *pre_args, key=("pre",) + pre_key)
        n_live = int(_live_count(t.live_mask()))
        m = max(1 << max(n_live - 1, 1).bit_length(), CONFIG.compaction_floor)
        if m * 2 > t.nrows:
            self.capacities[ckey] = 0
            return t
        self.capacities[ckey] = m
        return self.op(node, lambda t: compact_table(t, m), t, key=(tag, m))

    def run_sized(self, node: "PlanNode", make_fn, args, defaults: tuple):
        """Run make_fn(sizes)(*args) -> (result, flags). Eager: retry with
        grown sizes until no flag is set. Traced: report flags upward."""
        from starrocks_tpu.config import CONFIG
        sizes = self.sizes(node, defaults)
        if not self.eager:
            out, flags = make_fn(sizes)(*args)
            for i, f in enumerate(flags):
                self.overflows[(node.node_id, i)] = f
                self.used_sizes[(node.node_id, i)] = sizes[i]
            return out
        if all((node.node_id, i) in self.capacities
               for i in range(len(defaults))):
            # warm path: converged sizes from a prior execution — run once,
            # defer the overflow check to the end-of-query batch readback
            out, flags = self.op(node, make_fn(sizes), *args, key=sizes)
            for i, f in enumerate(flags):
                self.deferred.append(((node.node_id, i), f))
            return out
        for _ in range(CONFIG.max_capacity_retries):
            out, flags = self.op(node, make_fn(sizes), *args, key=sizes)
            bad = [i for i, f in enumerate(flags) if bool(f)]
            if not bad:
                for i, s in enumerate(sizes):
                    self.capacities[(node.node_id, i)] = s
                return out
            sizes = tuple(s * CONFIG.capacity_growth_factor if i in bad else s
                          for i, s in enumerate(sizes))
        raise RuntimeError(
            f"node {node.node_id} did not converge after retries")


class PlanNode:
    def __post_init__(self):
        self.node_id = next(_node_counter)

    def __init_subclass__(cls, **kw):
        # wrap each node's run() with per-execution result memoization so a
        # DAG-shaped plan (shared CTE subplan) evaluates each node once
        super().__init_subclass__(**kw)
        inner = cls.__dict__.get("run")
        if inner is None:
            rcn = globals().get("_RowChainNode")
            if rcn is not None and issubclass(cls, rcn):
                inner = rcn.run
        if inner is None:
            return

        def run(self, ctx, _inner=inner):
            memo = getattr(ctx, "results", None)
            if memo is None:
                return _inner(self, ctx)
            r = memo.get(self.node_id)
            if r is None:
                r = _inner(self, ctx)
                memo[self.node_id] = r
            return r

        cls.run = run

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
class BlockScan(PlanNode):
    """Scan only the blocks a plan-time zone-map check kept (the reference's
    zonemap pruning, be/src/storage/rowset/segment_iterator.cpp:220
    _get_row_ranges_by_zone_map). Predicate literals are trace-time
    constants here, so pruning bakes into the compiled program as a static
    gather of the surviving blocks — smaller static shapes, not masks."""
    table: str
    blocks: tuple[int, ...]
    block_rows: int
    columns: Optional[tuple[str, ...]] = None
    # the pruning predicate as closed intervals (col, lo|None, hi|None): a
    # block survives iff its [min,max] intersects every interval. Recorded
    # so the DISTRIBUTED executor can re-prune against per-shard zone maps
    # (the plan-time `blocks` are global-row-order block ids, meaningless
    # after hash placement).
    pred_ranges: tuple = ()

    def run(self, ctx):
        t = ctx.tables[self.table]
        if self.columns is not None:
            t = t.select(list(self.columns))
        B = self.block_rows

        def kernel(t):
            n = t.nrows
            idx = (jnp.asarray(self.blocks, jnp.int32)[:, None] * B
                   + jnp.arange(B, dtype=jnp.int32)[None, :]).reshape(-1)
            inb = idx < n
            return t.gather(jnp.where(inb, idx, 0), idx_valid=inb)

        return ctx.op(self, kernel, t)


class _RowChainNode:
    """Mixin for row-wise operators (Filter/Project/AddColumns) whose pure
    per-table transforms compose. In eager mode, a LINEAR chain of these
    (each link referenced by exactly one parent — shared CTE subplans stay
    unfused so their memoized result is reusable) executes as ONE jitted
    dispatch instead of one per operator. On a local chip this only trims
    Python overhead; through a dispatch-latency-bound link (the axon relay
    costs ~25ms per execute round trip) it is a first-order query-time win.
    The reference gets the same effect from pipeline-driver operator chaining
    (pipeline_driver.cpp:246); XLA fuses the composed elementwise work."""

    def run(self, ctx):
        chain = [self]
        node = self
        rc = getattr(ctx, "refcounts", None)
        if (ctx.eager and rc is not None
                and not getattr(self, "_no_fuse", False)):
            while (isinstance(node.child, _RowChainNode)
                   and rc.get(node.child.node_id, 2) == 1):
                node = node.child
                chain.append(node)
        if len(chain) == 1:
            src = self.child.run(ctx)
            out = ctx.op(self, self._pure, src)
            # frozen mode must consult maybe_compact on EVERY chain node:
            # eager chain fusion records the compaction under the chain
            # HEAD's node id, and the head is often an AddColumns/Project —
            # skipping non-Filters here left frozen/packed modules running
            # downstream ops at the full uncompacted shape (an SSB group-by
            # was sorting 6M rows for 100 groups). With no recorded entry
            # the call is a dict miss, not a kernel.
            if type(self).__name__ == "Filter" or ctx.frozen:
                out = ctx.maybe_compact(self, out)
            return out
        src = node.child.run(ctx)

        def kernel(t):
            for nd in reversed(chain):
                t = nd._pure(t)
            return t
        try:
            out = ctx.op(self, kernel, src, key=("fchain", len(chain)))
        except Exception:
            # some TPU compiler versions reject specific fused compositions
            # (remote_compile 500) that compile fine as separate modules:
            # remember, degrade to per-operator execution (children fuse
            # their own sub-chains, recursively degrading if needed)
            self._no_fuse = True
            src = self.child.run(ctx)
            out = ctx.op(self, self._pure, src)
        if any(type(nd).__name__ == "Filter" for nd in chain):
            out = ctx.maybe_compact(self, out)
        return out


@dataclasses.dataclass(eq=False)
class Filter(_RowChainNode, PlanNode):
    child: PlanNode
    predicate: Expr

    def _pure(self, t):
        p = self.predicate.eval(t)
        mask = p.data if p.valid is None else (p.data & p.valid)
        return t.filter(mask)


@dataclasses.dataclass(eq=False)
class Project(_RowChainNode, PlanNode):
    """Output exactly `outputs` (name -> Expr or column-name str)."""
    child: PlanNode
    outputs: dict

    def _pure(self, t):
        cols = {}
        for name, e in self.outputs.items():
            cols[name] = t[e] if isinstance(e, str) else e.eval(t)
        return Table(columns=cols, live=t.live)


@dataclasses.dataclass(eq=False)
class AddColumns(_RowChainNode, PlanNode):
    """Keep child columns, add computed ones."""
    child: PlanNode
    outputs: dict

    def _pure(self, t):
        for name, e in self.outputs.items():
            t = t.with_column(name, e.eval(t))
        return t


@dataclasses.dataclass(eq=False)
class HashJoin(PlanNode):
    """probe (left) JOIN build (right) ON left_keys == right_keys.

    join_type: inner | left_outer | semi | anti | right_outer | full_outer |
    right_semi | right_anti | null_aware_anti
    (full coverage of StarRocks' TJoinOp set, be/src/exec/hash_joiner.h;
    right/full variants use build-side match flags, the build_match_index
    analog join_hash_map.h:181; null_aware_anti implements NOT IN semantics).
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
    # distributed skew hint (P13): >1 makes a shuffle join salt the probe
    # side across `skew_salt` devices and replicate matching build rows
    # (annotated from ANALYZE heavy-hitter stats by parallel.dist.annotate_skew;
    # the is_skew_join hint analog, be/src/exec/hash_joiner.h:75)
    skew_salt: int = 1
    # null-safe key equality (<=>): NULL keys match NULL keys. Used by the
    # planner's distinct-aggregate split-and-rejoin, where NULL group keys
    # (nullable columns, grouping-sets masking) must rejoin their own group.
    null_safe: bool = False

    # join types where probe rows that cannot match any build key are
    # dropped from (or contribute nothing to) the output — the only types a
    # probe-side runtime filter is semantics-preserving for
    _RF_TYPES = ("inner", "semi", "right_semi", "right_outer", "right_anti")

    def run(self, ctx):
        return self.run_local(ctx, self.probe.run(ctx), self.build.run(ctx))

    def run_local(self, ctx, p: Table, b: Table) -> Table:
        """Join already-resolved probe/build tables. The single-chip run()
        and the distributed executor (after exchange placement) both land
        here, so every kernel/sizing change applies to both paths."""
        from starrocks_tpu.config import CONFIG
        b = ctx.maybe_compact(self, b, tag="cb")
        if ((ctx.eager or ctx.frozen) and CONFIG.enable_runtime_filters
                and self.join_type in self._RF_TYPES):
            use_bloom = (CONFIG.enable_bloom_rf
                         and p.nrows >= CONFIG.bloom_rf_min_probe_rows
                         and b.nrows > _TINY_BUILD_ROWS)
            bpk = CONFIG.bloom_rf_bits_per_key
            if getattr(ctx, "profile", False) and not ctx.frozen:
                before = int(_live_count(p.live_mask()))
                p = ctx.op(self,
                           lambda p, b: self._rf_kernel(p, b, use_bloom, bpk),
                           p, b, key=("rf", use_bloom, bpk))
                ctx.counters[(self.node_id, "rf_rows_dropped")] = \
                    before - int(_live_count(p.live_mask()))
                p = ctx.maybe_compact(self, p, tag="cp")
            else:
                # RF fused into the compaction dispatch (one round trip)
                p = ctx.maybe_compact(
                    self, p, tag="cp",
                    pre=lambda t, bb: self._rf_kernel(t, bb, use_bloom, bpk),
                    pre_args=(b,), pre_key=("rf", use_bloom, bpk))
        else:
            p = ctx.maybe_compact(self, p, tag="cp")
        # size the table off the actual (post-compaction) build shape, not
        # the planner's estimate: 2*Nb slots guarantees load factor <= 0.5
        # even if every row is live, so build-capacity retries (each one a
        # minutes-scale recompile at SF>=1 shapes) never happen. Slots are
        # 4 bytes — over-allocating beats recompiling.
        cap0 = max(16, _cap_pow2(b.nrows))
        if self.join_type == "null_aware_anti":
            return ctx.run_sized(self, self._naa_kernel, (p, b), (cap0,))
        if self.unique:
            return ctx.run_sized(self, self._unique_kernel, (p, b), (cap0,))
        if self.join_type in ("semi", "anti"):
            return ctx.run_sized(self, self._semi_kernel, (p, b), (cap0,))
        if self.join_type in ("right_semi", "right_anti"):
            return ctx.run_sized(self, self._rsemi_kernel, (p, b),
                                 (max(16, _cap_pow2(p.nrows)),))
        return ctx.run_sized(self, self._expand_kernel, (p, b),
                             (cap0, self.fanout))

    def _rf_kernel(self, p, b, use_bloom=False, bits_per_key=8):
        """Probe-side runtime filter: min-max range check plus (for probes
        worth two extra passes) a bloom membership filter over the build
        keys (the RuntimeMembershipFilter analog,
        be/src/exprs/runtime_filter.h:1093). Marks probe rows that cannot
        match any build key dead before the probe; pays off through the
        compaction that follows. Safe only for _RF_TYPES (joins that drop
        unmatched probe rows); bloom false negatives are impossible (both
        sides hash the identical key bytes)."""
        blive = b.live_mask()
        mask = p.live_mask()
        ukeys = self._unified_keys(p, b)
        for pc, bc in zip(*ukeys):
            bd = bc.data.astype(pc.data.dtype)
            bv = blive if bc.valid is None else (blive & bc.valid)
            lo = jnp.min(jnp.where(bv, bd, hash_agg._type_max(bd.dtype)))
            hi = jnp.max(jnp.where(bv, bd, hash_agg._type_min(bd.dtype)))
            ok = (pc.data >= lo) & (pc.data <= hi)
            if pc.valid is not None:
                # plain equi-join: NULL keys never match, drop them here;
                # null-safe (<=>) join: NULL matches NULL, keep them
                ok = (ok | ~pc.valid) if self.null_safe else (ok & pc.valid)
            mask = mask & ok
        if use_bloom:
            from starrocks_tpu.ops import bloom
            pk, bk = ukeys
            nbits = bloom.nbits_for(b.nrows, bits_per_key)
            bits = bloom.build(bk, blive, nbits)
            # NULL keys hash to one sentinel on both sides, so null-safe
            # (NULL<=>NULL) membership is exact; plain-join NULL probe rows
            # were already dropped by the validity check above
            mask = mask & bloom.query(bits, pk)
        return p.with_live(mask)

    def _unified_keys(self, p, b):
        pk = [p[k] for k in self.left_keys]
        bk = [b[k] for k in self.right_keys]
        for i, (pc, bc) in enumerate(zip(pk, bk)):
            # string keys from different dictionaries (e.g. q8's
            # substr(s_zip) = substr(ca_zip)): remap onto the union dict
            if (pc.dtype.is_string and bc.dtype.is_string
                    and pc.dict_id != bc.dict_id):
                pk[i], bk[i] = _unify_dicts(pc, bc)
        return pk, bk

    def _keys(self, p, b):
        pk, bk = self._unified_keys(p, b)
        if self.null_safe:
            # <=> semantics: coalesce NULL key data to 0 and append the
            # validity bit as an extra key column so NULL==NULL matches
            # exactly (no sentinel collisions)
            npk, nbk = [], []
            for pc, bc in zip(pk, bk):
                def ns(c):
                    if c.valid is None:
                        return c
                    data = jnp.where(c.valid, c.data,
                                     jnp.zeros((), c.data.dtype))
                    return Column(data, None, c.dtype, c.dict_id)
                npk.append(ns(pc))
                nbk.append(ns(bc))
                if pc.valid is not None or bc.valid is not None:
                    npk.append(Column(pc.validity().astype(jnp.int32),
                                      None, dt.INT32))
                    nbk.append(Column(bc.validity().astype(jnp.int32),
                                      None, dt.INT32))
            pk, bk = npk, nbk
        return pk, bk

    def _naa_kernel(self, sizes):
        (cap,) = sizes

        def kernel(p, b):
            # NOT IN semantics: drop matches; drop everything if the build
            # set contains a NULL key; drop NULL-key probe rows unless the
            # build set is empty (null-aware-left-anti, hash_joiner.h).
            from starrocks_tpu.ops import merge_join
            probe_cols, build_cols = self._keys(p, b)
            if (cap >= merge_join.MERGE_THRESHOLD
                    or p.nrows >= merge_join.MERGE_PROBE_ROWS):
                matched, _ = merge_join.merge_lookup(
                    build_cols, b.live_mask(), probe_cols, p.live_mask())
                povf = jnp.zeros((), jnp.bool_)
            else:
                bt = hj.build(build_cols, b.live_mask(), cap)
                matched, _, povf = hj.lookup(bt, probe_cols, p.live_mask())
            blive = b.live_mask()
            bnull = jnp.zeros((b.nrows,), jnp.bool_)
            for c in build_cols:
                if c.valid is not None:
                    bnull = bnull | ~c.valid
            build_has_null = jnp.any(blive & bnull)
            build_nonempty = jnp.any(blive)
            pnull = jnp.zeros((p.nrows,), jnp.bool_)
            for c in probe_cols:
                if c.valid is not None:
                    pnull = pnull | ~c.valid
            keep = ~matched & ~build_has_null & (~pnull | ~build_nonempty)
            return p.filter(keep), (povf,)

        return kernel

    def _unique_kernel(self, sizes):
        from starrocks_tpu.ops import merge_join
        (cap,) = sizes

        def kernel(p, b):
            probe_cols, build_cols = self._keys(p, b)
            if b.nrows <= _TINY_BUILD_ROWS:
                matched, row = _tiny_lookup(probe_cols, build_cols,
                                            b.live_mask())
                matched = matched & p.live_mask()
                overflow = jnp.zeros((), jnp.bool_)
            elif (cap >= merge_join.MERGE_THRESHOLD
                    or p.nrows >= merge_join.MERGE_PROBE_ROWS):
                # large input: sort-merge lookup (no hash table, no
                # overflow, no per-iteration probe gathers)
                matched, row = merge_join.merge_lookup(
                    build_cols, b.live_mask(), probe_cols, p.live_mask())
                overflow = jnp.zeros((), jnp.bool_)
            else:
                bt = hj.build(build_cols, b.live_mask(), cap)
                matched, row, overflow = hj.lookup(bt, probe_cols, p.live_mask())
            if self.join_type in ("right_semi", "right_anti", "right_outer",
                                  "full_outer"):
                flags = hj.build_match_flags(row, matched & p.live_mask(),
                                             b.nrows)
                if self.join_type == "right_semi":
                    return b.filter(flags), (overflow,)
                if self.join_type == "right_anti":
                    return b.filter(~flags), (overflow,)
            out = p
            if self.join_type in ("inner", "right_outer"):
                out = out.filter(matched)
                add_valid = None
            elif self.join_type in ("left_outer", "full_outer"):
                add_valid = matched
            elif self.join_type == "semi":
                return p.filter(matched), (overflow,)
            elif self.join_type == "anti":
                return p.filter(~matched), (overflow,)
            else:
                raise ValueError(self.join_type)
            if self.build_cols:
                bsel = Table({n2: b[n2] for n2 in self.build_cols},
                             live=None).gather(row, add_valid)
                for name in self.build_cols:
                    out = out.with_column(name, bsel[name])
            if self.join_type in ("right_outer", "full_outer"):
                out = _append_unmatched_build(out, b, self.build_cols, flags)
            return out, (overflow,)

        return kernel

    def _semi_kernel(self, sizes):
        from starrocks_tpu.ops import merge_join
        (cap,) = sizes

        def kernel(p, b):
            probe_cols, build_cols = self._keys(p, b)
            if b.nrows <= _TINY_BUILD_ROWS:
                matched, _ = _tiny_lookup(probe_cols, build_cols,
                                          b.live_mask())
                povf = jnp.zeros((), jnp.bool_)
            elif (cap >= merge_join.MERGE_THRESHOLD
                    or p.nrows >= merge_join.MERGE_PROBE_ROWS):
                # large input: sort-merge membership (no table, no scatter)
                matched, _ = merge_join.merge_lookup(
                    build_cols, b.live_mask(), probe_cols, p.live_mask())
                povf = jnp.zeros((), jnp.bool_)
            else:
                bt = hj.build(build_cols, b.live_mask(), cap)
                matched, _, povf = hj.lookup(bt, probe_cols, p.live_mask())
            keep = matched if self.join_type == "semi" else ~matched
            return p.filter(keep), (povf,)

        return kernel

    def _rsemi_kernel(self, sizes):
        from starrocks_tpu.ops import merge_join
        (pcap,) = sizes

        def kernel(p, b):
            # right semi/anti need every chained build row marked, not just
            # chain heads: match from the build side instead (symmetric probe
            # into a probe-keys table).
            probe_cols, build_cols = self._keys(p, b)
            if (pcap >= merge_join.MERGE_THRESHOLD
                    or b.nrows >= merge_join.MERGE_PROBE_ROWS):
                bmatched, _ = merge_join.merge_lookup(
                    probe_cols, p.live_mask(), build_cols, b.live_mask())
                povf = jnp.zeros((), jnp.bool_)
            else:
                pt = hj.build(probe_cols, p.live_mask(), pcap)
                bmatched, _, povf = hj.lookup(pt, build_cols, b.live_mask())
            keep = bmatched if self.join_type == "right_semi" else ~bmatched
            return b.filter(keep), (povf,)

        return kernel

    def _expand_kernel(self, sizes):
        cap, fanout = sizes

        def kernel(p, b):
            probe_cols, build_cols = self._keys(p, b)
            bt = hj.build(build_cols, b.live_mask(), cap)
            pi, bi, ok, truncated = hj.probe_expand(
                bt, probe_cols, p.live_mask(), fanout)
            flags2 = (bt.overflow, truncated)
            ok = ok & p.live_mask()[jnp.clip(pi, 0, p.nrows - 1)]
            if self.join_type in ("inner", "right_outer", "full_outer"):
                out = p.gather(pi, None if self.join_type == "full_outer" else ok)
                if self.join_type == "inner":
                    out = out.with_live(out.live_mask() & ok)
                    out = _with_gathered(out, b, self.build_cols, bi)
                    return out, flags2
                flags = hj.build_match_flags(bi, ok, b.nrows)
                if self.join_type == "right_outer":
                    out = out.with_live(out.live_mask() & ok)
                    out = _with_gathered(out, b, self.build_cols, bi)
                else:  # full_outer: keep unmatched probe rows (k=0 lane) w/ NULLs
                    first_lane = (jnp.arange(pi.shape[0]) % fanout) == 0
                    probe_matched, _, _ = hj.lookup(bt, probe_cols,
                                                    p.live_mask())
                    keep = ok | (first_lane
                                 & ~probe_matched[jnp.clip(pi, 0, p.nrows - 1)])
                    out = out.with_live(out.live_mask() & keep)
                    out = _with_gathered(out, b, self.build_cols, bi, ok)
                return (_append_unmatched_build(out, b, self.build_cols, flags),
                        flags2)
            if self.join_type == "left_outer":
                out = p.gather(pi, None)
                # keep one row per unmatched probe row (k=0 lane), NULL build
                first_lane = (jnp.arange(pi.shape[0]) % fanout) == 0
                probe_matched, _, _ = hj.lookup(bt, probe_cols, p.live_mask())
                keep = ok | (first_lane & ~probe_matched[pi])
                out = out.with_live(out.live_mask() & keep)
                out = _with_gathered(out, b, self.build_cols, bi, ok)
                return out, flags2
            raise ValueError(self.join_type)

        return kernel


@dataclasses.dataclass(eq=False)
class Aggregate(PlanNode):
    child: PlanNode
    keys: tuple[str, ...]
    aggs: tuple[AggSpec, ...]
    est_groups: int = 1024

    def run(self, ctx):
        t = ctx.maybe_compact(self, self.child.run(ctx))
        if not self.keys:
            return ctx.op(self, lambda t: _global_agg(t, self.aggs), t)
        return ctx.op(
            self, lambda t: hash_agg.groupby(t, self.keys, self.aggs), t)


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
        if spec.fn in hash_agg.VAR_FNS:
            vf = hash_agg._as_float(c.data, c.dtype)
            s1 = jnp.sum(jnp.where(mask, vf, 0.0))
            s2 = jnp.sum(jnp.where(mask, vf * vf, 0.0))
            data, ok = hash_agg._variance_from_moments(
                spec.fn, s1[None], s2[None], nn[None])
            cols[spec.out] = Column(data, ok, dt.FLOAT64)
            continue
        if spec.fn in hash_agg.HLL_FNS:
            # register scatter-max + harmonic estimate: NO sort of the input
            # (the whole point of the sketch vs exact count(distinct))
            regs = hash_agg.hll_registers(c, mask)
            e = hash_agg.hll_estimate_registers(regs)
            data = jnp.where(nn > 0, jnp.round(e), 0.0).astype(jnp.int64)
            cols[spec.out] = Column(data[None], None, dt.INT64)
            continue
        if spec.fn in hash_agg.PCTL_FNS:
            from starrocks_tpu.ops import scan_utils as _su
            from starrocks_tpu.ops import fast_sort as _fs
            q = float(spec.param if spec.param is not None else 0.5)
            inval = jnp.where(mask, jnp.uint64(0), jnp.uint64(1))
            vcol = Column(c.data, None, c.dtype, c.dict_id, c.vrange)
            perm = _fs.stable_argsort(
                [(inval, 1)] + _fs.normalize_keys(vcol), c.nrows)
            sv = c.data[perm]
            ok_s = mask[perm]
            rank = _su.prefix_sum(ok_s.astype(jnp.int64)) - 1
            if spec.fn == "percentile_disc":
                tgt = jnp.maximum(jnp.ceil(q * nn.astype(jnp.float64)) - 1, 0
                                  ).astype(jnp.int64)
                data = jnp.sum(jnp.where(ok_s & (rank == tgt), sv,
                                         jnp.zeros((), sv.dtype)))[None]
                od = hash_agg._agg_out_dtype(spec, c.dtype)
                cols[spec.out] = Column(
                    data.astype(od.jnp_dtype), (nn > 0)[None], od,
                    c.dict_id if c.dtype.is_string else 0)
                continue
            vf = hash_agg._as_float(sv, c.dtype)
            t = q * jnp.maximum(nn.astype(jnp.float64) - 1.0, 0.0)
            lo, hi = jnp.floor(t).astype(jnp.int64), jnp.ceil(t).astype(jnp.int64)
            vlo = jnp.sum(jnp.where(ok_s & (rank == lo), vf, 0.0))
            vhi = jnp.sum(jnp.where(ok_s & (rank == hi), vf, 0.0))
            data = (vlo + (vhi - vlo) * (t - jnp.floor(t)))[None]
            cols[spec.out] = Column(data, (nn > 0)[None], dt.FLOAT64)
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
class GroupConcat(PlanNode):
    """group_concat(col [, sep]) per group (be/src/exprs/agg/group_concat.h).

    Host-finalized: variable-length string concatenation has no static-shape
    device form, and the output vocabulary is data-dependent (every result
    string must enter the dictionary — a host-metadata operation). The
    groups/values are pulled once, concatenated in input row order, and the
    (small) per-group result re-enters the engine dict-encoded. Eager
    single-chip/stream execution only; distributed plans reject it.
    """
    child: PlanNode
    keys: tuple[str, ...]
    col: str
    out: str
    sep: str = ", "
    distinct: bool = False

    def _strings(self, c: Column, data, valid):
        import numpy as np
        if c.dtype.is_string:
            return dt.dict_values(c.dict_id)[data].astype(object)
        if c.dtype.is_decimal:
            s = 10 ** c.dtype.scale
            a = np.abs(data)
            sign = np.where(data < 0, "-", "")
            return np.char.add(
                np.char.add(np.char.add(sign, (a // s).astype(str)), "."),
                np.char.zfill((a % s).astype(str), c.dtype.scale)
            ).astype(object)
        if c.dtype.kind is dt.TypeKind.DATE:
            import numpy as np
            return np.datetime_as_string(
                data.astype("int64").astype("datetime64[D]"),
                unit="D").astype(object)
        return data.astype(str).astype(object)

    def run(self, ctx):
        return self.finalize(self.child.run(ctx))

    def finalize(self, t: Table) -> Table:
        """Host concatenation over a resolved input table (split out so the
        stream executor can feed a materialized block stream)."""
        import numpy as np
        live = np.asarray(t.live_mask())
        c = t[self.col]
        vdata = np.asarray(c.data)
        vok = live if c.valid is None else (live & np.asarray(c.valid))
        strings = self._strings(c, vdata, vok)
        if not self.keys:
            vals = strings[vok]
            if self.distinct:
                _, first = np.unique(vals.astype(str), return_index=True)
                vals = vals[np.sort(first)]
            s = self.sep.join(vals.tolist())
            out = Column.from_numpy(np.asarray([s], object), dt.STRING,
                                    valid=np.asarray([len(vals) > 0]))
            return Table(columns={self.out: out})
        # group id per row: np.unique over (key data + validity) tuples.
        # NULL keys canonicalize their payload to 0 first so every NULL
        # collapses to ONE group regardless of the dead data underneath
        # (hash_agg treats NULL==NULL; a CASE/nullif-derived key leaves
        # arbitrary bytes under invalid rows)
        keycols = [t[k] for k in self.keys]
        stack = []
        for kc in keycols:
            kd = np.asarray(kc.data)
            if kc.valid is not None:
                kv = np.asarray(kc.valid)
                stack.append(np.where(kv, kd, np.zeros((), kd.dtype)))
                stack.append(kv.astype(np.int8))
            else:
                stack.append(kd)
        rows = np.rec.fromarrays(stack)
        uniq, inv = np.unique(rows[live], return_inverse=True)
        g = len(uniq)
        live_idx = np.nonzero(live)[0]
        cols = {}
        # representative row per group for the key outputs
        rep = np.zeros(g, np.int64)
        rep[inv] = live_idx        # any member row works; last write wins
        for k, kc in zip(self.keys, keycols):
            cols[k] = Column.from_numpy(
                np.asarray(kc.data)[rep], kc.dtype,
                valid=None if kc.valid is None
                else np.asarray(kc.valid)[rep],
                dict_id=kc.dict_id)
        parts: list[list] = [[] for _ in range(g)]
        order = np.argsort(inv, kind="stable")
        for pos in order:
            ridx = live_idx[pos]
            if vok[ridx]:
                parts[inv[pos]].append(strings[ridx])
        outs = np.empty(g, object)
        okv = np.empty(g, bool)
        for i in range(g):
            vals = parts[i]
            if self.distinct:
                seen, ded = set(), []
                for v in vals:
                    if v not in seen:
                        seen.add(v)
                        ded.append(v)
                vals = ded
            okv[i] = len(vals) > 0
            outs[i] = self.sep.join(vals)
        cols[self.out] = Column.from_numpy(outs, dt.STRING, valid=okv)
        return Table(columns=cols)


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
        return self.run_local(ctx, self.left.run(ctx), self.right.run(ctx))

    def run_local(self, ctx, lt: Table, rt: Table) -> Table:
        lt = ctx.maybe_compact(self, lt, tag="cl")
        rt = ctx.maybe_compact(self, rt, tag="cr")
        if self.kind in ("union_all", "union"):
            return ctx.op(self, self._union_kernel, lt, rt)
        return ctx.run_sized(self, self._setop_kernel, (lt, rt),
                             (_cap_pow2(rt.nrows),))

    def _prep(self, lt, rt):
        lnames = lt.column_names()
        rnames = rt.column_names()
        assert len(lnames) == len(rnames), "set op arity mismatch"
        # unify string dictionaries positionally (trace-time host metadata)
        lcols, rcols = {}, {}
        for ln, rn in zip(lnames, rnames):
            a, b = lt[ln], rt[rn]
            if a.dtype.is_string and a.dict_id != b.dict_id:
                a, b = _unify_dicts(a, b)
            lcols[ln], rcols[ln] = a, b
        return lnames, lcols, rcols

    def _union_kernel(self, lt, rt):
        from starrocks_tpu.ops import hash_agg as _ha
        lnames, lcols, rcols = self._prep(lt, rt)
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

    def _setop_kernel(self, sizes):
        from starrocks_tpu.ops import hash_agg as _ha
        from starrocks_tpu.ops import hash_join as _hj
        (cap,) = sizes

        def kernel(lt, rt):
            # intersect/except: distinct left, then semi/anti join on all cols
            from starrocks_tpu.ops import merge_join as _mj
            lnames, lcols, rcols = self._prep(lt, rt)
            ltab = Table(columns=lcols, live=lt.live)
            rtab = Table(columns=rcols, live=rt.live)
            dl = _ha.groupby(ltab, tuple(lnames), ())
            if cap >= _mj.MERGE_THRESHOLD:
                matched, _ = _mj.merge_lookup(
                    [rtab[n] for n in lnames], rtab.live_mask(),
                    [dl[n] for n in lnames], dl.live_mask())
                povf = jnp.zeros((), jnp.bool_)
            else:
                bt = _hj.build([rtab[n] for n in lnames], rtab.live_mask(),
                               cap)
                matched, _, povf = _hj.lookup(bt, [dl[n] for n in lnames],
                                              dl.live_mask())
            keep = matched if self.kind == "intersect" else ~matched
            return dl.filter(keep), (povf,)

        return kernel


def _with_gathered(out: Table, b: Table, names, idx,
                   idx_valid=None) -> Table:
    """Attach b[names] rows `idx` to `out` via ONE stacked row gather
    (Table.gather) instead of one gather per carried column."""
    if not names:
        return out
    g = Table({n: b[n] for n in names}, live=None).gather(idx, idx_valid)
    for n in names:
        out = out.with_column(n, g[n])
    return out


_TINY_BUILD_ROWS = 128


def _tiny_lookup(probe_cols, build_cols, blive):
    """Unrolled broadcast-compare lookup for STATICALLY tiny build sides
    (nation/region-class): M vectorized compares beat both the hash
    probe loop (whose per-iteration gathers cost ~15ns/probe-row on v5e)
    and the sort-merge path (two full-width sorts). Returns
    (matched, build_row) like hash_join.lookup."""
    n = probe_cols[0].data.shape[0]
    m = build_cols[0].data.shape[0]
    pvalid = None
    for c in probe_cols:
        if c.valid is not None:
            pvalid = c.valid if pvalid is None else (pvalid & c.valid)
    matched = jnp.zeros((n,), jnp.bool_)
    row = jnp.zeros((n,), jnp.int32)
    for i in range(m):
        eq = None
        ok_i = blive[i]
        for pc, bc in zip(probe_cols, build_cols):
            e = pc.data == bc.data[i].astype(pc.data.dtype)
            eq = e if eq is None else (eq & e)
            if bc.valid is not None:
                ok_i = ok_i & bc.valid[i]
        eq = eq & ok_i
        if pvalid is not None:
            eq = eq & pvalid
        row = jnp.where(~matched & eq, jnp.int32(i), row)
        matched = matched | eq
    return matched, row


def _append_unmatched_build(out: Table, b: Table, build_cols, flags) -> Table:
    """Right/full-outer tail: append build rows no probe row reached, with
    NULL probe-side columns (the reference emits these from build_match_index
    after probing finishes, join_hash_map.tpp right-join kernels)."""
    app_live = b.live_mask() & ~flags
    nb = b.nrows
    cols = {}
    for name, c in out.columns.items():
        if name in build_cols:
            bc = b[name]
            data = jnp.concatenate([c.data, bc.data.astype(c.data.dtype)])
            valid = (None if c.valid is None and bc.valid is None else
                     jnp.concatenate([c.validity(), bc.validity()]))
        else:
            data = jnp.concatenate([c.data, jnp.zeros((nb,), c.data.dtype)])
            valid = jnp.concatenate([c.validity(), jnp.zeros((nb,), jnp.bool_)])
        cols[name] = Column(data, valid, c.dtype, c.dict_id)
    live = jnp.concatenate([out.live_mask(), app_live])
    return Table(columns=cols, live=live)


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
class CrossJoin(PlanNode):
    """Nested-loop cross product for small sides (the reference's
    CrossJoinNode / NestLoopJoinNode, be/src/exec/cross_join_node.cpp).
    Output row k = (left row k // M, right row k % M); both inputs are
    compacted first so M is the padded live count, not the full capacity."""
    left: PlanNode
    right: PlanNode
    right_cols: tuple[str, ...]

    def run(self, ctx):
        t = ctx.maybe_compact(self, self.left.run(ctx), tag="cl")
        b = ctx.maybe_compact(self, self.right.run(ctx), tag="cr")

        def kernel(t, b):
            n, m = t.nrows, b.nrows
            li = jnp.repeat(jnp.arange(n, dtype=jnp.int32), m)
            ri = jnp.tile(jnp.arange(m, dtype=jnp.int32), n)
            lt = t.gather(li)
            rt = Table({nm: b[nm] for nm in self.right_cols},
                       live=b.live).gather(ri)
            live = lt.live_mask() & rt.live_mask()
            return Table(columns={**lt.columns, **rt.columns}, live=live)

        return ctx.op(self, kernel, t, b)


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

        def kernel(t, s):
            n = t.nrows
            # the single live row of a padded/hashed source need not be row 0
            src_row = jnp.argmax(s.live_mask())
            for name in self.columns:
                c = s[name]
                data = jnp.broadcast_to(c.data[src_row], (n,))
                valid = None if c.valid is None else jnp.broadcast_to(
                    c.valid[src_row], (n,))
                t = t.with_column(name, Column(data, valid, c.dtype, c.dict_id))
            return t

        return ctx.op(self, kernel, t, s)


@dataclasses.dataclass(eq=False)
class Sort(PlanNode):
    child: PlanNode
    keys: tuple[SortKey, ...]
    limit: Optional[int] = None

    def run(self, ctx):
        t = ctx.maybe_compact(self, self.child.run(ctx))
        return ctx.op(self, lambda t: sort_table(t, self.keys, self.limit), t)


@dataclasses.dataclass(eq=False)
class Window(PlanNode):
    """Analytic window evaluation (Analytor analog, be/src/exec/analytor.h:52):
    appends window-function result columns; all specs share one
    (partition, order) sort."""
    child: PlanNode
    partition_by: tuple[str, ...]
    order_by: tuple[SortKey, ...]
    specs: tuple

    def run(self, ctx):
        from starrocks_tpu.ops.window import window as _window
        t = ctx.maybe_compact(self, self.child.run(ctx))
        return ctx.op(
            self,
            lambda t: _window(t, self.partition_by, self.order_by, self.specs),
            t)


@dataclasses.dataclass(eq=False)
class Limit(PlanNode):
    child: PlanNode
    n: int

    def run(self, ctx):
        from starrocks_tpu.ops import scan_utils as su
        t = self.child.run(ctx)

        def kernel(t):
            live = t.live_mask()
            rank = su.prefix_sum(live.astype(jnp.int32)) - 1
            return t.with_live(live & (rank < self.n))

        return ctx.op(self, kernel, t)


def _plan_traceable(plan: PlanNode) -> bool:
    """Can the whole plan run inside one traced program? (GroupConcat
    finalizes on host and is the one non-traceable node.)"""
    return all(not isinstance(n, GroupConcat) for n in plan.walk())


def _build_frozen_fn(plan: PlanNode, caps: dict):
    """jit the whole plan with frozen converged sizes. Returns (fn, keys):
    fn(tables) -> (Table, bool[len(keys)] flags); `keys` (filled at trace
    time) name each flag's capacity entry so the caller can drop stale ones."""
    frozen_caps = dict(caps)
    keys: list = []

    def run_fn(tabs):
        ctx = ExecContext(tabs, dict(frozen_caps), eager=False, frozen=True)
        out = plan.run(ctx)
        keys.clear()
        keys.extend(ctx.overflows.keys())
        if ctx.overflows:
            flags = jnp.stack([jnp.any(f) for f in ctx.overflows.values()])
        else:
            flags = jnp.zeros((0,), jnp.bool_)
        return out, flags

    return jax.jit(run_fn), keys


def _build_frozen_packed_fn(plan: PlanNode, caps: dict, m: int):
    """jit the whole plan PLUS result extraction: the module returns one
    uint8 buffer `[count:int64][overflow flags:u8 x nflags][m packed rows]`.
    A warm query is then ONE dispatch and ONE device->host readback — on a
    relay-attached chip (~30ms per round trip) this is the difference
    between a 40ms and a 120ms floor per query. Returns (fn, keys, spec,
    meta): `keys` name the flag entries, `spec` is the host decode schema
    (column.result_spec), `meta["m"]` the effective packed row count —
    all captured at trace time."""
    from starrocks_tpu.column import column as col
    frozen_caps = dict(caps)
    keys: list = []
    spec: list = []
    meta: dict = {}

    def run_fn(tabs):
        ctx = ExecContext(tabs, dict(frozen_caps), eager=False, frozen=True)
        out = plan.run(ctx)
        keys.clear()
        keys.extend(ctx.overflows.keys())
        if ctx.overflows:
            flags = jnp.stack([jnp.any(f) for f in ctx.overflows.values()]
                              ).astype(jnp.uint8)
        else:
            flags = jnp.zeros((0,), jnp.uint8)
        if out.live is None:
            compacted, count = out, jnp.int64(out.nrows)
        else:
            compacted, count = col._compact_live(out)
            count = count.astype(jnp.int64)
        m_eff = min(m, compacted.nrows)
        meta["m"] = m_eff
        spec.clear()
        spec.extend(col.result_spec(compacted))
        header = jax.lax.bitcast_convert_type(count[None], jnp.uint8
                                              ).reshape(-1)
        return jnp.concatenate(
            [header, flags, col._pack_to_bytes(compacted, m_eff)])

    return jax.jit(run_fn), keys, spec, meta


def execute_df(plan: PlanNode, tables: dict[str, Table]):
    """Warm-path query-to-DataFrame: once the plan has converged AND a
    prior run recorded the result-row bound (`plan._result_m`), run the
    packed frozen module (query + compaction + byte-packing fused) and
    decode on host — one dispatch, one readback. Everything else falls
    back to `execute(...).to_pandas()`:

      - first run per plan (no _result_m): EAGER discovery run that records
        the bound — deliberately avoids compiling the plain frozen module a
        packed one would immediately supersede
      - overflow flags fired (data changed under converged sizes): drop the
        stale sizes, refit eagerly, exact result
      - result grew past the bound: exact eager run now, bigger bound next
      - packed module fails to compile: permanently fall back to the plain
        frozen path for this plan

    The analog chain in the reference is pipeline_driver.cpp's fragment hot
    loop + mysql_result_writer.cpp's serialized result batch — here both
    are one XLA program."""
    import numpy as np
    from starrocks_tpu.config import CONFIG
    from starrocks_tpu.column import column as col

    m = getattr(plan, "_result_m", None)
    packable = (CONFIG.enable_whole_query_jit
                and not getattr(plan, "_frozen_off", False)
                and not getattr(plan, "_packed_off", False)
                and _plan_traceable(plan)
                and col._pack_supported())
    if packable and m is None:
        # discovery run records the result-row bound. Unconverged plans run
        # eagerly (cold convergence was happening anyway; skipping the plain
        # frozen compile avoids building a module the packed one supersedes).
        # Manifest-seeded plans (converged, but never ran here) use the
        # plain frozen path: their per-op eager modules were never compiled
        # and would cost ~30 relay compiles.
        out = execute(plan, tables,
                      allow_frozen=getattr(plan, "_converged", False))
        df = out.to_pandas()
        plan._result_m = max(16, 1 << max(len(df) - 1, 1).bit_length())
        return df
    if not (packable and getattr(plan, "_converged", False)):
        return execute(plan, tables).to_pandas()
    caps = dict(getattr(plan, "_converged_caps", {}))
    key = (tuple(sorted(caps.items(), key=repr)), m)
    cache = plan.__dict__.setdefault("_frozen_packed", {})
    try:
        with _EXEC_LOCK:
            # the lock covers decode too: pandas/pyarrow DataFrame
            # construction is itself not thread-safe in this environment
            # (concurrent string-Index builds segfault inside pyarrow)
            if key not in cache:
                cache[key] = _build_frozen_packed_fn(plan, caps, m)
            fn, fkeys, spec, fmeta = cache[key]
            buf = np.array(fn(tables))   # copy=True: detach from the device buffer
            k = int(np.frombuffer(buf[:8].tobytes(), np.int64)[0])
            nflags = len(fkeys)
            flags = buf[8:8 + nflags]
            bad = [fk for fk, f in zip(fkeys, flags) if f]
            m_eff = fmeta["m"]
            if not bad and k <= m_eff:
                if k == 0:
                    return col.empty_frame(spec)
                return col._decode_packed(buf[8 + nflags:], spec, m_eff, k)
    except Exception as e:
        plan._packed_off = True
        plan._packed_err = e
        return execute(plan, tables).to_pandas()
    if bad:
        # stale converged sizes: drop them and refit eagerly (exact)
        for fk in bad:
            plan._converged_caps.pop(fk, None)
        cache.pop(key, None)
        return execute(plan, tables).to_pandas()
    # result outgrew the packed bound: exact slow-path run now, and a
    # larger bound for the next execution
    plan._result_m = 1 << max(k - 1, 1).bit_length()
    return execute(plan, tables, allow_frozen=False).to_pandas()


def execute(plan: PlanNode, tables: dict[str, Table],
            max_retries: int = None, allow_frozen: bool = True) -> Table:
    with _EXEC_LOCK:
        return _execute_locked(plan, tables, max_retries, allow_frozen)


def _execute_locked(plan: PlanNode, tables: dict[str, Table],
                    max_retries: int = None, allow_frozen: bool = True) -> Table:
    """Eager-then-frozen execution.

    Cold runs are operator-at-a-time eager: each node is its own jitted
    module (module docstring explains why), converging capacities with
    per-node sync-retry (compile time dominates anyway). Once a run
    converges, later runs execute the WHOLE plan as one jitted module with
    the converged sizes frozen in (the reference runs a fragment as one
    driver hot loop, be/src/exec/pipeline/pipeline_driver.cpp:246-360;
    SURVEY §7 demands one jitted program per fragment) — on a
    dispatch-latency-bound link this turns ~30 per-operator round trips
    into one dispatch plus one flag readback. If any frozen-size flag fires
    (data changed under a cached size) the stale entries drop and the query
    reruns eagerly with fresh fitting; if the fused module fails to compile
    (some TPU compilers reject compositions that compile fine separately)
    the plan permanently falls back to eager execution."""
    from starrocks_tpu.config import CONFIG
    if max_retries is None:
        max_retries = CONFIG.max_capacity_retries
    caps = dict(getattr(plan, "_converged_caps", {}))
    refcounts: dict = {}
    for node in plan.walk():
        for c in node.children():
            refcounts[c.node_id] = refcounts.get(c.node_id, 0) + 1
    use_frozen = (allow_frozen and CONFIG.enable_whole_query_jit
                  and getattr(plan, "_converged", False)
                  and not getattr(plan, "_frozen_off", False)
                  and _plan_traceable(plan))
    for _ in range(max_retries):
        if use_frozen:
            key = tuple(sorted(caps.items(), key=repr))
            cache = plan.__dict__.setdefault("_frozen_jits", {})
            try:
                if key not in cache:
                    cache[key] = _build_frozen_fn(plan, caps)
                fn, fkeys = cache[key]
                out, flags = fn(tables)
                flags = jax.device_get(flags)
            except Exception as e:
                plan._frozen_off = True
                plan._frozen_err = e       # diagnosable: why eager fallback
                use_frozen = False
                continue
            bad = [k for k, f in zip(fkeys, flags) if bool(f)]
            if not bad:
                return out
            for k in bad:
                caps.pop(k, None)
            use_frozen = False      # refit eagerly; frozen again next call
            continue
        ctx = ExecContext(tables, caps, eager=True)
        ctx.refcounts = refcounts
        out = plan.run(ctx)
        if not ctx.deferred:
            break
        flags = jax.device_get(jnp.stack([f for _, f in ctx.deferred]))
        bad = [k for (k, _), f in zip(ctx.deferred, flags) if bool(f)]
        if not bad:
            break
        for k in bad:       # refit from scratch on the next pass
            ctx.capacities.pop(k, None)
        caps = ctx.capacities
    plan._converged_caps = dict(ctx.capacities)
    plan._converged = True
    return out


def plan_signature(plan: PlanNode) -> str:
    """Cheap structural fingerprint of a plan: node type names in walk
    order. Used to validate persisted capacity manifests — a planner change
    that reshapes the tree invalidates the manifest (a stale-but-matching
    manifest still degrades gracefully: wrong sizes trip the frozen flags
    and the query refits eagerly)."""
    import hashlib
    raw = "|".join(type(n).__name__ for n in plan.walk())
    return hashlib.sha1(raw.encode()).hexdigest()[:12]


def export_converged(plan: PlanNode):
    """Converged capacities as a JSON-able list keyed by each node's
    position in walk order (node_id is a process-global counter, unstable
    across processes). Returns None until the plan has converged."""
    if not getattr(plan, "_converged", False):
        return None
    pos = {n.node_id: i for i, n in enumerate(plan.walk())}
    out = []
    for (nid, sub), val in getattr(plan, "_converged_caps", {}).items():
        if nid in pos:
            out.append([pos[nid], sub, int(val)])
    exp = {"sig": plan_signature(plan), "caps": out}
    m = getattr(plan, "_result_m", None)
    if m:
        # result-row bound: lets a fresh process compile the PACKED frozen
        # module (query + result extraction in one program) immediately
        exp["result_m"] = int(m)
    return exp


def import_converged(plan: PlanNode, manifest) -> bool:
    """Restore a prior process's converged capacities so the FIRST
    execution runs the frozen whole-query module (one compile, usually a
    persistent-cache hit) instead of paying operator-at-a-time eager
    convergence — the r3/r4 bench's dominant cold cost. Returns False on
    signature mismatch (manifest ignored)."""
    if not manifest or manifest.get("sig") != plan_signature(plan):
        return False
    nodes = list(plan.walk())
    caps = {}
    for idx, sub, val in manifest.get("caps", ()):
        if 0 <= idx < len(nodes):
            caps[(nodes[idx].node_id, sub)] = int(val)
    plan._converged_caps = caps
    plan._converged = True
    if manifest.get("result_m"):
        plan._result_m = int(manifest["result_m"])
    return True


def execute_traced(plan: PlanNode, tables: dict[str, Table],
                   max_retries: int = None) -> Table:
    """Whole-plan single-program execution (one jitted module) with a host
    retry loop on overflow flags. Used where one SPMD program is required
    (graft compile checks, multi-chip dry runs); single-chip queries use the
    eager `execute`."""
    from starrocks_tpu.config import CONFIG
    if max_retries is None:
        max_retries = CONFIG.max_capacity_retries
    growth = CONFIG.capacity_growth_factor
    capacities: dict = getattr(plan, "_traced_caps", {}).copy()
    jit_cache = getattr(plan, "_jit_cache", None)
    if jit_cache is None:
        jit_cache = plan._jit_cache = {}

    used_sizes = {}

    def make_fn(caps):
        def run_fn(tabs):
            ctx = ExecContext(tabs, caps, eager=False)
            out = plan.run(ctx)
            used_sizes.update(ctx.used_sizes)
            return out, ctx.overflows
        return jax.jit(run_fn)

    for _ in range(max_retries):
        key = tuple(sorted(capacities.items()))
        if key not in jit_cache:
            jit_cache[key] = make_fn(dict(capacities))
        out, overflows = jit_cache[key](tables)
        flagged = [k for k, f in overflows.items() if bool(f)]
        if not flagged:
            plan._traced_caps = dict(capacities)
            return out
        for k in flagged:
            capacities[k] = used_sizes.get(k, capacities.get(k, 4096)) * growth
    raise RuntimeError(f"plan did not converge after {max_retries} capacity retries")
