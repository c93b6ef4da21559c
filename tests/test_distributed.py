"""Distributed (8 virtual CPU devices) execution: the PseudoCluster analog.

Runs TPC-H queries SPMD over a shard_map mesh with hash-partitioned tables
and compares against the same pandas goldens as the single-chip suite.
"""

import numpy as np
import pandas as pd
import pytest
import jax

from starrocks_tpu.exec import tpch_plans
from starrocks_tpu.golden import tpch_queries as golden
from starrocks_tpu.parallel import dist as D

from test_tpch_suite import assert_rows_equal

SF = 0.01


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return D.make_mesh(8)


@pytest.fixture(scope="module")
def dist_tables(mesh):
    # build fresh tables (module scope) to place on the mesh
    from starrocks_tpu.io import tpch
    raw = tpch.generate(sf=SF)
    tables = tpch.to_tables(raw)
    frames = tpch.to_pandas(raw)
    return D.place_tables(tables, mesh, D.TPCH_PARTITIONING), frames


def test_shuffle_by_key_roundtrip(mesh):
    """Every row arrives exactly once, and equal keys land on one device."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Table
    from starrocks_tpu.parallel import shuffle as shuf

    rng = np.random.default_rng(7)
    n = 1600
    t = Table.from_pydict({
        "k": (rng.integers(0, 37, n).astype(np.int64), dt.INT64),
        "v": (np.arange(n, dtype=np.int64), dt.INT64),
    })
    pt = D.partition_table(t, None, 8)
    pt = jax.device_put(pt, NamedSharding(mesh, P("d")))

    def body(tab):
        out, overflow = shuf.shuffle_by_key(tab, ("k",), "d", bucket_cap=128)
        # tag each surviving row with its device id
        dev = jax.lax.axis_index("d")
        devcol = jnp.full((out.nrows,), dev, jnp.int64)
        from starrocks_tpu.column.column import Column
        out = out.with_column("dev", Column(devcol, None, dt.INT64))
        return shuf.gather_rows(out, "d"), overflow

    fn = shard_map(body, mesh=mesh, in_specs=(P("d"),), out_specs=(P(), P()),
                   check_vma=False)
    gathered, overflow = jax.jit(fn)(pt)
    assert not bool(np.asarray(overflow).any())
    df = gathered.to_pandas()
    # all n rows exactly once
    assert sorted(df.v) == list(range(n))
    # each key on exactly one device
    per_key_devs = df.groupby("k").dev.nunique()
    assert (per_key_devs == 1).all()


# the FULL 22-query TPC-H suite runs distributed (colocate agg, shuffle +
# broadcast + colocated joins, global agg, outer joins, distinct two-level,
# anti joins, broadcast scalars, windows, setops, cross joins)
DIST_QUERIES = [f"q{i}" for i in range(1, 23)]


@pytest.mark.parametrize("name", DIST_QUERIES)
def test_distributed_query(name, mesh, dist_tables):
    dtabs, frames = dist_tables
    plan = tpch_plans.build(name, SF)
    got = D.dist_execute(plan, dtabs, mesh).to_pandas()
    want = golden.run(name, frames)
    assert_rows_equal(got, want)


def test_distributed_shuffle_hash_join(mesh, dist_tables):
    """Force the shuffle-hash-join path (P4) by dropping the broadcast
    threshold to zero: every non-colocated join hash-partitions BOTH sides.
    Queries must still match the goldens exactly."""
    from starrocks_tpu.config import CONFIG, set_config
    dtabs, frames = dist_tables
    old = CONFIG.dist_broadcast_threshold_rows
    set_config(dist_broadcast_threshold_rows=0)
    try:
        for name in ("q3", "q5", "q10", "q17"):
            # fresh plan object: capacities/jit caches are per-plan
            plan = tpch_plans.build(name, SF)
            got = D.dist_execute(plan, dtabs, mesh).to_pandas()
            want = golden.run(name, frames)
            assert_rows_equal(got, want)
    finally:
        set_config(dist_broadcast_threshold_rows=old)


def test_distributed_range_sort(mesh, dist_tables):
    """Unlimited ORDER BY uses the range-partitioned sort: rows move once,
    per-device peak stays ~N/ndev, global order is exact."""
    from starrocks_tpu.config import CONFIG, set_config
    dtabs, frames = dist_tables
    old = CONFIG.dist_range_sort_threshold_rows
    set_config(dist_range_sort_threshold_rows=0)
    try:
        from starrocks_tpu.exec.plan import Scan, Sort
        from starrocks_tpu.ops.sort import SortKey
        plan = Sort(Scan("orders", ("o_orderkey", "o_totalprice")),
                    (SortKey("o_totalprice", asc=False),
                     SortKey("o_orderkey")), None)
        got = D.dist_execute(plan, dtabs, mesh).to_pandas()
        want = frames["orders"][["o_orderkey", "o_totalprice"]].sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True])
        assert list(got.o_orderkey) == list(want.o_orderkey)
    finally:
        set_config(dist_range_sort_threshold_rows=old)


def test_salted_shuffle_join(mesh):
    """Zipfian probe keys: salted repartition splits the hot key across
    devices while replicated build fragments keep the join local (P13)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.ops import hash_join as hj
    from starrocks_tpu.parallel import shuffle as shuf

    rng = np.random.default_rng(3)
    n = 1600
    # 90% of probe rows share key 0 (the skew case a plain shuffle floods)
    keys = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 64, n))
    probe = Table.from_pydict({
        "k": (keys.astype(np.int64), dt.INT64),
        "v": (np.arange(n, dtype=np.int64), dt.INT64),
    })
    build = Table.from_pydict({
        "bk": (np.arange(64, dtype=np.int64), dt.INT64),
        "bv": (np.arange(64, dtype=np.int64) * 10, dt.INT64),
    })
    pp = jax.device_put(D.partition_table(probe, None, 8),
                        NamedSharding(mesh, P("d")))
    bb = jax.device_put(D.partition_table(build, None, 8),
                        NamedSharding(mesh, P("d")))

    def body(p, b):
        (p2, b2), ovf = shuf.shuffle_salted(
            p, b, ("k",), ("bk",), "d", probe_cap=512, build_cap=128, salt=4)
        bt = hj.build([b2["bk"]], b2.live_mask(), 256)
        matched, row, _ = hj.lookup(bt, [p2["k"]], p2.live_mask())
        bv = b2["bv"].data[row]
        out = p2.with_column("bv", Column(bv, matched, dt.INT64))
        out = out.with_live(out.live_mask() & matched)
        return shuf.gather_rows(out, "d"), ovf

    fn = shard_map(body, mesh=mesh, in_specs=(P("d"), P("d")),
                   out_specs=(P(), P()), check_vma=False)
    gathered, ovf = jax.jit(fn)(pp, bb)
    assert not bool(np.asarray(ovf).any())
    df = gathered.to_pandas()
    assert len(df) == n                      # every probe row joined once
    assert (df.bv == df.k * 10).all()        # against the right build row
    # hot key actually spread across >1 device under salt=4: with plain
    # hashing 90% of rows would land on one chip; salted buckets cap at
    # ~n*0.9/4 + slack per device, which probe_cap=512 < 0.9n enforces


def test_ring_shuffle_reduce_agg(mesh):
    """P12: ppermute-ring shuffle with per-step merge == one-shot shuffle +
    aggregate (here: distributed sum-by-key via ring accumulate)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Table
    from starrocks_tpu.ops import hash_agg
    from starrocks_tpu.ops.hash_agg import AggSpec
    from starrocks_tpu.parallel import shuffle as shuf

    rng = np.random.default_rng(11)
    n = 1600
    t = Table.from_pydict({
        "k": (rng.integers(0, 23, n).astype(np.int64), dt.INT64),
        "v": (rng.integers(0, 1000, n).astype(np.int64), dt.INT64),
    })
    pt = jax.device_put(D.partition_table(t, None, 8),
                        NamedSharding(mesh, P("d")))
    aggs = (AggSpec("sum", "v", "s"),)

    def body(tab):
        acc0, ovf = shuf.ring_shuffle_reduce(
            tab, ("k",), "d", bucket_cap=256,
            init_fn=lambda c: hash_agg.groupby(c, ("k",), aggs),
            step_fn=lambda acc, c: hash_agg.groupby(
                shuf_concat(acc, hash_agg.groupby(c, ("k",), aggs)),
                ("k",), (AggSpec("sum", "s", "s"),)))
        return shuf.gather_rows(acc0, "d"), ovf

    def shuf_concat(a, b):
        import jax.numpy as jnp
        from starrocks_tpu.column.column import Column
        cols = {}
        for name in a.column_names():
            ca, cb = a[name], b[name]
            data = jnp.concatenate([ca.data, cb.data.astype(ca.data.dtype)])
            valid = (None if ca.valid is None and cb.valid is None else
                     jnp.concatenate([ca.validity(), cb.validity()]))
            cols[name] = Column(data, valid, ca.dtype, ca.dict_id)
        live = jnp.concatenate([a.live_mask(), b.live_mask()])
        return Table(columns=cols, live=live)

    fn = shard_map(body, mesh=mesh, in_specs=(P("d"),),
                   out_specs=(P(), P()), check_vma=False)
    gathered, ovf = jax.jit(fn)(pt)
    assert not bool(np.asarray(ovf).any())
    df = gathered.to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd
    want = pd.DataFrame({"k": np.asarray(t["k"].data),
                         "v": np.asarray(t["v"].data)}) \
        .groupby("k", as_index=False).v.sum()
    assert list(df.k) == list(want.k)
    assert list(df.s) == list(want.v)


def test_distributed_sql_window_setop(mesh):
    """SQL with window functions, UNION, and a CTE self-join through the
    SPMD executor (exercises the Window/SetOp/CrossJoin dist handlers)."""
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.io import tpch

    raw = tpch.generate(sf=0.005)
    tables = tpch.to_tables(raw)
    local = Session(dict(tables))
    dist = Session(dict(tables), mesh=mesh)
    queries = [
        # window over aggregate + rank
        """select n_name, sum(s_acctbal) total,
                  rank() over (order by sum(s_acctbal) desc) rk
           from supplier, nation
           where s_nationkey = n_nationkey
           group by n_name order by rk, n_name limit 10""",
        # set op: union distinct across two selects
        """select c_nationkey k from customer where c_acctbal > 5000
           union
           select s_nationkey k from supplier
           order by k""",
        # scalar subquery broadcast (single-row cross join analog)
        """select count(*) big from part
           where p_retailprice > (select avg(p_retailprice) from part)""",
    ]
    for q in queries:
        got = dist.sql(q)
        want = local.sql(q)
        assert got.shape == want.shape, (q, got.shape, want.shape)
        assert got.round(6).equals(want.round(6)) or \
            (got.values == want.values).all(), q


def test_distributed_full_outer_replicated_probe(mesh):
    """Advisor r2 (high): full_outer with a REPLICATED probe and a SHARDED
    build must gather the build — running it locally per shard emits
    unmatched probe rows once per device and spurious NULL-extended rows
    for probe rows matched on another shard."""
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Table
    from starrocks_tpu.exec.plan import HashJoin, Scan

    probe = Table.from_pydict({
        "pk": (np.arange(10, dtype=np.int64), dt.INT64),
        "pv": (np.arange(10, dtype=np.int64) * 2, dt.INT64)})
    build = Table.from_pydict({
        "bk": (np.arange(5, 15, dtype=np.int64), dt.INT64),
        "bv": (np.arange(5, 15, dtype=np.int64) * 100, dt.INT64)})
    dtabs = D.place_tables({"p": probe, "b": build}, mesh,
                           {"p": "replicated", "b": ("bk",)})
    plan = HashJoin(Scan("p"), Scan("b"), ("pk",), ("bk",), "full_outer",
                    ("bk", "bv"), unique=True)
    got = D.dist_execute(plan, dtabs, mesh).to_pandas()
    lhs = pd.DataFrame({"pk": np.arange(10), "pv": np.arange(10) * 2})
    rhs = pd.DataFrame({"bk": np.arange(5, 15), "bv": np.arange(5, 15) * 100})
    want = lhs.merge(rhs, left_on="pk", right_on="bk", how="outer")
    assert len(got) == len(want) == 15
    got_s = got.sort_values(["pk", "bk"], na_position="last") \
        .reset_index(drop=True)
    want_s = want.sort_values(["pk", "bk"], na_position="last") \
        .reset_index(drop=True)
    for c in ("pk", "pv", "bk", "bv"):
        a, b = got_s[c].to_numpy(float), want_s[c].to_numpy(float)
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c


def test_distributed_blockscan_zone_pruning(mesh):
    """Per-shard zone maps restore block pruning in dist mode: a table
    cluster-sorted on `d` stays sorted WITHIN each hash shard (stable
    placement), so most per-shard blocks miss a narrow d-range predicate."""
    import jax.numpy as jnp
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.plan import BlockScan, Filter, Aggregate
    from starrocks_tpu.exprs.expr import col, lift as lit
    from starrocks_tpu.ops.hash_agg import AggSpec

    n = 1 << 14
    rng = np.random.default_rng(5)
    d_sorted = np.sort(rng.integers(0, 10000, n)).astype(np.int64)
    t = Table(columns={
        "k": Column.from_numpy(rng.integers(0, 997, n).astype(np.int64),
                               dt.INT64),
        "d": Column.from_numpy(d_sorted, dt.INT64),
        "v": Column.from_numpy(np.arange(n, dtype=np.int64), dt.INT64),
    })
    dtabs = D.place_tables({"f": t}, mesh, {"f": ("k",)})
    lo, hi = 4000, 4500
    plan = Aggregate(
        Filter(BlockScan("f", blocks=(), block_rows=0,
                         pred_ranges=(("d", lo, hi),)),
               (col("d") >= lit(lo)) & (col("d") <= lit(hi))),
        keys=(), aggs=(AggSpec("sum", "v", "s"), AggSpec("count", "v", "c")))
    # the coordinator must actually prune (shape reduction on every device)
    sels = D.plan_block_selections(plan, dtabs, 8)
    assert sels, "pruning did not engage"
    (sel, B), = sels.values()
    zm_nb = next(iter(dtabs["f"].zone_maps.values()))[0].shape[1]
    assert sel.shape[1] < zm_nb
    got = D.dist_execute(plan, dtabs, mesh).to_pandas()
    mask = (d_sorted >= lo) & (d_sorted <= hi)
    assert got["s"][0] == np.arange(n)[mask].sum()
    assert got["c"][0] == int(mask.sum())


def test_distributed_limit_local_first(mesh):
    """LIMIT takes n rows per shard BEFORE the gather; result is exactly n
    rows all drawn from the (filtered) valid set."""
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.plan import Filter, Limit, Scan
    from starrocks_tpu.exprs.expr import col, lift as lit

    n = 4096
    t = Table(columns={
        "k": Column.from_numpy(np.arange(n, dtype=np.int64), dt.INT64)})
    dtabs = D.place_tables({"f": t}, mesh, {"f": ("k",)})
    plan = Limit(Filter(Scan("f"), col("k") >= lit(1000)), 37)
    got = D.dist_execute(plan, dtabs, mesh).to_pandas()
    assert len(got) == 37
    assert (got["k"].to_numpy() >= 1000).all()


def test_distributed_cross_join_compacted(mesh):
    """Dist CrossJoin compacts both sides first: a selective filter under
    the cross join must not blow up padded-capacity products; results exact."""
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.plan import CrossJoin, Filter, Scan, Aggregate
    from starrocks_tpu.exprs.expr import col, lift as lit
    from starrocks_tpu.ops.hash_agg import AggSpec

    n = 2048
    t = Table(columns={
        "a": Column.from_numpy(np.arange(n, dtype=np.int64), dt.INT64)})
    r = Table(columns={
        "b": Column.from_numpy(np.arange(64, dtype=np.int64), dt.INT64)})
    dtabs = D.place_tables({"l": t, "r": r}, mesh,
                           {"l": ("a",), "r": ("b",)})
    plan = Aggregate(
        CrossJoin(Filter(Scan("l"), col("a") < lit(10)),
                  Filter(Scan("r"), col("b") < lit(5)), ("b",)),
        keys=(), aggs=(AggSpec("count_star", "a", "c"),
                       AggSpec("sum", "b", "sb")))
    got = D.dist_execute(plan, dtabs, mesh).to_pandas()
    assert got["c"][0] == 10 * 5
    assert got["sb"][0] == 10 * (0 + 1 + 2 + 3 + 4)


def test_skew_detection_end_to_end(mesh):
    """ANALYZE heavy-hitter stats must salt the shuffle join through the
    full Session.sql path — including a DERIVED probe (filter + computed
    column above the scan), which the provenance tracer resolves back to
    the base column — and results must match the single-chip session."""
    from starrocks_tpu.config import CONFIG, set_config
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.plan import HashJoin
    from starrocks_tpu.exec.session import Session

    rng = np.random.default_rng(17)
    n = 4000
    # 40% of probe rows share key 7 (> skew_hot_key_fraction=0.3)
    keys = np.where(rng.random(n) < 0.4, 7, rng.integers(0, 64, n))
    fact = Table(columns={
        "k": Column.from_numpy(keys.astype(np.int64), dt.INT64),
        "v": Column.from_numpy(np.arange(n, dtype=np.int64), dt.INT64)})
    dim = Table(columns={
        "dk": Column.from_numpy(np.arange(64, dtype=np.int64), dt.INT64),
        "dv": Column.from_numpy(np.arange(64, dtype=np.int64) * 10,
                                dt.INT64)})
    tables = {"fact": fact, "dim": dim}
    part = {"fact": ("v",), "dim": ("dk",)}   # NOT colocated on the join key
    old = CONFIG.dist_broadcast_threshold_rows
    set_config(dist_broadcast_threshold_rows=0)   # force the shuffle join
    try:
        local = Session(dict(tables))
        distd = Session(dict(tables), mesh=mesh, partitioning=part)
        q = ("select d.dv grp, sum(f.v + 1) s, count(*) c "
             "from fact f join dim d on f.k = d.dk "
             "where f.v >= 0 group by d.dv order by grp")
        got = distd.sql(q)
        want = local.sql(q)
        joins = [nd for nd in distd.plan(q).walk() if isinstance(nd, HashJoin)]
        assert any(j.skew_salt > 1 for j in joins), \
            [f"{j.left_keys}:{j.skew_salt}" for j in joins]
        assert got.shape == want.shape
        assert (got.values == want.values).all()
    finally:
        set_config(dist_broadcast_threshold_rows=old)


def test_distributed_ssb_full(mesh):
    """All 13 SSB-Flat queries distributed vs the single-chip session."""
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.io import ssb
    from starrocks_tpu.sql.ssb_sql import QUERIES

    raw = ssb.generate_flat(sf=0.01)
    t = ssb.to_table(raw)
    local = Session({"lineorder_flat": t})
    distd = Session({"lineorder_flat": t}, mesh=mesh,
                    partitioning={"lineorder_flat": ("lo_orderkey",)})
    for i, name in enumerate(QUERIES):
        got = distd.sql(QUERIES[name])
        want = local.sql(QUERIES[name])
        assert_rows_equal(got, want)
        if i % 5 == 4:
            # mid-test compile-state relief: 13 distributed queries in one
            # process edge toward the jaxlib segfault threshold the
            # conftest documents (per-test clears can't help inside a loop)
            jax.clear_caches()


# variety: straight joins/aggs, rollup (q18/q36), windows (q51/q67/q89),
# returns-fact joins, date-correlated subqueries — incl. the fanout-chain
# shapes that once exploded padded sizes without dist compaction
# >=40 queries (r3 VERDICT ask), deliberately covering: rollup/grouping
# sets (q18/q22/q27/q36/q67/q70/q77/q86), window functions
# (q12/q20/q47/q51/q53/q57/q63/q89/q98), outer/anti/exists right-family
# shapes (q10/q16/q35/q40/q69/q78/q93/q94/q97), multi-join chains the
# cost-based order reshapes (q17/q25/q29/q64), plus the plain agg/join mix
TPCDS_DIST_SAMPLE = [
    "q3", "q7", "q10", "q12", "q15", "q16", "q17", "q18", "q19", "q20",
    "q22", "q25", "q26", "q27", "q29", "q35", "q36", "q40", "q42", "q43",
    "q46", "q47", "q51", "q52", "q53", "q55", "q57", "q63", "q64", "q67",
    "q68", "q69", "q70", "q77", "q78", "q86", "q89", "q93", "q94", "q96",
    "q97", "q98"]


def test_distributed_tpcds_sample(mesh):
    """A TPC-DS sample distributed vs the single-chip session (which the
    single-chip suite already validates against SQLite goldens). Column
    names are compared positionally: unaliased output columns get
    planner-gensym names that differ between independent sessions."""
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.io import tpcds
    from starrocks_tpu.sql.tpcds_sql import QUERIES

    raw = tpcds.generate(sf=0.01)
    tables = tpcds.to_tables(raw)
    facts = {
        "store_sales": ("ss_item_sk",), "store_returns": ("sr_item_sk",),
        "catalog_sales": ("cs_item_sk",), "catalog_returns": ("cr_item_sk",),
        "web_sales": ("ws_item_sk",), "web_returns": ("wr_item_sk",),
        "inventory": ("inv_item_sk",),
    }
    part = {n: facts.get(n, "replicated") for n in tables}
    local = Session(dict(tables))
    distd = Session(dict(tables), mesh=mesh, partitioning=part)
    for i, name in enumerate(TPCDS_DIST_SAMPLE):
        got = distd.sql(QUERIES[name])
        want = local.sql(QUERIES[name])
        got.columns = [f"c{j}" for j in range(got.shape[1])]
        want.columns = [f"c{j}" for j in range(want.shape[1])]
        assert_rows_equal(got, want)
        if i % 5 == 4:
            jax.clear_caches()   # see test_distributed_ssb_full note
