"""Out-of-core streaming execution (exec/stream.py): TPC-H with the fact
tables resident in HOST RAM, streamed through the operators in small blocks.

The tiny block size (4096 rows at SF0.01 -> ~15 lineitem blocks) forces real
multi-block execution through every streaming path: blockwise filters,
probe-side streaming joins, mergeable aggregate states (P8 across time),
streaming top-N, early-exit limit, right-family materialization.

Mirrors the reference's spill/scan-framework tests
(be/test/exec/spill/, be/src/exec/pipeline/scan/scan_operator.cpp:418).
"""
import numpy as np
import pytest

from starrocks_tpu.config import CONFIG, set_config
from starrocks_tpu.exec.session import Session
from starrocks_tpu.exec.stream import HostTable, stream_execute
from starrocks_tpu.golden import tpch_queries as golden
from starrocks_tpu.io import tpch
from starrocks_tpu.sql.tpch_sql import QUERIES

from test_tpch_suite import assert_rows_equal

SF = 0.01


@pytest.fixture(scope="module")
def ooc(tpch_raw, tpch_frames):
    old = CONFIG.stream_block_rows
    set_config(stream_block_rows=1 << 12)
    tables = tpch.to_tables(tpch_raw)
    for big in ("lineitem", "orders"):
        tables[big] = HostTable.from_numpy(tpch_raw[big], tpch.SCHEMAS[big])
    yield Session(tables), tpch_frames
    set_config(stream_block_rows=old)


# representative plan shapes: global agg (q6), wide group agg (q1), top-N
# over joins (q3), exists/anti subqueries (q4, q22), left-outer + group
# (q13), agg-subquery scalar broadcast (q17), big group-by-orderkey semi
# (q18), triple lineitem self-occurrence anti/semi (q21)
STREAM_QUERIES = ["q1", "q3", "q4", "q6", "q13", "q15", "q17", "q18", "q21",
                  "q22"]


@pytest.mark.parametrize("name", STREAM_QUERIES)
def test_stream_query_exact(name, ooc):
    sess, frames = ooc
    got = sess.sql(QUERIES[name])
    want = golden.run(name, frames)
    assert_rows_equal(got, want)


def test_host_table_blocks(tpch_raw):
    ht = HostTable.from_numpy(tpch_raw["lineitem"], tpch.SCHEMAS["lineitem"])
    B = 1000
    n = ht.nrows
    nb = (n + B - 1) // B
    total = 0
    for i in range(nb):
        blk = ht.block(i, B)
        assert blk.nrows == B                       # static shape incl. tail
        total += int(blk.num_live())
    assert total == n

    # string dict round trip via a block
    b0 = ht.block(0, B)
    flags = b0["l_returnflag"]
    assert flags.dtype.is_string and flags.dict_id > 0


def test_stream_limit_early_exit(ooc):
    sess, frames = ooc
    got = sess.sql("select l_orderkey, l_quantity from lineitem "
                   "where l_quantity > 30 limit 7")
    assert len(got) == 7
    assert (got.l_quantity > 30).all()


def test_stream_union_all_chain(ooc, tpch_tables):
    sess, frames = ooc
    q = ("select count(*) c from ("
         " select l_orderkey k from lineitem where l_quantity > 45"
         " union all select o_orderkey k from orders where o_totalprice > 5000"
         ") u")
    got = sess.sql(q)
    want = Session(dict(tpch_tables)).sql(q)   # fully resident engine
    assert got.c[0] == want.c[0] > 0


def test_stream_window_materializes(ooc):
    sess, frames = ooc
    got = sess.sql(
        "select o_custkey, o_totalprice,"
        " rank() over (partition by o_custkey order by o_totalprice desc) rk"
        " from orders where o_totalprice > 400000 order by o_custkey,"
        " rk limit 50")
    # frames keep decimals as int64 cents: the SQL literal 400000 (dollars)
    # is 400000*100 there
    od = frames["orders"][frames["orders"].o_totalprice > 400000 * 100].copy()
    od["rk"] = od.groupby("o_custkey").o_totalprice.rank(
        method="min", ascending=False).astype(int)
    want = od.sort_values(["o_custkey", "rk"]).head(50)
    assert list(got.rk) == list(want.rk)


def test_stream_var_stddev_moments(ooc):
    """var/stddev stream via moment decomposition — must match the resident
    engine bit-for-bit-ish (float64 tolerance)."""
    sess, frames = ooc
    got = sess.sql("select l_returnflag, stddev_samp(l_extendedprice) s,"
                   " var_pop(l_quantity) v from lineitem"
                   " group by l_returnflag order by l_returnflag")
    li = frames["lineitem"]
    g = li.groupby("l_returnflag")
    # frames keep decimals as int64 cents; the engine descales to natural
    # units, so stddev divides by 100 and variance by 100^2
    np.testing.assert_allclose(
        got.s.to_numpy(),
        g.l_extendedprice.std(ddof=1).to_numpy() / 100.0, rtol=1e-9)
    np.testing.assert_allclose(
        got.v.to_numpy(),
        g.l_quantity.apply(lambda x: x.var(ddof=0)).to_numpy() / 10000.0,
        rtol=1e-9)


def test_stream_matches_resident(tpch_raw, tpch_frames):
    """The same query, host-streamed vs fully resident, matches exactly."""
    set_config(stream_block_rows=1 << 12)
    try:
        tables_r = tpch.to_tables(tpch_raw)
        res = Session(dict(tables_r))
        tables_h = dict(tables_r)
        tables_h["lineitem"] = HostTable.from_numpy(
            tpch_raw["lineitem"], tpch.SCHEMAS["lineitem"])
        host = Session(tables_h)
        q = ("select l_returnflag, l_linestatus, sum(l_quantity) q,"
             " avg(l_extendedprice) p, count(*) c from lineitem"
             " where l_shipdate <= date '1998-09-02'"
             " group by l_returnflag, l_linestatus"
             " order by l_returnflag, l_linestatus")
        a, b = host.sql(q), res.sql(q)
        assert_rows_equal(a, b)
    finally:
        set_config(stream_block_rows=1 << 21)


@pytest.fixture
def partitioned_join_cfg():
    old = (CONFIG.stream_block_rows, CONFIG.ooc_partition_build_rows)
    # tiny thresholds: any streamed build triggers the partitioned path
    set_config(stream_block_rows=1 << 10, ooc_partition_build_rows=1 << 11)
    yield
    set_config(stream_block_rows=old[0], ooc_partition_build_rows=old[1])


def test_partitioned_join_q3_q12(partitioned_join_cfg, tpch_raw, tpch_frames):
    """P10: lineitem AND orders both host-resident with the partition
    threshold below the orders build size — the lineitem-orders join runs
    radix-partitioned, partition at a time, still exact."""
    tables = tpch.to_tables(tpch_raw)
    for big in ("lineitem", "orders"):
        tables[big] = HostTable.from_numpy(tpch_raw[big], tpch.SCHEMAS[big])
    sess = Session(tables)
    for q in ("q3", "q12"):
        got = sess.sql(QUERIES[q])
        want = golden.run(q, tpch_frames)
        assert_rows_equal(got, want)


def test_partitioned_join_all_types(partitioned_join_cfg):
    """Partitioned joins are per-partition complete for every equi-join
    type, including outer/right-family emission."""
    import pandas as pd
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column
    rng = np.random.default_rng(23)
    n, m = 6000, 5000
    pk = rng.integers(0, 4000, n).astype(np.int64)
    bk = rng.permutation(8000)[:m].astype(np.int64)   # unique build keys
    tables = {
        "p": HostTable.from_numpy({"k": pk, "v": np.arange(n)},
                                  {"k": dt.INT64, "v": dt.INT64}),
        "b": HostTable.from_numpy({"bk": bk, "bv": bk * 7},
                                  {"bk": dt.INT64, "bv": dt.INT64}),
    }
    sess = Session(tables)
    pf = pd.DataFrame({"k": pk, "v": np.arange(n)})
    bf = pd.DataFrame({"bk": bk, "bv": bk * 7})

    got = sess.sql("select count(*) c, sum(bv) s from p join b on k = bk")
    want = pf.merge(bf, left_on="k", right_on="bk")
    assert got.c[0] == len(want) and got.s[0] == want.bv.sum()

    got = sess.sql("select count(*) c from p left join b on k = bk")
    assert got.c[0] == n

    got = sess.sql("select count(*) c from p where k not in (select bk from b)")
    assert got.c[0] == (~pf.k.isin(bf.bk)).sum()

    got = sess.sql("select count(*) c, count(v) cv from p "
                   "right join b on k = bk")
    wr = pf.merge(bf, left_on="k", right_on="bk", how="right")
    assert got.c[0] == len(wr) and got.cv[0] == wr.v.notna().sum()


def test_stream_group_concat(partitioned_join_cfg):
    """group_concat over a host-streamed table (materialize -> host
    finalization)."""
    from starrocks_tpu.column import dtypes as dt
    tables = {
        "t": HostTable.from_numpy(
            {"g": np.array([1, 1, 2, 2, 2] * 800),
             "s": np.array(["a", "b", "c", "d", "e"] * 800, object)},
            {"g": dt.INT64, "s": dt.STRING}),
    }
    sess = Session(tables)
    df = sess.sql("select g, group_concat(distinct s) cs from t "
                  "group by g order by g")
    assert list(df.cs) == ["a, b", "c, d, e"]


def test_segment_save_load_roundtrip(tmp_path, tpch_raw, tpch_frames):
    """Disk tier: a saved columnar segment re-opens memory-mapped and
    streams through the chip with exact results; precomputed zone maps skip
    the registration scan; checkpoint/resume covers host-tier tables."""
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.golden import tpch_queries as golden
    from starrocks_tpu.sql.tpch_sql import QUERIES
    from test_tpch_suite import assert_rows_equal

    ht = HostTable.from_numpy(tpch_raw["lineitem"], tpch.SCHEMAS["lineitem"])
    seg = str(tmp_path / "lineitem.seg")
    ht.save(seg)
    back = HostTable.load(seg, mmap=True)
    assert back.nrows == ht.nrows
    assert getattr(back, "zmaps", None) is not None or ht.nrows < (1 << 18)
    # memmapped: column data should not be a plain in-RAM ndarray copy
    assert isinstance(back.columns["l_orderkey"].data, np.memmap)

    tables = {n: tpch.to_tables({n: tpch_raw[n]})[n]
              for n in tpch_raw if n != "lineitem"}
    s = Session(dict(tables))
    s.load_segment("lineitem", seg)
    got = s.sql(QUERIES["q6"])
    want = golden.run("q6", tpch_frames)
    got.columns = list(want.columns)
    assert_rows_equal(got, want)

    # string dictionary survives the disk trip
    got2 = s.sql("select l_returnflag, count(*) c from lineitem "
                 "group by l_returnflag order by l_returnflag")
    base = Session(tpch.to_tables(tpch_raw)).sql(
        "select l_returnflag, count(*) c from lineitem "
        "group by l_returnflag order by l_returnflag")
    assert_rows_equal(got2, base)

    # checkpoint/resume with a host-tier table goes through segments
    ckpt = str(tmp_path / "ckpt")
    s.save_catalog(ckpt)
    s2 = Session.load_catalog(ckpt)
    got3 = s2.sql(QUERIES["q6"])
    got3.columns = list(want.columns)
    assert_rows_equal(got3, want)
