"""Variance/stddev/percentile aggregates vs pandas/numpy oracles.

Covers the statistical members of the reference's aggregate function set
(be/src/exprs/agg/variance.h, percentile_cont in agg factory) on the dense,
sorted, and global aggregation paths.
"""

import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.plan import Aggregate, Scan, execute
from starrocks_tpu.ops.hash_agg import AggSpec


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    n = 5000
    k = rng.integers(0, 7, n).astype(np.int64)
    v = rng.normal(100.0, 15.0, n)
    valid = rng.random(n) > 0.1
    return k, v, valid


def _table(k, v, valid):
    vc = Column.from_numpy(v, dt.FLOAT64, valid=valid)
    return {"t": Table(columns={
        "k": Column.from_numpy(k, dt.INT64), "v": vc})}


def _gold(k, v, valid):
    return pd.DataFrame({"k": k, "v": np.where(valid, v, np.nan)})


@pytest.mark.parametrize("fn,pd_fn", [
    ("var_pop", lambda s: s.var(ddof=0)),
    ("var_samp", lambda s: s.var(ddof=1)),
    ("stddev_pop", lambda s: s.std(ddof=0)),
    ("stddev_samp", lambda s: s.std(ddof=1)),
])
def test_groupby_variance(data, fn, pd_fn):
    k, v, valid = data
    plan = Aggregate(Scan("t"), ("k",), (AggSpec(fn, "v", "o"),), est_groups=8)
    got = execute(plan, _table(k, v, valid)).to_pandas().sort_values("k")
    want = _gold(k, v, valid).groupby("k").v.apply(pd_fn)
    np.testing.assert_allclose(got.o.to_numpy(), want.to_numpy(), rtol=1e-9)


@pytest.mark.parametrize("q", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_groupby_percentile_cont(data, q):
    k, v, valid = data
    plan = Aggregate(Scan("t"), ("k",),
                     (AggSpec("percentile_cont", "v", "o", q),), est_groups=8)
    got = execute(plan, _table(k, v, valid)).to_pandas().sort_values("k")
    want = _gold(k, v, valid).groupby("k").v.quantile(q, interpolation="linear")
    np.testing.assert_allclose(got.o.to_numpy(), want.to_numpy(), rtol=1e-12)


def test_groupby_percentile_disc(data):
    k, v, valid = data
    plan = Aggregate(Scan("t"), ("k",),
                     (AggSpec("percentile_disc", "v", "o", 0.5),), est_groups=8)
    got = execute(plan, _table(k, v, valid)).to_pandas().sort_values("k")
    # discrete median: smallest value with cume_dist >= 0.5
    df = _gold(k, v, valid)
    want = df.groupby("k").v.apply(
        lambda s: np.sort(s.dropna().to_numpy())[
            max(int(np.ceil(0.5 * s.count())) - 1, 0)])
    np.testing.assert_allclose(got.o.to_numpy(), want.to_numpy(), rtol=0)


def test_global_variance_percentile(data):
    k, v, valid = data
    plan = Aggregate(Scan("t"), (), (
        AggSpec("var_samp", "v", "vs"),
        AggSpec("stddev_pop", "v", "sp"),
        AggSpec("percentile_cont", "v", "med", 0.5),
    ))
    got = execute(plan, _table(k, v, valid)).to_pandas()
    s = pd.Series(np.where(valid, v, np.nan))
    np.testing.assert_allclose(got.vs[0], s.var(ddof=1), rtol=1e-9)
    np.testing.assert_allclose(got.sp[0], s.std(ddof=0), rtol=1e-9)
    np.testing.assert_allclose(got.med[0], s.quantile(0.5), rtol=1e-12)


def test_sql_stat_aggs(data):
    from starrocks_tpu.exec.session import Session

    k, v, valid = data
    s = Session(_table(k, v, valid))
    got = s.sql("select k, variance(v), stddev_samp(v), percentile_cont(v, 0.75),"
                " approx_count_distinct(k)"
                " from t group by k order by k")
    df = _gold(k, v, valid)
    g = df.groupby("k").v
    np.testing.assert_allclose(got.iloc[:, 1].to_numpy(),
                               g.apply(lambda x: x.var(ddof=0)).to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(got.iloc[:, 2].to_numpy(),
                               g.apply(lambda x: x.std(ddof=1)).to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(got.iloc[:, 3].to_numpy(),
                               g.quantile(0.75).to_numpy(), rtol=1e-12)
    assert got.iloc[:, 4].tolist() == [1] * 7


def test_distinct_sketch_family(tpch_tables):
    """The approximate members (ndv / approx_count_distinct / hll_union_agg)
    run as real HLL register sketches (be/src/types/hll.h analog) — within
    a few percent of truth, never sorting the input; the exact members
    (bitmap_union_count, multi_distinct_count) match count(distinct)."""
    from starrocks_tpu.exec.session import Session
    sess = Session(dict(tpch_tables))
    base = sess.sql("select count(distinct l_suppkey) c from lineitem").iloc[0, 0]
    for fn in ["ndv(l_suppkey)", "approx_count_distinct(l_suppkey)",
               "hll_union_agg(hll_hash(l_suppkey))"]:
        got = sess.sql(f"select {fn} c from lineitem").iloc[0, 0]
        assert abs(got - base) <= max(0.05 * base, 2), fn
    for fn in ["bitmap_union_count(to_bitmap(l_suppkey))",
               "multi_distinct_count(l_suppkey)"]:
        got = sess.sql(f"select {fn} c from lineitem").iloc[0, 0]
        assert got == base, fn
    # grouped form: HLL per group within tolerance
    a = sess.sql("select l_returnflag, ndv(l_suppkey) c from lineitem"
                 " group by l_returnflag order by l_returnflag")
    b = sess.sql("select l_returnflag, count(distinct l_suppkey) c"
                 " from lineitem group by l_returnflag order by l_returnflag")
    assert list(a.l_returnflag) == list(b.l_returnflag)
    for x, y in zip(a.c, b.c):
        assert abs(x - y) <= max(0.06 * y, 2)


def test_multi_distinct_aggregates(tpch_tables):
    """Several COUNT(DISTINCT ...) in one query (the multi-distinct split,
    be/src/exprs/agg multi-distinct family; r2 lifted the single-distinct
    restriction): each distinct runs as its own two-level aggregate and
    rejoins null-safely on the group keys."""
    import pandas as pd
    from starrocks_tpu.exec.session import Session
    sess = Session(dict(tpch_tables))
    got = sess.sql(
        "select l_returnflag, count(distinct l_suppkey) cs,"
        " count(distinct l_partkey) cp, sum(l_quantity) q"
        " from lineitem group by l_returnflag order by l_returnflag")
    import numpy as np
    li = pd.DataFrame({
        "l_returnflag": np.asarray(
            tpch_tables["lineitem"].to_pandas().l_returnflag),
    })
    ref = sess.sql("select l_returnflag, count(distinct l_suppkey) cs"
                   " from lineitem group by l_returnflag order by l_returnflag")
    ref2 = sess.sql("select l_returnflag, count(distinct l_partkey) cp"
                    " from lineitem group by l_returnflag order by l_returnflag")
    assert list(got.cs) == list(ref.cs)
    assert list(got.cp) == list(ref2.cp)
    # global form
    g = sess.sql("select count(distinct l_suppkey) a,"
                 " count(distinct l_partkey) b, count(*) c from lineitem")
    assert g.a[0] == ref.cs.sum() or g.a[0] <= ref.cs.sum()
    assert g.c[0] == tpch_tables["lineitem"].to_pandas().shape[0]
