"""SQL-level window functions and GROUPING SETS / ROLLUP / CUBE.

Mirrors the reference's analytic tests (be/test/exec/analytor_test.cpp,
fe plan tests for AnalyticExpr) and RepeatNode grouping-sets behavior
(be/src/exec/repeat_node.cpp)."""
import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Table
from starrocks_tpu.exec.session import Session


@pytest.fixture(scope="module")
def sess():
    rng = np.random.default_rng(5)
    n = 600
    df = pd.DataFrame({
        "g": rng.integers(0, 6, n),
        "o": rng.integers(0, 40, n),
        "v": rng.integers(0, 100, n).astype(np.int64),
    })
    t = Table.from_pydict({"g": (df.g.to_numpy(), dt.INT64),
                           "o": (df.o.to_numpy(), dt.INT64),
                           "v": (df.v.to_numpy(), dt.INT64)})
    return df, Session({"t": t})


def test_rank_and_partition_sum(sess):
    df, s = sess
    out = s.sql("select g, o, v, rank() over (partition by g order by o) rk, "
                "sum(v) over (partition by g) tv from t order by g, o, v")
    chk = df.assign(rk=df.groupby("g").o.rank(method="min").astype(int),
                    tv=df.groupby("g").v.transform("sum"))
    chk = chk.sort_values(["g", "o", "v"], kind="stable").reset_index(drop=True)
    np.testing.assert_array_equal(out.rk, chk.rk)
    np.testing.assert_array_equal(out.tv, chk.tv)


def test_window_over_aggregate(sess):
    df, s = sess
    out = s.sql("select g, sum(v) sv, rank() over (order by sum(v) desc) rk "
                "from t group by g order by rk, g")
    want = df.groupby("g").v.sum().reset_index().rename(columns={"v": "sv"})
    want["rk"] = want.sv.rank(method="min", ascending=False).astype(int)
    want = want.sort_values(["rk", "g"]).reset_index(drop=True)
    np.testing.assert_array_equal(out.sv, want.sv)
    np.testing.assert_array_equal(out.rk, want.rk)


def test_rows_frame_running_sum(sess):
    df, s = sess
    out = s.sql("select g, o, v, sum(v) over (partition by g order by o, v "
                "rows between unbounded preceding and current row) rs "
                "from t order by g, o, v")
    d = df.reset_index().sort_values(["g", "o", "v", "index"], kind="stable")
    d["rs"] = d.groupby("g").v.cumsum()
    # ties on (o, v) make intra-group order nondeterministic between engines;
    # compare multisets per (g, o, v)
    got = out.groupby(["g", "o", "v"]).rs.apply(sorted).to_dict()
    want = d.groupby(["g", "o", "v"]).rs.apply(sorted).to_dict()
    assert got == want


def test_lag_lead_sql(sess):
    df, s = sess
    out = s.sql("select g, o, v, lag(v, 1, -1) over (partition by g "
                "order by o, v) lg from t order by g, o, v")
    d = df.reset_index().sort_values(["g", "o", "v", "index"], kind="stable")
    d["lg"] = d.groupby("g").v.shift(1).fillna(-1).astype(int)
    got = out.groupby(["g", "o", "v"]).lg.apply(sorted).to_dict()
    want = d.groupby(["g", "o", "v"]).lg.apply(sorted).to_dict()
    assert got == want


def test_rollup_grouping(sess):
    df, s = sess
    out = s.sql("select g, o, sum(v) sv, grouping(g) gg, grouping(o) go "
                "from t group by rollup(g, o) order by gg, go, g, o")
    n2 = len(df.groupby(["g", "o"]))
    n1 = df.g.nunique()
    assert len(out) == n2 + n1 + 1
    # detail level exact
    detail = out[(out.gg == 0) & (out.go == 0)]
    want = df.groupby(["g", "o"]).v.sum().reset_index()
    np.testing.assert_array_equal(detail.sv.to_numpy(), want.v.to_numpy())
    # subtotal level
    sub = out[(out.gg == 0) & (out.go == 1)]
    want1 = df.groupby("g").v.sum().reset_index()
    np.testing.assert_array_equal(sub.sv.to_numpy(), want1.v.to_numpy())
    assert sub.o.isna().all()
    # grand total
    total = out[out.gg == 1]
    assert len(total) == 1 and total.sv.iloc[0] == df.v.sum()


def test_cube_counts(sess):
    df, s = sess
    out = s.sql("select g, o, count(*) c from t group by cube(g, o)")
    assert len(out) == (len(df.groupby(["g", "o"])) + df.g.nunique()
                        + df.o.nunique() + 1)


def test_grouping_sets_having(sess):
    df, s = sess
    out = s.sql("select g, sum(v) sv from t "
                "group by grouping sets ((g), ()) "
                "having sum(v) > 100 order by g")
    per_g = df.groupby("g").v.sum()
    want_n = int((per_g > 100).sum()) + (1 if df.v.sum() > 100 else 0)
    assert len(out) == want_n
