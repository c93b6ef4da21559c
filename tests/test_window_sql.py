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


@pytest.fixture(scope="module")
def fsess():
    # unique order key per partition -> deterministic frames across engines
    rng = np.random.default_rng(11)
    n = 500
    g = rng.integers(0, 7, n)
    df = pd.DataFrame({"g": g, "v": rng.integers(-50, 100, n).astype(np.int64)})
    df["o"] = df.groupby("g").cumcount()
    t = Table.from_pydict({"g": (df.g.to_numpy(), dt.INT64),
                           "o": (df.o.to_numpy(), dt.INT64),
                           "v": (df.v.to_numpy(), dt.INT64)})
    return df, Session({"t": t})


def _rolling(df, fn, p, f):
    """pandas golden for ROWS BETWEEN p PRECEDING AND f FOLLOWING."""
    d = df.sort_values(["g", "o"], kind="stable")
    win = d.groupby("g").v.rolling(window=p + f + 1, min_periods=1,
                                   center=False)
    # rolling is trailing-only; shift by -f to center the frame end
    res = getattr(win, fn)().reset_index(level=0, drop=True)
    if f:
        res = res.groupby(d.g).shift(-f)
        # frames clipped at partition end still have >=1 row (p>=0 covers
        # the current row); recompute tail rows directly
        for gk, grp in d.groupby("g"):
            vals = grp.v.to_numpy()
            m = len(vals)
            for j in range(max(0, m - f), m):
                lo, hi = max(0, j - p), min(m, j + f + 1)
                res.loc[grp.index[j]] = getattr(np, fn)(vals[lo:hi])
    return d, res


@pytest.mark.parametrize("fn,sqlfn", [("sum", "sum"), ("min", "min"),
                                      ("max", "max"), ("mean", "avg")])
@pytest.mark.parametrize("p,f", [(3, 0), (2, 2), (0, 4)])
def test_bounded_rows_frames(fsess, fn, sqlfn, p, f):
    df, s = fsess
    if f == 0:
        fr = f"rows between {p} preceding and current row"
    elif p == 0:
        fr = f"rows between current row and {f} following"
    else:
        fr = f"rows between {p} preceding and {f} following"
    out = s.sql(f"select g, o, {sqlfn}(v) over (partition by g order by o "
                f"{fr}) r from t order by g, o")
    d, want = _rolling(df, fn, p, f)
    got = out.r.to_numpy().astype(float)
    np.testing.assert_allclose(got, want.to_numpy(), rtol=1e-12)


def test_bounded_count_and_first_last(fsess):
    df, s = fsess
    out = s.sql("select g, o, "
                "count(v) over (partition by g order by o "
                "  rows between 2 preceding and 1 following) c, "
                "first_value(v) over (partition by g order by o "
                "  rows between 2 preceding and 1 following) fv, "
                "last_value(v) over (partition by g order by o "
                "  rows between 2 preceding and 1 following) lv "
                "from t order by g, o")
    d = df.sort_values(["g", "o"], kind="stable").reset_index(drop=True)
    cs, fs, ls = [], [], []
    for gk, grp in d.groupby("g"):
        vals = grp.v.to_numpy()
        m = len(vals)
        for j in range(m):
            lo, hi = max(0, j - 2), min(m, j + 2)
            cs.append(hi - lo)
            fs.append(vals[lo])
            ls.append(vals[hi - 1])
    np.testing.assert_array_equal(out.c.to_numpy(), cs)
    np.testing.assert_array_equal(out.fv.to_numpy(), fs)
    np.testing.assert_array_equal(out.lv.to_numpy(), ls)


def test_unbounded_following_suffix(fsess):
    df, s = fsess
    out = s.sql("select g, o, "
                "min(v) over (partition by g order by o "
                "  rows between current row and unbounded following) sm, "
                "sum(v) over (partition by g order by o "
                "  rows between 1 preceding and unbounded following) ss "
                "from t order by g, o")
    d = df.sort_values(["g", "o"], kind="stable").reset_index(drop=True)
    sms, sss = [], []
    for gk, grp in d.groupby("g"):
        vals = grp.v.to_numpy()
        m = len(vals)
        for j in range(m):
            sms.append(vals[j:].min())
            sss.append(vals[max(0, j - 1):].sum())
    np.testing.assert_array_equal(out.sm.to_numpy(), sms)
    np.testing.assert_array_equal(out.ss.to_numpy(), sss)


def test_range_offset_frames_vs_sqlite(sess):
    """RANGE BETWEEN k PRECEDING/FOLLOWING (value-offset frames) — golden
    diff vs SQLite's window engine on the same data (the Analytor RANGE
    half, be/src/exec/analytor.h:52)."""
    import sqlite3
    df, s = sess
    con = sqlite3.connect(":memory:")
    df.to_sql("t", con, index=False)
    queries = [
        "select g, o, "
        "sum(v) over (partition by g order by o "
        "  range between 5 preceding and 3 following) rs, "
        "min(v) over (partition by g order by o "
        "  range between 5 preceding and 3 following) mn, "
        "max(v) over (partition by g order by o "
        "  range between 10 preceding and current row) mx, "
        "count(v) over (partition by g order by o "
        "  range between current row and 7 following) ct "
        "from t order by g, o",
        "select g, o, sum(v) over (partition by g order by o desc "
        "  range between 4 preceding and 4 following) rs from t order by g, o",
        "select g, o, avg(v) over (partition by g order by o "
        "  range between unbounded preceding and 2 following) av "
        "from t order by g, o",
        "select g, o, first_value(v) over (partition by g order by o "
        "  range between 3 preceding and 3 following) fv from t order by g, o",
    ]
    for q in queries:
        ours = s.sql(q)
        want = pd.read_sql_query(q, con)
        a = ours.sort_values(list(ours.columns)).reset_index(drop=True)
        b = want.sort_values(list(want.columns)).reset_index(drop=True)
        for c in ours.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                np.testing.assert_allclose(av.astype(float), bv.astype(float))
            else:
                np.testing.assert_array_equal(av, bv)


def test_float_window_sum(fsess):
    """sum() over float columns must stay FLOAT64 (advisor r2: the running
    sum was cast to INT64, truncating fractional parts)."""
    df, s = fsess
    s2 = Session({"t": Table.from_pydict({
        "g": (df.g.to_numpy(), dt.INT64),
        "o": (df.o.to_numpy(), dt.INT64),
        "v": (df.v.to_numpy().astype(np.float64) + 0.5, dt.FLOAT64)})})
    out = s2.sql("select g, o, "
                 "sum(v) over (partition by g order by o) run, "
                 "sum(v) over (partition by g order by o "
                 "  rows between 1 preceding and 1 following) fr "
                 "from t order by g, o")
    d = df.assign(v=df.v.astype(np.float64) + 0.5) \
        .sort_values(["g", "o"], kind="stable").reset_index(drop=True)
    runs, frs = [], []
    for gk, grp in d.groupby("g"):
        vals = grp.v.to_numpy()
        m = len(vals)
        for j in range(m):
            runs.append(vals[:j + 1].sum())
            frs.append(vals[max(0, j - 1):j + 2].sum())
    np.testing.assert_allclose(out.run.to_numpy(), runs)
    np.testing.assert_allclose(out.fr.to_numpy(), frs)


def test_wide_rows_frame_minmax_rmq(fsess, monkeypatch):
    """Two-side-bounded min/max frames wider than the static shift window
    route through the sparse-table RMQ."""
    from starrocks_tpu.ops import window as W
    monkeypatch.setattr(W, "_MAX_SHIFT_WINDOW", 8)
    df, s = fsess
    out = s.sql("select g, o, min(v) over (partition by g order by o "
                "rows between 40 preceding and 35 following) mn "
                "from t order by g, o")
    d = df.sort_values(["g", "o"], kind="stable").reset_index(drop=True)
    mns = []
    for gk, grp in d.groupby("g"):
        vals = grp.v.to_numpy()
        m = len(vals)
        for j in range(m):
            mns.append(vals[max(0, j - 40):j + 36].min())
    np.testing.assert_array_equal(out.mn.to_numpy(), mns)
