import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops.sort import SortKey
from starrocks_tpu.ops.window import WindowSpec, window


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "p": rng.integers(0, 20, n),
        "o": rng.integers(0, 50, n),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    t = Table.from_pydict({
        "p": (df.p.to_numpy(), dt.INT64),
        "o": (df.o.to_numpy(), dt.INT64),
        "v": (df.v.to_numpy(), dt.INT64),
    })
    return df, t


def test_row_number_rank_dense_rank(data):
    df, t = data
    out = window(t, ["p"], [SortKey("o")], [
        WindowSpec("row_number", None, "rn"),
        WindowSpec("rank", None, "rk"),
        WindowSpec("dense_rank", None, "dr"),
    ]).to_pandas()
    g = df.sort_values(["p", "o"], kind="stable").groupby("p")
    want_rn = df.assign(rn=g.cumcount() + 1)
    np.testing.assert_array_equal(out.rn, want_rn.rn)
    want_rk = df.groupby("p").o.rank(method="min").astype(int)
    np.testing.assert_array_equal(out.rk, want_rk)
    want_dr = df.groupby("p").o.rank(method="dense").astype(int)
    np.testing.assert_array_equal(out.dr, want_dr)


def test_partition_sum_and_running_sum(data):
    df, t = data
    out = window(t, ["p"], [SortKey("o")], [
        WindowSpec("sum", "v", "total"),
        WindowSpec("sum", "v", "running", running=True),
        WindowSpec("count", None, "cnt"),
        WindowSpec("min", "v", "mn"),
        WindowSpec("max", "v", "mx"),
        WindowSpec("avg", "v", "av"),
    ]).to_pandas()
    want_total = df.groupby("p").v.transform("sum")
    np.testing.assert_array_equal(out.total, want_total)
    # running sum needs a deterministic order: sort stable by (p, o, idx)
    df2 = df.reset_index().sort_values(["p", "o", "index"], kind="stable")
    df2["running"] = df2.groupby("p").v.cumsum()
    want_running = df2.sort_values("index").running.to_numpy()
    np.testing.assert_array_equal(out.running, want_running)
    np.testing.assert_array_equal(out.cnt, df.groupby("p").v.transform("count"))
    np.testing.assert_array_equal(out.mn, df.groupby("p").v.transform("min"))
    np.testing.assert_array_equal(out.mx, df.groupby("p").v.transform("max"))
    np.testing.assert_allclose(out.av, df.groupby("p").v.transform("mean"))


def test_window_no_partition():
    t = Table.from_pydict({"v": (np.array([3, 1, 2], np.int64), dt.INT64)})
    out = window(t, [], [SortKey("v")], [
        WindowSpec("row_number", None, "rn"),
        WindowSpec("sum", "v", "run", running=True),
    ]).to_pandas()
    assert list(out.rn) == [3, 1, 2]
    assert list(out.run) == [6, 1, 3]


def test_navigation_functions(data):
    df, t = data
    out = window(t, ["p"], [SortKey("o"), SortKey("v")], [
        WindowSpec("lag", "v", "lg"),
        WindowSpec("lead", "v", "ld", offset=2),
        WindowSpec("first_value", "v", "fv"),
        WindowSpec("last_value", "v", "lv"),
    ]).to_pandas()
    df2 = df.reset_index().sort_values(["p", "o", "v", "index"], kind="stable")
    g = df2.groupby("p")
    df2["lg"] = g.v.shift(1)
    df2["ld"] = g.v.shift(-2)
    df2["fv"] = g.v.transform("first")
    df2["lv"] = g.v.transform("last")
    back = df2.sort_values("index")
    for c in ("lg", "ld"):
        w = back[c].to_numpy()
        got = out[c].to_numpy()
        nulls = pd.isna(w)
        assert (pd.isna(got) == nulls).all()
        assert (got[~nulls].astype(np.int64) == w[~nulls].astype(np.int64)).all()
    np.testing.assert_array_equal(out.fv, back.fv)
    np.testing.assert_array_equal(out.lv, back.lv)


def test_rank_distribution_functions(data):
    df, t = data
    out = window(t, ["p"], [SortKey("o")], [
        WindowSpec("percent_rank", None, "pr"),
        WindowSpec("cume_dist", None, "cd"),
        WindowSpec("ntile", None, "nt", param=4),
    ]).to_pandas()
    want_pr = df.groupby("p").o.rank(method="min").sub(1) / \
        df.groupby("p").o.transform("size").sub(1).clip(lower=1)
    np.testing.assert_allclose(out.pr, want_pr, rtol=1e-12)
    want_cd = df.groupby("p").o.rank(method="max") / \
        df.groupby("p").o.transform("size")
    np.testing.assert_allclose(out.cd, want_cd, rtol=1e-12)
    # ntile: bucket sizes within each partition differ by at most one and
    # are ordered
    chk = pd.DataFrame({"p": df.p, "o": df.o, "nt": out.nt})
    for p, grp in chk.groupby("p"):
        sizes = grp.nt.value_counts()
        assert sizes.max() - sizes.min() <= 1
        s = grp.sort_values(["o"], kind="stable")
        assert (np.diff(s.nt) >= 0).all()


def test_range_frame_running_sum(data):
    df, t = data
    out = window(t, ["p"], [SortKey("o")], [
        WindowSpec("sum", "v", "rs", running=True, peers=True),
    ]).to_pandas()
    # RANGE UNBOUNDED PRECEDING: ties on o share the summed value
    df2 = df.reset_index().sort_values(["p", "o", "index"], kind="stable")
    df2["cs"] = df2.groupby("p").v.cumsum()
    peer_last = df2.groupby(["p", "o"]).cs.transform("last")
    df2["rs"] = peer_last
    want = df2.sort_values("index").rs.to_numpy()
    np.testing.assert_array_equal(out.rs, want)
