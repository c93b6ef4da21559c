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
