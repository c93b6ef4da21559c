"""CAST expressions and WITH (CTE) support through SQL."""

import numpy as np
import pandas as pd

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session


def _sess():
    t = Table(columns={
        "i": Column.from_numpy(np.array([1, -2, 30], np.int64), dt.INT64),
        "d": Column.from_numpy(np.array([155, -250, 999], np.int64), dt.DECIMAL(2)),
        "f": Column.from_numpy(np.array([1.6, -2.5, 0.4]), dt.FLOAT64),
        "s": Column.from_numpy(np.array(["12.5", "3", "-7.25"]), dt.STRING),
        "ds": Column.from_numpy(np.array(["1995-03-15", "2000-01-01", "1992-11-30"]),
                                dt.STRING),
        "k": Column.from_numpy(np.array([0, 0, 1], np.int64), dt.INT64),
    })
    return Session({"t": t})


def test_cast():
    s = _sess()
    assert s.sql("select cast(d as int) from t").iloc[:, 0].tolist() == [1, -2, 9]
    assert s.sql("select cast(f as decimal(10, 1)) from t").iloc[:, 0].tolist() == \
        [1.6, -2.5, 0.4]
    assert s.sql("select cast(i as double) from t").iloc[:, 0].tolist() == \
        [1.0, -2.0, 30.0]
    assert s.sql("select cast(s as double) from t").iloc[:, 0].tolist() == \
        [12.5, 3.0, -7.25]
    assert s.sql("select cast(s as decimal(10, 2)) from t").iloc[:, 0].tolist() == \
        [12.5, 3.0, -7.25]
    got = s.sql("select cast(ds as date) from t").iloc[:, 0].to_numpy()
    np.testing.assert_array_equal(
        got.astype("datetime64[D]"),
        np.array(["1995-03-15", "2000-01-01", "1992-11-30"], "datetime64[D]"))
    assert s.sql("select cast(d as decimal(10, 1)) from t").iloc[:, 0].tolist() == \
        [1.6, -2.5, 10.0]  # round half away from zero


def test_with_cte():
    s = _sess()
    r = s.sql("with big as (select i, k from t where i > 0) "
              "select k, count(*) from big group by k order by k")
    assert r.iloc[:, 0].tolist() == [0, 1]
    assert r.iloc[:, 1].tolist() == [1, 1]

    # two CTEs, second referencing the first; CTE joined with a base table
    r = s.sql(
        "with a as (select i, k from t where i <> 30), "
        "b as (select k, count(*) cnt from a group by k) "
        "select t.i, b.cnt from t join b on t.k = b.k order by t.i")
    assert r.iloc[:, 0].tolist() == [-2, 1]
    assert r.iloc[:, 1].tolist() == [2, 2]
