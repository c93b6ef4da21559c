"""Scalar function library vs pandas/numpy oracles, through SQL.

Mirrors the reference's function unit tests (be/test/exprs/math_functions,
string_functions, time_functions test suites).
"""

import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session


@pytest.fixture(scope="module")
def sess():
    rng = np.random.default_rng(42)
    n = 2000
    ints = rng.integers(-1000, 1000, n)
    dec = rng.integers(-500_00, 500_00, n)           # decimal(2)
    flt = rng.standard_normal(n) * 100
    days = rng.integers(8000, 12000, n)              # ~1991-2002
    words = rng.choice(["Alpha", "beta ", " Gamma", "delta", "x"], n)
    t = Table(columns={
        "i": Column.from_numpy(ints, dt.INT64),
        "d": Column.from_numpy(dec, dt.DECIMAL(2)),
        "f": Column.from_numpy(flt, dt.FLOAT64),
        "dt_": Column.from_numpy(days, dt.DATE),
        "s": Column.from_numpy(words, dt.STRING),
    })
    frame = pd.DataFrame({
        "i": ints, "d": dec / 100.0, "f": flt,
        "dt_": days.astype("datetime64[D]"), "s": words,
    })
    return Session({"t": t}), frame


def _col(sess_frame, sql_expr):
    s, _ = sess_frame
    return s.sql(f"select {sql_expr} from t").iloc[:, 0].to_numpy()


def test_math(sess):
    s, f = sess
    np.testing.assert_array_equal(_col(sess, "abs(i)"), np.abs(f.i))
    np.testing.assert_allclose(_col(sess, "abs(d)").astype(float), np.abs(f.d))
    np.testing.assert_array_equal(_col(sess, "sign(f)"), np.sign(f.f))
    np.testing.assert_array_equal(_col(sess, "mod(i, 7)"),
                                  np.fmod(f.i.to_numpy(), 7))
    np.testing.assert_array_equal(_col(sess, "floor(d)"), np.floor(f.d))
    np.testing.assert_array_equal(_col(sess, "ceil(d)"), np.ceil(f.d))
    np.testing.assert_allclose(_col(sess, "sqrt(abs(f))"),
                               np.sqrt(np.abs(f.f)), rtol=1e-12)
    np.testing.assert_allclose(_col(sess, "exp(f / 100)"),
                               np.exp(f.f / 100), rtol=1e-12)
    np.testing.assert_allclose(_col(sess, "power(abs(f), 1.5)"),
                               np.abs(f.f) ** 1.5, rtol=1e-12)
    np.testing.assert_array_equal(_col(sess, "greatest(i, 0)"),
                                  np.maximum(f.i, 0))
    # ln of non-positive -> NULL
    r = _col(sess, "ln(f)")
    mask = f.f.to_numpy() > 0
    assert all(v is None for v in r[~mask])
    np.testing.assert_allclose(r[mask].astype(float),
                               np.log(f.f.to_numpy()[mask]), rtol=1e-12)


def test_round_half_away(sess):
    # decimal round is exact, half away from zero
    s, _ = sess
    t = Table(columns={"d": Column.from_numpy(
        np.array([250, -250, 149, -149, 355], np.int64), dt.DECIMAL(2))})
    s2 = Session({"t": t})
    assert s2.sql("select round(d, 1) from t").iloc[:, 0].tolist() == [
        2.5, -2.5, 1.5, -1.5, 3.6]
    assert s2.sql("select round(d) from t").iloc[:, 0].tolist() == [
        3.0, -3.0, 1.0, -1.0, 4.0]
    assert s2.sql("select truncate(d, 1) from t").iloc[:, 0].tolist() == [
        2.5, -2.5, 1.4, -1.4, 3.5]


def test_strings(sess):
    s, f = sess
    w = f.s.to_numpy()
    np.testing.assert_array_equal(_col(sess, "upper(s)"),
                                  np.char.upper(w.astype(str)))
    np.testing.assert_array_equal(_col(sess, "trim(s)"),
                                  np.char.strip(w.astype(str)))
    np.testing.assert_array_equal(_col(sess, "length(s)"),
                                  [len(x) for x in w])
    np.testing.assert_array_equal(_col(sess, "reverse(s)"),
                                  [x[::-1] for x in w])
    np.testing.assert_array_equal(
        _col(sess, "concat(s, '!')"), [x + "!" for x in w])
    np.testing.assert_array_equal(
        _col(sess, "concat(s, s)"), [x + x for x in w])
    np.testing.assert_array_equal(
        _col(sess, "starts_with(s, 'A')"), [x.startswith("A") for x in w])
    np.testing.assert_array_equal(
        _col(sess, "replace(s, 'a', '_')"), [x.replace("a", "_") for x in w])
    np.testing.assert_array_equal(
        _col(sess, "lpad(s, 8, '.')"), [x.rjust(8, ".")[:8] for x in w])


def test_dates(sess):
    s, f = sess
    d = pd.DatetimeIndex(f.dt_)
    np.testing.assert_array_equal(_col(sess, "year(dt_)"), d.year)
    np.testing.assert_array_equal(_col(sess, "month(dt_)"), d.month)
    np.testing.assert_array_equal(_col(sess, "day(dt_)"), d.day)
    np.testing.assert_array_equal(_col(sess, "quarter(dt_)"), d.quarter)
    np.testing.assert_array_equal(_col(sess, "dayofyear(dt_)"), d.dayofyear)
    np.testing.assert_array_equal(
        _col(sess, "datediff(dt_, date '1995-01-01')"),
        (d - pd.Timestamp("1995-01-01")).days)
    got = _col(sess, "months_add(dt_, 2)").astype("datetime64[D]")
    want = (d + pd.DateOffset(months=2)).to_numpy().astype("datetime64[D]")
    np.testing.assert_array_equal(got, want)
    got = _col(sess, "date_trunc('month', dt_)").astype("datetime64[D]")
    np.testing.assert_array_equal(
        got, d.to_period("M").to_timestamp().to_numpy().astype("datetime64[D]"))


def test_conditional(sess):
    s, f = sess
    np.testing.assert_array_equal(
        _col(sess, "if(i > 0, 1, 0)"), (f.i > 0).astype(int))
    r = _col(sess, "nullif(i, 0)")
    zero = (f.i == 0).to_numpy()
    assert all(v is None for v in r[zero])
    np.testing.assert_array_equal(r[~zero].astype(int), f.i.to_numpy()[~zero])
    np.testing.assert_array_equal(
        _col(sess, "ifnull(nullif(i, 0), -99)"),
        np.where(zero, -99, f.i))


def test_modulo_operator_sql():
    import numpy as np
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.session import Session
    t = Table(columns={"v": Column.from_numpy(np.arange(100, dtype=np.int64),
                                              dt.INT64)})
    s = Session({"t": t})
    df = s.sql("select v % 7 m, count(*) c from t group by v % 7 order by m")
    assert list(df.m) == list(range(7))
    assert df.c.sum() == 100
