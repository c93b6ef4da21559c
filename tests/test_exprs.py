import numpy as np
import jax
import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exprs import expr as E


def _table():
    return Table.from_pydict({
        "price": (np.array([10000, 20000, 30000], np.int64), dt.DECIMAL(2)),  # cents
        "disc": (np.array([5, 10, 0], np.int64), dt.DECIMAL(2)),
        "qty": (np.array([1, 2, 3], np.int64), dt.INT64),
        "ship": (np.array(["AIR", "RAIL", "SHIP"], object), dt.STRING),
        "d": (np.array([8035, 9000, 10000], np.int32), dt.DATE),
    })


def test_decimal_arith_scales():
    t = _table()
    # price * (1 - disc) : scale 2 * scale 2 -> scale 4
    e = E.col("price") * (E.decimal_lit(1, 2) - E.col("disc"))
    c = e.eval(t)
    assert c.dtype == dt.DECIMAL(4)
    np.testing.assert_array_equal(np.asarray(c.data), [950000, 1800000, 3000000])


def test_compare_mixed_scale_and_date():
    t = _table()
    m = (E.col("price") > E.decimal_lit(150.0, 2)).eval(t)
    np.testing.assert_array_equal(np.asarray(m.data), [False, True, True])
    m = (E.col("d") < E.date_lit("1994-01-01")).eval(t)
    np.testing.assert_array_equal(np.asarray(m.data), [True, False, False])


def test_string_predicates_on_dict():
    t = _table()
    m = (E.col("ship") == "RAIL").eval(t)
    np.testing.assert_array_equal(np.asarray(m.data), [False, True, False])
    m = (E.col("ship") != "NOPE").eval(t)
    assert np.asarray(m.data).all()
    m = E.col("ship").isin(["AIR", "SHIP"]).eval(t)
    np.testing.assert_array_equal(np.asarray(m.data), [True, False, True])
    m = E.col("ship").like("%AI%").eval(t)
    np.testing.assert_array_equal(np.asarray(m.data), [True, True, False])
    # range compare on sorted dict codes
    m = (E.col("ship") >= "RAIL").eval(t)
    np.testing.assert_array_equal(np.asarray(m.data), [False, True, True])


def test_case_and_year():
    t = _table()
    e = E.Case([(E.col("ship") == "AIR", E.lift(1))], E.lift(0))
    np.testing.assert_array_equal(np.asarray(e.eval(t).data), [1, 0, 0])
    y = E.ExtractYear(E.col("d")).eval(t)
    np.testing.assert_array_equal(
        np.asarray(y.data),
        np.array([8035, 9000, 10000], "datetime64[D]").astype("datetime64[Y]").astype(int) + 1970,
    )


def test_substring():
    t = Table.from_pydict({"p": (np.array(["13-55", "29-01", "13-99"], object), dt.STRING)})
    cc = E.substring(E.col("p"), 1, 2)
    m = cc.isin(["13"]).eval(t)
    np.testing.assert_array_equal(np.asarray(m.data), [True, False, True])


def test_three_valued_logic():
    a = Column.from_numpy(np.array([True, True, False]), dt.BOOL,
                          valid=np.array([True, False, False]))
    t = Table(columns={"a": a, "b": Column.from_numpy(np.array([False, False, True]), dt.BOOL)})
    r = (E.col("a") & E.col("b")).eval(t)
    # T&F=F, NULL&F=F, NULL&T=NULL
    np.testing.assert_array_equal(np.asarray(r.data), [False, False, False])
    np.testing.assert_array_equal(np.asarray(r.valid), [True, True, False])
    r = (E.col("a") | E.col("b")).eval(t)
    # T|F=T, NULL|F=NULL, NULL|T=T
    np.testing.assert_array_equal(np.asarray(r.data & r.valid), [True, False, True])
    np.testing.assert_array_equal(np.asarray(r.valid), [True, False, True])
