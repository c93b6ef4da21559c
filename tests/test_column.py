import numpy as np
import jax
import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table


def test_dict_encoding_order_preserving():
    raw = np.array(["RAIL", "AIR", "SHIP", "AIR", "RAIL"], object)
    col = Column.from_numpy(raw, dt.STRING)
    vals = dt.dict_values(col.dict_id)
    assert list(vals) == ["AIR", "RAIL", "SHIP"]  # sorted
    np.testing.assert_array_equal(col.to_numpy(), raw)
    # code order == lexicographic order
    codes = np.asarray(col.data)
    assert (np.argsort(codes, kind="stable") == np.argsort(raw, kind="stable")).all()


def test_decimal_roundtrip():
    cents = np.array([123, -4500, 0], np.int64)
    col = Column.from_numpy(cents, dt.DECIMAL(2))
    np.testing.assert_allclose(col.to_numpy(), [1.23, -45.0, 0.0])


def test_table_pytree_and_filter():
    t = Table.from_pydict({
        "k": (np.arange(10), dt.INT64),
        "v": (np.arange(10) * 10, dt.INT32),
    })
    # flows through jit as a pytree
    @jax.jit
    def f(tab: Table):
        return tab.filter(tab["k"].data % 2 == 0)

    out = f(t)
    assert int(out.num_live()) == 5
    df = out.to_pandas()
    assert list(df["v"]) == [0, 20, 40, 60, 80]


def test_gather_null_fill():
    t = Table.from_pydict({"v": (np.array([10, 20, 30]), dt.INT64)})
    idx = jnp.array([2, 0, 1])
    ok = jnp.array([True, False, True])
    g = t.gather(idx, ok)
    out = g["v"].to_numpy()
    assert out[0] == 30 and out[2] == 20 and out[1] is None


def test_generator_shapes(tpch_raw):
    assert len(tpch_raw["orders"]["o_orderkey"]) == 15000
    li = tpch_raw["lineitem"]
    # supplier of each lineitem is one of the part's partsupp suppliers
    ps = tpch_raw["partsupp"]
    pairs = set(zip(ps["ps_partkey"].tolist(), ps["ps_suppkey"].tolist()))
    sample = list(zip(li["l_partkey"][:500].tolist(), li["l_suppkey"][:500].tolist()))
    assert all(p in pairs for p in sample)
    # customers divisible by 3 never order (Q22 relies on this)
    assert (tpch_raw["orders"]["o_custkey"] % 3 != 0).all()
