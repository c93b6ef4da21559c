import numpy as np
import jax.numpy as jnp
import pandas as pd

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops.sort import SortKey, sort_table


def test_multikey_sort_matches_pandas():
    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "a": rng.integers(0, 10, n),
        "b": rng.normal(size=n),
        "c": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    t = Table.from_pydict({
        "a": (df.a.to_numpy(), dt.INT64),
        "b": (df.b.to_numpy(), dt.FLOAT64),
        "c": (df.c.to_numpy(), dt.INT64),
    })
    out = sort_table(t, [SortKey("a", asc=True), SortKey("b", asc=False)])
    got = out.to_pandas()
    want = df.sort_values(["a", "b"], ascending=[True, False], kind="stable").reset_index(drop=True)
    np.testing.assert_array_equal(got.a, want.a)
    np.testing.assert_allclose(got.b, want.b)
    np.testing.assert_array_equal(got.c, want.c)


def test_sort_strings_desc_and_limit_with_dead_rows():
    t = Table.from_pydict({
        "s": (np.array(["RAIL", "AIR", "SHIP", "MAIL", "FOB"], object), dt.STRING),
        "v": (np.arange(5), dt.INT64),
    })
    t = t.filter(jnp.asarray(np.array([True, True, False, True, True])))
    out = sort_table(t, [SortKey("s", asc=False)], limit=2)
    got = out.to_pandas()
    assert list(got.s) == ["RAIL", "MAIL"]


def test_null_ordering():
    c = Column.from_numpy(np.array([3, 1, 2], np.int64), dt.INT64,
                          valid=np.array([True, False, True]))
    t = Table(columns={"k": c})
    # engine default is MySQL/StarRocks semantics: NULLs lowest (first ASC)
    got = sort_table(t, [SortKey("k")]).to_pandas()
    assert got.k[0] is None and got.k[1] == 2 and got.k[2] == 3
    got = sort_table(t, [SortKey("k", asc=False)]).to_pandas()
    assert got.k[0] == 3 and got.k[1] == 2 and got.k[2] is None
    # explicit placement overrides
    got = sort_table(t, [SortKey("k", nulls_first=False)]).to_pandas()
    assert got.k[0] == 2 and got.k[1] == 3 and got.k[2] is None
