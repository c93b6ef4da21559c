import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops.hash_agg import AggSpec, dense_groupby, dense_ranges, groupby, sorted_groupby


def _golden_groupby(df, keys, aggs):
    g = df.groupby(keys, sort=False)
    out = {}
    for spec in aggs:
        if spec.fn == "count_star":
            out[spec.out] = g.size()
        elif spec.fn == "sum":
            out[spec.out] = g[spec.col].sum()
        elif spec.fn == "count":
            out[spec.out] = g[spec.col].count()
        elif spec.fn == "min":
            out[spec.out] = g[spec.col].min()
        elif spec.fn == "max":
            out[spec.out] = g[spec.col].max()
    return pd.DataFrame(out).reset_index()


def _compare(result: Table, golden: pd.DataFrame, keys):
    got = result.to_pandas().sort_values(keys).reset_index(drop=True)
    want = golden.sort_values(keys).reset_index(drop=True)[got.columns]
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns if want[c].dtype.kind == "i"}),
        want,
        check_dtype=False,
    )


def test_groupby_small():
    rng = np.random.default_rng(0)
    n = 10_000
    df = pd.DataFrame({
        "k1": rng.integers(0, 7, n),
        "k2": rng.integers(0, 3, n),
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })
    t = Table.from_pydict({
        "k1": (df.k1.to_numpy(), dt.INT64),
        "k2": (df.k2.to_numpy(), dt.INT32),
        "v": (df.v.to_numpy(), dt.INT64),
    })
    aggs = (
        AggSpec("sum", "v", "s"),
        AggSpec("count_star", None, "c"),
        AggSpec("min", "v", "mn"),
        AggSpec("max", "v", "mx"),
    )
    result = groupby(t, ("k1", "k2"), aggs)
    _compare(result, _golden_groupby(df, ["k1", "k2"], aggs), ["k1", "k2"])


def test_groupby_many_groups():
    rng = np.random.default_rng(1)
    n = 50_000
    df = pd.DataFrame({
        "k": rng.integers(0, 20_000, n),
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    t = Table.from_pydict({
        "k": (df.k.to_numpy(), dt.INT64),
        "v": (df.v.to_numpy(), dt.INT64),
    })
    aggs = (AggSpec("sum", "v", "s"), AggSpec("count_star", None, "c"))
    result = groupby(t, ("k",), aggs)
    golden = _golden_groupby(df, ["k"], aggs)
    assert int(result.num_live()) == len(golden)
    _compare(result, golden, ["k"])


def test_groupby_respects_live_mask_and_strings():
    raw = np.array(["AIR", "RAIL", "AIR", "SHIP", "RAIL", "AIR"], object)
    t = Table.from_pydict({
        "m": (raw, dt.STRING),
        "v": (np.array([1, 2, 3, 4, 5, 6], np.int64), dt.INT64),
    })
    t = t.filter(jnp.asarray(np.array([True, True, False, True, True, True])))
    aggs = (AggSpec("sum", "v", "s"),)
    result = groupby(t, ("m",), aggs)
    got = result.to_pandas().sort_values("m").reset_index(drop=True)
    assert list(got.m) == ["AIR", "RAIL", "SHIP"]
    assert list(got.s) == [7, 7, 4]


def test_groupby_null_keys_and_null_values():
    k = np.array([1, 1, 2, 2, 3], np.int64)
    kv = np.array([True, True, False, False, True])
    v = np.array([10, 20, 30, 40, 50], np.int64)
    vv = np.array([True, False, True, True, False])
    t = Table(columns={
        "k": Column.from_numpy(k, dt.INT64, valid=kv),
        "v": Column.from_numpy(v, dt.INT64, valid=vv),
    })
    aggs = (AggSpec("sum", "v", "s"), AggSpec("count", "v", "c"),
            AggSpec("count_star", None, "cs"))
    result = groupby(t, ("k",), aggs)
    got = result.to_pandas()
    # NULL keys group together (one NULL group); sum of all-null group is NULL
    rows = {(None if r.k is None else int(r.k)): r for r in got.itertuples()}
    assert set(rows.keys()) == {1, 3, None}
    assert rows[1].s == 10 and rows[1].c == 1 and rows[1].cs == 2
    assert rows[None].s == 70 and rows[None].c == 2
    assert rows[3].s is None and rows[3].c == 0 and rows[3].cs == 1


def test_dense_and_sorted_agree():
    rng = np.random.default_rng(5)
    n = 20_000
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n).astype(np.int64),
        "v": rng.integers(-1000, 1000, n).astype(np.int64),
    })
    t = Table.from_pydict({
        "k": (df.k.to_numpy(), dt.INT64),
        "v": (df.v.to_numpy(), dt.INT64),
    })
    aggs = (AggSpec("sum", "v", "s"), AggSpec("min", "v", "mn"),
            AggSpec("max", "v", "mx"), AggSpec("count_star", None, "c"))
    # k has vrange (0..8) -> dense eligible
    assert dense_ranges(t, ("k",)) is not None
    d = dense_groupby(t, ("k",), aggs, dense_ranges(t, ("k",))).to_pandas()
    s_ = sorted_groupby(t, ("k",), aggs).to_pandas()
    d = d.sort_values("k").reset_index(drop=True)
    s_ = s_.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(d, s_, check_dtype=False)
    want = df.groupby("k", sort=True).agg(s=("v","sum"), mn=("v","min"), mx=("v","max"), c=("v","size")).reset_index()
    pd.testing.assert_frame_equal(d[["k","s","mn","mx","c"]], want, check_dtype=False)
