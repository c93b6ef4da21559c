"""Randomized differential testing: generated queries run through the engine
AND SQLite over identical data; results must match row-for-row.

The SQLsmith-lite analog of the reference's SQL-tester random coverage
(test/ sql cases + the fuzz corpora) — a seeded generator composes filters,
projections, group-bys, aggregates, joins, order-by/limit, and set ops over
two random tables, so grammar/planner/kernel regressions surface on shapes
no hand-written suite covers. Seeds are FIXED (deterministic CI); widen
N_QUERIES locally to fuzz harder.
"""
import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session
from starrocks_tpu.golden.sqlite_golden import build_db

N_QUERIES = 60
SEED = 20260821


def _tables(rng):
    n = int(rng.integers(200, 2000))
    m = int(rng.integers(20, 200))
    t_valid = rng.random(n) > 0.1
    t = {
        "a": rng.integers(0, 50, n).astype(np.int64),
        "b": rng.integers(-100, 100, n).astype(np.int64),
        "c": rng.integers(0, 10, n).astype(np.int64),
        "s": np.asarray([f"v{int(x)}" for x in rng.integers(0, 12, n)],
                        object),
    }
    d = {
        "k": np.arange(m).astype(np.int64),
        "w": rng.integers(0, 1000, m).astype(np.int64),
    }
    tables = {
        "t": Table(columns={
            "a": Column.from_numpy(t["a"], dt.INT64),
            "b": Column.from_numpy(t["b"], dt.INT64, valid=t_valid),
            "c": Column.from_numpy(t["c"], dt.INT64),
            "s": Column.from_numpy(t["s"], dt.STRING),
        }),
        "d": Table(columns={
            "k": Column.from_numpy(d["k"], dt.INT64),
            "w": Column.from_numpy(d["w"], dt.INT64),
        }),
    }
    frames = {
        "t": pd.DataFrame({"a": t["a"],
                           "b": pd.Series(t["b"]).where(t_valid),
                           "c": t["c"], "s": t["s"]}),
        "d": pd.DataFrame(d),
    }
    return tables, frames


def _gen_query(rng) -> str:
    def pred():
        choices = [
            f"a < {int(rng.integers(0, 50))}",
            f"b > {int(rng.integers(-100, 100))}",
            f"c = {int(rng.integers(0, 10))}",
            f"s = 'v{int(rng.integers(0, 12))}'",
            "b is not null",
            f"a between {int(rng.integers(0, 20))} and {int(rng.integers(20, 50))}",
            f"c in ({int(rng.integers(0, 5))}, {int(rng.integers(5, 10))})",
        ]
        ps = [choices[i] for i in
              rng.choice(len(choices), size=int(rng.integers(1, 3)),
                         replace=False)]
        return " and ".join(ps)

    kind = int(rng.integers(0, 5))
    if kind == 0:       # filter + project + order + limit
        return (f"select a, b, s from t where {pred()} "
                f"order by a, b, s limit {int(rng.integers(1, 50))}")
    if kind == 1:       # group-by aggregates
        aggs = rng.choice(["sum(a)", "count(*)", "min(b)", "max(b)",
                           "count(b)", "avg(a)", "sum(b)"],
                          size=2, replace=False)
        return (f"select c, {aggs[0]} x, {aggs[1]} y from t "
                f"where {pred()} group by c order by c")
    if kind == 2:       # join + aggregate
        return (f"select count(*) n, sum(w) sw from t join d on t.a = d.k "
                f"where {pred()}")
    if kind == 3:       # global aggregates with having-less distinct
        return (f"select count(distinct c) dc, count(distinct s) ds, "
                f"sum(a) sa from t where {pred()}")
    # set op
    return (f"select a from t where {pred()} "
            f"union select k from d where k < {int(rng.integers(0, 200))} "
            f"order by a")


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [f"c{i}" for i in range(df.shape[1])]
    return out.reset_index(drop=True)


def test_random_query_differential():
    rng = np.random.default_rng(SEED)
    tables, frames = _tables(rng)
    sess = Session(tables)
    conn = build_db(frames)
    from starrocks_tpu.golden.sqlite_golden import run_golden

    failures = []
    for i in range(N_QUERIES):
        q = _gen_query(rng)
        try:
            got = _canon(sess.sql(q))
            want = _canon(run_golden(conn, q))
            assert got.shape == want.shape, (got.shape, want.shape)
            # order-by queries compare as-is; others sort canonically
            ordered = "order by" in q
            if not ordered:
                got = got.sort_values(list(got.columns)).reset_index(drop=True)
                want = want.sort_values(list(want.columns)).reset_index(drop=True)
            for col in got.columns:
                a = pd.to_numeric(got[col], errors="coerce")
                b = pd.to_numeric(want[col], errors="coerce")
                if a.notna().any() or b.notna().any():
                    assert a.isna().equals(b.isna()), (q, col)
                    assert np.allclose(a.fillna(0), b.fillna(0),
                                       rtol=1e-9), (q, col)
                else:
                    assert (got[col].fillna("") ==
                            want[col].fillna("")).all(), (q, col)
        except AssertionError as e:
            failures.append((i, q, str(e)[:200]))
        except Exception as e:       # engine or sqlite crash = a finding
            failures.append((i, q, f"{type(e).__name__}: {str(e)[:200]}"))
    assert not failures, failures[:5]
