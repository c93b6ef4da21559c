"""group_concat + DISTINCT aggregates composed with GROUPING SETS
(be/src/exprs/agg/group_concat.h; SplitAggregateRule multi-distinct)."""
import numpy as np
import jax.numpy as jnp
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session


@pytest.fixture
def sess():
    t = Table(columns={
        "g": Column.from_numpy(np.array([1, 1, 2, 2, 2, 3], np.int64),
                               dt.INT64),
        "h": Column.from_numpy(np.array([0, 1, 0, 1, 0, 0], np.int64),
                               dt.INT64),
        "s": Column.from_numpy(
            np.array(["a", "b", "c", "a", "c", "z"], object), dt.STRING,
            valid=np.array([1, 1, 1, 1, 1, 0], bool)),
        "v": Column.from_numpy(np.array([10, 20, 30, 40, 50, 60], np.int64),
                               dt.INT64),
    })
    return Session({"t": t})


def test_group_concat_basic(sess):
    df = sess.sql("select g, group_concat(s) cs, sum(v) sv "
                  "from t group by g order by g")
    assert list(df.cs[:2]) == ["a, b", "c, a, c"]
    assert df.cs.isna().iloc[2]          # all-NULL group -> NULL
    assert list(df.sv) == [30, 120, 60]


def test_group_concat_distinct_sep(sess):
    df = sess.sql("select g, group_concat(distinct s, '|') cs "
                  "from t group by g order by g")
    assert list(df.cs[:2]) == ["a|b", "c|a"]


def test_group_concat_global_and_ints(sess):
    df = sess.sql("select group_concat(s, '-') cs, group_concat(v) cv from t")
    assert df.cs[0] == "a-b-c-a-c"
    assert df.cv[0] == "10, 20, 30, 40, 50, 60"


def test_group_concat_only_agg(sess):
    # no other aggregate: the group_concat subplan IS the aggregate
    df = sess.sql("select g, group_concat(s) cs from t group by g order by g")
    assert list(df.cs[:2]) == ["a, b", "c, a, c"]


def test_distinct_agg_with_grouping_sets(sess):
    # r2 review gap: DISTINCT aggregates under GROUPING SETS were rejected
    df = sess.sql(
        "select g, h, count(distinct s) cd, sum(v) sv from t "
        "group by rollup(g, h) order by g, h")
    import pandas as pd
    want_rows = {
        (1, 0): (1, 10), (1, 1): (1, 20), (2, 0): (1, 80), (2, 1): (1, 40),
        (3, 0): (0, 60),
    }
    fine = df.dropna(subset=["g", "h"])
    for _, r in fine.iterrows():
        cd, sv = want_rows[(int(r.g), int(r.h))]
        assert r.cd == cd and r.sv == sv, r
    # the grand-total row: 3 distinct strings, sum 210
    total = df[df.g.isna() & df.h.isna()]
    assert len(total) == 1
    assert total.cd.iloc[0] == 3 and total.sv.iloc[0] == 210


def test_group_concat_with_grouping_sets(sess):
    df = sess.sql(
        "select g, group_concat(distinct s, ',') cs from t "
        "group by rollup(g) order by g")
    fine = df.dropna(subset=["g"]).set_index("g")
    assert fine.cs.loc[1] == "a,b"
    assert fine.cs.loc[2] == "c,a"
    total = df[df.g.isna()]
    assert total.cs.iloc[0] == "a,b,c"


def test_group_concat_null_keys_collapse():
    """NULL group keys whose dead payloads differ (nullif/CASE-derived
    keys leave arbitrary bytes under invalid rows) must form ONE group —
    the r3 advisor's repro: count(*) said 3 but group_concat returned only
    one member's value. The key column here carries three DIFFERENT dead
    values (1, 3, 5) under its NULLs."""
    t = Table(columns={
        "k": Column(jnp.asarray(np.array([1, 9, 3, 9, 5], np.int64)),
                    jnp.asarray(np.array([0, 1, 0, 1, 0], bool)),
                    dt.INT64),
        "v": Column.from_numpy(np.array(["a", "x", "b", "y", "c"], object),
                               dt.STRING),
    })
    sess = Session({"t": t})
    df = sess.sql("select k, count(*) c, group_concat(v) gc "
                  "from t group by k order by k")
    nulls = df[df.k.isna()]
    assert len(nulls) == 1
    assert nulls.c.iloc[0] == 3
    assert nulls.gc.iloc[0] == "a, b, c"


def test_group_concat_on_mesh_session_falls_back_single_chip():
    """Distributed plans have no GroupConcat path; the coordinator must
    reject it BEFORE tracing and fall back to single-chip execution (r3
    advisor: the NotImplementedError used to escape from inside the
    shard_map trace)."""
    from starrocks_tpu.parallel import dist as D
    t = Table(columns={
        "g": Column.from_numpy(np.array([1, 1, 2, 2], np.int64), dt.INT64),
        "s": Column.from_numpy(np.array(["a", "b", "c", "d"], object),
                               dt.STRING),
    })
    mesh = D.make_mesh(4)
    sess = Session({"t": t}, mesh=mesh, partitioning={"t": ("g",)})
    df = sess.sql("select g, group_concat(s) cs from t group by g order by g")
    assert list(df.cs) == ["a, b", "c, d"]
