"""Adaptive compaction + runtime filters: results must be identical with the
features on (low thresholds so they actually trigger) and off.

Mirrors the reference's runtime-filter tests (be/test/exprs/runtime_filter_test.cpp)
and chunk-compaction semantics (Column::filter_range, be/src/column/column.h:352).
"""
import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table, compact_table
from starrocks_tpu.config import CONFIG, set_config
from starrocks_tpu.exec import plan as P
from starrocks_tpu.exprs.expr import col, lift as lit
from starrocks_tpu.ops.hash_agg import AggSpec
from starrocks_tpu.ops.sort import SortKey


@pytest.fixture
def low_thresholds():
    old = (CONFIG.compaction_min_rows, CONFIG.compaction_floor,
           CONFIG.enable_compaction, CONFIG.enable_runtime_filters)
    set_config(compaction_min_rows=64, compaction_floor=8,
               enable_compaction=True, enable_runtime_filters=True)
    yield
    set_config(compaction_min_rows=old[0], compaction_floor=old[1],
               enable_compaction=old[2], enable_runtime_filters=old[3])


def _tables(n=5000, nb=64, seed=7):
    rng = np.random.default_rng(seed)
    fact = Table(columns={
        "k": Column.from_numpy(rng.integers(0, 1000, n), dt.INT64),
        "v": Column.from_numpy(rng.integers(0, 100, n), dt.INT64),
    })
    # build keys clustered in [200, 200+nb) so the min-max filter bites
    dimv = np.arange(200, 200 + nb)
    dim = Table(columns={
        "dk": Column.from_numpy(dimv, dt.INT64),
        "dv": Column.from_numpy(dimv * 10, dt.INT64),
    })
    fd = pd.DataFrame({"k": np.asarray(fact["k"].data),
                       "v": np.asarray(fact["v"].data)})
    dd = pd.DataFrame({"dk": dimv, "dv": dimv * 10})
    return {"fact": fact, "dim": dim}, fd, dd


def _run(plan, tables):
    return P.execute(plan, tables).to_pandas()


def test_compact_table_basic():
    t = Table(columns={"a": Column.from_numpy(np.arange(100), dt.INT64)})
    t = t.filter(np.asarray(np.arange(100) % 7 == 0))
    c = compact_table(t, 16)
    got = c.to_pandas()["a"].tolist()
    assert got == [i for i in range(100) if i % 7 == 0]


def test_filter_compaction_exact(low_thresholds):
    tables, fd, _ = _tables()
    plan = P.Aggregate(
        P.Filter(P.Scan("fact"), col("k") < lit(50)),
        keys=(), aggs=(AggSpec("sum", "v", "s"), AggSpec("count", "v", "c")))
    got = _run(plan, tables)
    want = fd[fd.k < 50]
    assert got["s"][0] == want.v.sum()
    assert got["c"][0] == len(want)


@pytest.mark.parametrize("jt", ["inner", "semi", "anti", "left_outer",
                                "right_outer", "full_outer", "right_semi",
                                "right_anti"])
def test_join_rf_all_types(low_thresholds, jt):
    tables, fd, dd = _tables()
    build_cols = () if jt in ("semi", "anti", "right_semi", "right_anti") \
        else ("dv",)
    sort_keys = ((SortKey("dk"),) if jt in ("right_semi", "right_anti")
                 else (SortKey("k"), SortKey("v")))
    plan = P.Sort(
        P.HashJoin(P.Scan("fact"), P.Scan("dim"), ("k",), ("dk",), jt,
                   build_cols, capacity=256, unique=True),
        keys=sort_keys)
    got = _run(plan, tables)

    merged = fd.merge(dd, left_on="k", right_on="dk",
                      how={"inner": "inner", "left_outer": "left",
                           "right_outer": "right", "full_outer": "outer"}
                      .get(jt, "inner"))
    if jt == "semi":
        want = fd[fd.k.isin(dd.dk)]
    elif jt == "anti":
        want = fd[~fd.k.isin(dd.dk)]
    elif jt == "right_semi":
        want = dd[dd.dk.isin(fd.k)]
    elif jt == "right_anti":
        want = dd[~dd.dk.isin(fd.k)]
    else:
        want = merged[["k", "v", "dv"]] if "dv" in merged else merged
    assert len(got) == len(want)
    if jt in ("inner", "semi", "anti"):
        w = want.sort_values(["k", "v"]).reset_index(drop=True)
        g = got.sort_values(["k", "v"]).reset_index(drop=True)
        for c_ in w.columns:
            assert (g[c_].to_numpy() == w[c_].to_numpy()).all()


def test_rf_empty_build(low_thresholds):
    tables, fd, _ = _tables()
    # dim filtered to nothing: inner join must return 0 rows
    plan = P.HashJoin(
        P.Scan("fact"),
        P.Filter(P.Scan("dim"), col("dk") < lit(-1)),
        ("k",), ("dk",), "inner", ("dv",), capacity=256, unique=True)
    got = _run(plan, tables)
    assert len(got) == 0


def test_rf_null_probe_keys(low_thresholds):
    n = 1000
    k = np.arange(n) % 50
    valid = (np.arange(n) % 3 != 0)
    tables = {
        "f": Table(columns={"k": Column.from_numpy(k, dt.INT64,
                                                   valid=valid)}),
        "d": Table(columns={"dk": Column.from_numpy(np.arange(10, 20),
                                                    dt.INT64)}),
    }
    plan = P.HashJoin(P.Scan("f"), P.Scan("d"), ("k",), ("dk",),
                      "inner", (), capacity=64, unique=True)
    got = _run(plan, tables)
    want = int(((k >= 10) & (k < 20) & valid).sum())
    assert len(got) == want


def test_compaction_off_matches_on():
    tables, fd, dd = _tables(n=4096)
    plan = P.Aggregate(
        P.HashJoin(P.Filter(P.Scan("fact"), col("v") < lit(50)),
                   P.Scan("dim"), ("k",), ("dk",), "inner", ("dv",),
                   capacity=256, unique=True),
        keys=("k",), aggs=(AggSpec("sum", "dv", "s"),))
    set_config(enable_compaction=False, enable_runtime_filters=False)
    try:
        off = P.execute(plan, tables).to_pandas()
    finally:
        set_config(enable_compaction=True, enable_runtime_filters=True,
                   compaction_min_rows=64, compaction_floor=8)
    try:
        plan2 = P.Aggregate(
            P.HashJoin(P.Filter(P.Scan("fact"), col("v") < lit(50)),
                       P.Scan("dim"), ("k",), ("dk",), "inner", ("dv",),
                       capacity=256, unique=True),
            keys=("k",), aggs=(AggSpec("sum", "dv", "s"),))
        on = P.execute(plan2, tables).to_pandas()
    finally:
        set_config(compaction_min_rows=1 << 17, compaction_floor=1 << 13)
    o = off.sort_values("k").reset_index(drop=True)
    n_ = on.sort_values("k").reset_index(drop=True)
    assert (o["k"].to_numpy() == n_["k"].to_numpy()).all()
    assert (o["s"].to_numpy() == n_["s"].to_numpy()).all()


@pytest.fixture
def bloom_on():
    old = (CONFIG.enable_bloom_rf, CONFIG.bloom_rf_min_probe_rows,
           CONFIG.enable_runtime_filters)
    set_config(enable_bloom_rf=True, bloom_rf_min_probe_rows=1,
               enable_runtime_filters=True)
    yield
    set_config(enable_bloom_rf=old[0], bloom_rf_min_probe_rows=old[1],
               enable_runtime_filters=old[2])


def _gapped_tables(n=4000):
    # build keys are sparse EVENS inside [0, 1000): min-max keeps every
    # probe row, only the bloom membership filter can drop the odds
    fact = Table(columns={
        "k": Column.from_numpy(np.arange(n) % 1000, dt.INT64),
        "v": Column.from_numpy(np.arange(n), dt.INT64)})
    dimv = np.arange(0, 1000, 2)
    dim = Table(columns={"dk": Column.from_numpy(dimv, dt.INT64),
                         "dv": Column.from_numpy(dimv * 3, dt.INT64)})
    return {"fact": fact, "dim": dim}, n


def test_bloom_rf_exact_and_drops(bloom_on):
    tables, n = _gapped_tables()
    plan = P.Sort(
        P.HashJoin(P.Scan("fact"), P.Scan("dim"), ("k",), ("dk",), "inner",
                   ("dv",), capacity=2048, unique=True),
        keys=(SortKey("v"),))
    got = _run(plan, tables)
    # exact: only even keys join, dv = 3k
    assert len(got) == n // 2
    assert (got["k"].to_numpy() % 2 == 0).all()
    assert (got["dv"].to_numpy() == got["k"].to_numpy() * 3).all()
    # off-vs-on identical
    set_config(enable_bloom_rf=False)
    plan2 = P.Sort(
        P.HashJoin(P.Scan("fact"), P.Scan("dim"), ("k",), ("dk",), "inner",
                   ("dv",), capacity=2048, unique=True),
        keys=(SortKey("v"),))
    got2 = _run(plan2, tables)
    assert (got["v"].to_numpy() == got2["v"].to_numpy()).all()


def test_bloom_rf_profile_counter(bloom_on):
    from starrocks_tpu.utils.profile import explain_analyze
    tables, n = _gapped_tables()
    plan = P.HashJoin(P.Scan("fact"), P.Scan("dim"), ("k",), ("dk",),
                      "inner", ("dv",), capacity=2048, unique=True)
    _, prof = explain_analyze(plan, tables)
    txt = prof.render()
    # the bloom RF kills the odd-key probe rows BEFORE the probe (minus a
    # few % false positives at 8 bits/key, k=2)
    assert "rf_rows_dropped" in txt
    import re
    drops = int(re.search(r"rf_rows_dropped=(\d+)", txt).group(1))
    assert drops >= int(0.9 * (n // 2))


def test_bloom_rf_null_safe_join(bloom_on):
    # null-safe (<=>) equality: NULL probe keys must survive the bloom and
    # match NULL build keys
    pk = np.array([1, 2, 3, 4, 5, 6, 7, 8], np.int64)
    pvalid = np.array([1, 1, 0, 1, 0, 1, 1, 1], bool)
    bk = np.array([2, 4, 9], np.int64)
    bvalid = np.array([1, 1, 0], bool)
    tables = {
        "f": Table(columns={"k": Column.from_numpy(pk, dt.INT64,
                                                   valid=pvalid)}),
        "d": Table(columns={"dk": Column.from_numpy(bk, dt.INT64,
                                                    valid=bvalid)}),
    }
    plan = P.HashJoin(P.Scan("f"), P.Scan("d"), ("k",), ("dk",), "semi",
                      (), capacity=64, unique=False, null_safe=True)
    got = _run(plan, tables)
    # matches: k=2, k=4, and the two NULL probe rows (NULL <=> NULL)
    assert len(got) == 4
