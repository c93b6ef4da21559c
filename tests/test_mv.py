"""Materialized views: DDL, transparent rewrite, rollup, refresh, persistence.

Mirrors the reference's MV rewrite tests
(fe/fe-core/src/test/java/com/starrocks/sql/optimizer/rule/transformation/
materialization/MvRewriteTest.java) at the single-table SPJG scope sql/mv.py
implements.
"""

import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session


def _sales(n=200, seed=7):
    rng = np.random.default_rng(seed)
    region = rng.integers(0, 4, n)
    item = rng.integers(0, 10, n)
    qty = rng.integers(1, 50, n).astype(np.int64)
    price = rng.integers(100, 10_000, n).astype(np.int64)  # decimal(,2)
    return Table(columns={
        "region": Column.from_numpy(region.astype(np.int64), dt.INT64),
        "item": Column.from_numpy(item.astype(np.int64), dt.INT64),
        "qty": Column.from_numpy(qty, dt.INT64),
        "price": Column.from_numpy(price, dt.DECIMAL(2)),
    })


@pytest.fixture()
def sess():
    return Session({"sales": _sales()})


def _plain():
    return Session({"sales": _sales()})


def _same(a: pd.DataFrame, b: pd.DataFrame):
    assert len(a) == len(b) and len(a.columns) == len(b.columns)
    for ca, cb in zip(a.columns, b.columns):
        va, vb = a[ca].tolist(), b[cb].tolist()
        for x, y in zip(va, vb):
            if isinstance(x, float) or isinstance(y, float):
                assert x == pytest.approx(y)
            else:
                assert x == y


MV = ("create materialized view mv1 as "
      "select region, item, sum(qty) total_qty, count(*) cnt, "
      "min(price) min_p, max(price) max_p, sum(price) sum_p, "
      "count(price) cnt_p from sales group by region, item")


def test_exact_match_rewrite(sess):
    sess.sql(MV)
    q = ("select region, item, sum(qty) total_qty, count(*) cnt, "
         "min(price) min_p, max(price) max_p, sum(price) sum_p, "
         "count(price) cnt_p from sales group by region, item")
    got = sess.sql(q + " order by region, item")
    want = _plain().sql(q + " order by region, item")
    # order-by variants aren't exact matches; compare the bare form's plan
    assert getattr(sess.plan(q), "mv_rewritten", False)
    _same(got.sort_values(list(got.columns)).reset_index(drop=True),
          want.sort_values(list(want.columns)).reset_index(drop=True))


def test_rollup_subset_dims(sess):
    sess.sql(MV)
    q = ("select region, sum(qty) s, count(*) c, min(price) mn, "
         "max(price) mx from sales group by region order by region")
    assert getattr(sess.plan(q), "mv_rewritten", False)
    _same(sess.sql(q), _plain().sql(q))


def test_rollup_global(sess):
    sess.sql(MV)
    q = "select sum(qty) s, count(*) c from sales"
    assert getattr(sess.plan(q), "mv_rewritten", False)
    _same(sess.sql(q), _plain().sql(q))


def test_rollup_avg_from_sum_count(sess):
    sess.sql(MV)
    q = "select region, avg(price) ap from sales group by region order by region"
    assert getattr(sess.plan(q), "mv_rewritten", False)
    got, want = sess.sql(q), _plain().sql(q)
    assert got.ap.tolist() == pytest.approx([float(v) for v in want.ap])


def test_residual_predicate(sess):
    sess.sql(MV)
    q = ("select item, sum(qty) s from sales where region = 2 "
         "group by item order by item")
    assert getattr(sess.plan(q), "mv_rewritten", False)
    _same(sess.sql(q), _plain().sql(q))


def test_having_and_limit(sess):
    sess.sql(MV)
    q = ("select item, count(*) c from sales group by item "
         "having count(*) > 10 order by c desc, item limit 5")
    assert getattr(sess.plan(q), "mv_rewritten", False)
    _same(sess.sql(q), _plain().sql(q))


def test_no_rewrite_on_non_dim_predicate(sess):
    """qty isn't a dim — the MV can't answer a row-level filter; falls back
    to the base table, still correct."""
    sess.sql(MV)
    q = "select region, count(*) c from sales where qty > 25 group by region order by region"
    assert not getattr(sess.plan(q), "mv_rewritten", False)
    _same(sess.sql(q), _plain().sql(q))


def test_no_rewrite_distinct_agg(sess):
    sess.sql(MV)
    q = "select region, count(distinct item) c from sales group by region order by region"
    assert not getattr(sess.plan(q), "mv_rewritten", False)
    _same(sess.sql(q), _plain().sql(q))


def test_predicate_mv_subsumption():
    """MV with its own WHERE only answers queries carrying the same
    conjunct."""
    s = Session({"sales": _sales()})
    s.sql("create materialized view mv2 as select item, sum(qty) sq "
          "from sales where region = 1 group by item")
    q_ok = ("select item, sum(qty) sq from sales where region = 1 "
            "group by item order by item")
    assert getattr(s.plan(q_ok), "mv_rewritten", False)
    _same(s.sql(q_ok), _plain().sql(q_ok))
    q_no = "select item, sum(qty) sq from sales group by item order by item"
    assert not getattr(s.plan(q_no), "mv_rewritten", False)
    _same(s.sql(q_no), _plain().sql(q_no))


def test_auto_refresh_on_insert(sess):
    sess.sql(MV)
    q = "select sum(qty) s from sales"
    before = int(sess.sql(q).s[0])
    sess.sql("insert into sales (region, item, qty, price) "
             "values (1, 3, 1000, 5.00)")
    assert getattr(sess.plan(q), "mv_rewritten", False)
    assert int(sess.sql(q).s[0]) == before + 1000


def test_manual_refresh_and_drop(sess):
    sess.sql(MV)
    sess.sql("refresh materialized view mv1")
    q = "select region, sum(qty) s from sales group by region order by region"
    assert getattr(sess.plan(q), "mv_rewritten", False)
    sess.sql("drop materialized view mv1")
    assert "mv1" not in sess.mviews and "__mv_mv1" not in sess.tables
    assert not getattr(sess.plan(q), "mv_rewritten", False)
    _same(sess.sql(q), _plain().sql(q))


def test_drop_base_drops_mv(sess):
    sess.sql(MV)
    sess.drop("sales")
    assert not sess.mviews and "__mv_mv1" not in sess.tables


def test_catalog_roundtrip(tmp_path, sess):
    sess.sql(MV)
    sess.save_catalog(str(tmp_path / "cat"))
    s2 = Session.load_catalog(str(tmp_path / "cat"))
    q = "select region, sum(qty) s from sales group by region order by region"
    assert getattr(s2.plan(q), "mv_rewritten", False)
    _same(s2.sql(q), _plain().sql(q))
