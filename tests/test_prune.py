"""Scan column pruning (sql/planner.py prune_scan_columns).

Pins: demand-driven narrowing of scans and alias-Projects, union demand
over shared subplans, positional SetOp safety, and exactness of pruned
plans (the q40/q66 CASE-branch regression)."""

import pytest

from starrocks_tpu.exec import plan as P
from starrocks_tpu.exec.session import Session


@pytest.fixture(scope="module")
def session(tpch_tables):
    return Session(dict(tpch_tables))


def _scan_cols(plan, table):
    return [n.columns for n in plan.walk()
            if isinstance(n, (P.Scan, P.BlockScan)) and n.table == table]


def test_simple_agg_prunes_to_used_columns(session):
    plan = session.plan(
        "select l_returnflag, sum(l_quantity) sq from lineitem "
        "group by l_returnflag")
    (cols,) = _scan_cols(plan, "lineitem")
    assert set(cols) == {"l_returnflag", "l_quantity"}


def test_predicate_columns_survive(session):
    plan = session.plan(
        "select sum(l_extendedprice * l_discount) rev from lineitem "
        "where l_shipdate >= date '1994-01-01' and l_quantity < 24")
    (cols,) = _scan_cols(plan, "lineitem")
    assert set(cols) == {"l_extendedprice", "l_discount", "l_shipdate",
                         "l_quantity"}


def test_alias_projects_narrowed(session):
    """q21-style self-join aliases: the rename Projects and their scans
    shrink to what the EXISTS subqueries actually touch."""
    from starrocks_tpu.sql.tpch_sql import QUERIES
    plan = session.plan(QUERIES["q21"])
    for cols in _scan_cols(plan, "lineitem"):
        assert cols is not None and len(cols) <= 4, cols


def test_setop_children_not_pruned(session):
    plan = session.plan(
        "select l_orderkey, l_partkey from lineitem where l_quantity < 5 "
        "union all "
        "select l_orderkey, l_suppkey from lineitem where l_quantity > 45")
    # each branch carries a Project (the select list) that bounds demand;
    # positional alignment must hold: both branches emit exactly 2 columns
    setops = [n for n in plan.walk() if isinstance(n, P.SetOp)]
    assert setops
    df = session.sql(
        "select count(*) c from (select l_orderkey, l_partkey from lineitem "
        "where l_quantity < 5 union all select l_orderkey, l_suppkey "
        "from lineitem where l_quantity > 45) u")
    assert int(df.c[0]) > 0


def test_case_branch_references_survive(session, tpch_frames):
    """CASE arms are (cond, value) tuples; their column refs must count as
    demand (the r5 q40/q66 distributed regression)."""
    df = session.sql(
        "select sum(case when l_returnflag = 'R' then l_extendedprice "
        "else 0 end) r_rev from lineitem")
    li = tpch_frames["lineitem"]
    # frames carry decimals in scaled-int storage units (x100)
    want = li[li.l_returnflag == "R"].l_extendedprice.sum() / 100.0
    assert abs(float(df.r_rev[0]) - float(want)) < 1e-6 * max(float(want), 1)
