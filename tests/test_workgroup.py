"""Resource groups + hierarchical memory tracker (workgroup analog,
be/src/exec/workgroup/work_group.h; ResourceGroup.java DDL/classifiers)."""

import threading

import numpy as np
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session
from starrocks_tpu.exec.workgroup import (MANAGER, ResourceGroup,
                                          plan_mem_estimate)
from starrocks_tpu.utils.memtracker import (MemLimitExceeded, MemTracker,
                                            process_tracker,
                                            reset_process_tracker)


@pytest.fixture(autouse=True)
def _clean_groups():
    yield
    for g in list(MANAGER.list()):
        MANAGER.drop(g.name)
    reset_process_tracker()


def _tiny():
    return Table(columns={
        "k": Column.from_numpy(np.arange(100, dtype=np.int64), dt.INT64),
        "v": Column.from_numpy(np.arange(100, dtype=np.int64) * 3, dt.INT64),
    })


# -- MemTracker tree ---------------------------------------------------------

def test_tracker_hierarchy_and_limits():
    root = MemTracker("root", limit_bytes=1000)
    q1 = root.child("q1", limit_bytes=600)
    op = q1.child("op")
    op.consume(500)
    assert root.consumption == 500 and q1.consumption == 500
    with pytest.raises(MemLimitExceeded):
        op.consume(200)          # q1 would hit 700 > 600
    assert root.consumption == 500    # failed consume rolled back
    q2 = root.child("q2")
    q2.consume(400)
    with pytest.raises(MemLimitExceeded):
        q2.consume(200)          # root would hit 1100 > 1000
    op.release(500)
    assert root.consumption == 400 and root.peak == 900
    q2.close()
    assert root.consumption == 0
    assert "root" in root.render()


# -- classifiers -------------------------------------------------------------

def test_classifier_specificity():
    MANAGER.create(ResourceGroup("everyone"))
    MANAGER.create(ResourceGroup("alice_g", users=("alice",)))
    MANAGER.create(ResourceGroup("etl", users=("alice",),
                                 query_types=("insert",)))
    assert MANAGER.classify("bob", "select") == "everyone"
    assert MANAGER.classify("alice", "select") == "alice_g"
    assert MANAGER.classify("alice", "insert") == "etl"
    assert MANAGER.classify(None, "select") == "everyone"


# -- admission enforcement ---------------------------------------------------

def test_big_query_rejection():
    s = Session({"t": _tiny()}, user="alice")
    s.sql("create resource group small to (user='alice') "
          "with (big_query_mem_bytes=100)")
    with pytest.raises(MemLimitExceeded):
        s.sql("select sum(v) from t")     # scan estimate 1600B > 100B cap
    s.sql("drop resource group small")
    assert float(s.sql("select sum(v) s from t").s[0]) == float(
        np.arange(100).sum() * 3)


def test_group_mem_quota():
    s = Session({"t": _tiny()}, user="bob")
    s.sql("create resource group bq to (user='bob') "
          "with (mem_limit_bytes=100)")
    with pytest.raises(MemLimitExceeded):
        s.sql("select sum(v) from t")
    s.sql("drop resource group bq")


def test_concurrency_limit_queues_then_rejects():
    g = ResourceGroup("serial", concurrency_limit=1, users=("carol",))
    MANAGER.create(g)
    a1 = MANAGER.admit("serial", 10)
    with a1:
        with pytest.raises(RuntimeError):
            MANAGER.admit("serial", 10, timeout_s=0.05)
    with MANAGER.admit("serial", 10, timeout_s=0.05):
        pass


def test_show_and_ddl_roundtrip():
    s = Session({"t": _tiny()})
    s.sql("create resource group rg1 to (user='x|y', query_type='select') "
          "with (concurrency_limit=4, mem_limit_bytes=1e9)")
    df = s.sql("show resource groups")
    row = df[df.name == "rg1"].iloc[0]
    assert row.concurrency_limit == 4
    assert row.mem_limit_bytes == 1_000_000_000
    assert row.users == "x|y" and row.query_types == "select"
    s.sql("drop resource group rg1")
    assert "rg1" not in s.sql("show resource groups").get("name", ())


def test_plan_estimate_counts_scanned_tables():
    s = Session({"t": _tiny()})
    est = plan_mem_estimate(s.plan("select sum(v) from t"), s.tables)
    assert est >= 100 * 8       # at least the v column
    est2 = plan_mem_estimate(
        s.plan("select a.v from t a, t b where a.k = b.k"), s.tables)
    assert est2 <= 100 * 8 * 2 + 200   # shared base table counted once


def test_ungoverned_sessions_unaffected():
    MANAGER.create(ResourceGroup("vip", users=("someone_else",),
                                 mem_limit_bytes=1))
    s = Session({"t": _tiny()}, user="dave")
    # dave matches no group (vip is user-scoped) -> runs without quota
    assert len(s.sql("select k from t where v > 100")) > 0


# -- adaptive DOP (P14) ------------------------------------------------------

def test_adaptive_dop_routes_small_queries_local():
    from starrocks_tpu.config import set_config
    from starrocks_tpu.parallel import dist as D
    mesh = D.make_mesh(4)
    s = Session({"t": _tiny()}, mesh=mesh, partitioning={"t": "k"})
    q = "select k, sum(v) sv from t group by k order by k limit 5"
    want = s.sql(q).sv.tolist()            # mesh path
    assert not getattr(s.plan(q), "adaptive_dop_local", False)
    set_config(adaptive_dop_min_bytes=1 << 20)
    try:
        s._result_cache.clear()
        got = s.sql(q).sv.tolist()         # tiny scan -> local fragment
        assert getattr(s.plan(q), "adaptive_dop_local", False)
        assert got == want
    finally:
        set_config(adaptive_dop_min_bytes=0)


def test_insert_classified_to_etl_group():
    MANAGER.create(ResourceGroup("etl2", users=("ed",),
                                 query_types=("insert",),
                                 concurrency_limit=1))
    s = Session({"t": _tiny()}, user="ed")
    s.sql("insert into t (k, v) values (500, 5000)")
    assert int(s.sql("select max(k) m from t").m[0]) == 500
    st = MANAGER._groups["etl2"]
    assert st.running == 0          # admission released after the write
