"""Transactions (snapshot/rollback over immutable tables) and table-level
privileges (AuthorizationMgr.java reduced to the single-process surface)."""

import numpy as np
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session


def _t():
    return Table(columns={
        "k": Column.from_numpy(np.arange(4, dtype=np.int64), dt.INT64),
        "v": Column.from_numpy(np.arange(4, dtype=np.int64) * 10, dt.INT64),
    })


def test_rollback_restores_tables_and_mvs():
    s = Session({"t": _t()})
    s.sql("create materialized view m as select sum(v) sv from t group by k")
    s.sql("begin")
    s.sql("insert into t (k, v) values (9, 90)")
    s.sql("delete from t where k = 0")
    s.sql("create table t2 as select k from t")
    assert s.sql("select count(*) c from t").c[0] == 4   # -1 +1
    s.sql("rollback")
    assert s.sql("select count(*) c from t").c[0] == 4
    assert s.sql("select k from t order by k").k.tolist() == [0, 1, 2, 3]
    assert "t2" not in s.tables
    # MV storage restored with the snapshot
    assert s.sql("select sum(sv) x from __mv_m").x[0] == 60


def test_commit_keeps_changes():
    s = Session({"t": _t()})
    s.sql("begin")
    s.sql("insert into t (k, v) values (9, 90)")
    s.sql("commit")
    assert s.sql("select count(*) c from t").c[0] == 5
    with pytest.raises(RuntimeError):
        s.sql("commit")
    with pytest.raises(RuntimeError):
        s.sql("rollback")


def test_nested_begin_rejected():
    s = Session({"t": _t()})
    s.sql("begin")
    with pytest.raises(RuntimeError):
        s.sql("begin")
    s.sql("rollback")


def test_grant_revoke_enforced():
    tables = {"t": _t(), "secret": _t()}
    admin = Session(tables)
    admin.sql("create user 'alice'")
    admin.sql("grant select on t to 'alice'")
    alice = Session(tables, user="alice")
    alice._users = admin._auth_users()        # shared registry (one server)
    alice._grant_map = admin._grants()
    assert len(alice.sql("select k from t")) == 4
    with pytest.raises(PermissionError):
        alice.sql("select k from secret")
    admin.sql("revoke select on t from 'alice'")
    # cached result must NOT bypass the revoked grant
    with pytest.raises(PermissionError):
        alice.sql("select k from t")


def test_unknown_users_ungoverned():
    s = Session({"t": _t()}, user="nobody_registered")
    assert len(s.sql("select k from t")) == 4


def test_grant_to_unknown_user_fails():
    s = Session({"t": _t()})
    with pytest.raises(ValueError):
        s.sql("grant select on t to 'ghost'")
