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


def _shared(admin, tables, user):
    s = Session(tables, user=user)
    s._users = admin._auth_users()
    s._grant_map = admin._grants()
    s.mviews = admin.mviews          # one server: shared MV registry
    return s


def test_mv_scan_checks_base_grants():
    tables = {"secret": _t()}
    admin = Session(tables)
    admin.sql("create materialized view m as "
              "select sum(v) sv from secret group by k")
    admin.sql("create user 'eve'")
    eve = _shared(admin, tables, "eve")
    # no grant on the base: neither the rewrite target nor the storage
    # table name grants access
    with pytest.raises(PermissionError):
        eve.sql("select * from __mv_m")
    with pytest.raises(PermissionError):
        eve.sql("select sum(v) sv from secret group by k")
    admin.sql("grant select on secret to 'eve'")
    assert len(eve.sql("select * from __mv_m")) == 4


def test_ddl_paths_enforce_grants():
    tables = {"t": _t(), "secret": _t()}
    admin = Session(tables)
    admin.sql("create user 'bob'")
    admin.sql("grant select on t to 'bob'")
    bob = _shared(admin, tables, "bob")
    # embedded SELECTs run with the caller's grants
    with pytest.raises(PermissionError):
        bob.sql("create table leak as select * from secret")
    with pytest.raises(PermissionError):
        bob.sql("insert into t select k, v from secret")
    # mutations need the insert grant; DROP needs the drop grant
    with pytest.raises(PermissionError):
        bob.sql("insert into t (k, v) values (9, 90)")
    with pytest.raises(PermissionError):
        bob.sql("delete from t where k = 0")
    with pytest.raises(PermissionError):
        bob.sql("update t set v = 0 where k = 0")
    with pytest.raises(PermissionError):
        bob.sql("drop table t")
    admin.sql("grant insert on t to 'bob'")
    bob.sql("insert into t (k, v) values (9, 90)")
    assert admin.sql("select count(*) c1 from t").c1[0] == 5
    bob.sql("delete from t where k = 9")
    # distinct text: the result cache is per-session and admin's session
    # saw no mutation (one server = one session; the shared-dict pattern
    # here is a test convenience)
    assert admin.sql("select count(*) c2 from t").c2[0] == 4
    # grant administration is admin-only
    with pytest.raises(PermissionError):
        bob.sql("grant select on secret to 'bob'")
    with pytest.raises(PermissionError):
        bob.sql("create user 'mallory'")
    with pytest.raises(PermissionError):
        bob.sql("revoke select on t from 'bob'")


def test_insert_select_respects_source_grant():
    tables = {"t": _t(), "src": _t()}
    admin = Session(tables)
    admin.sql("create user 'carol'")
    admin.sql("grant insert on t to 'carol'")
    admin.sql("grant select on src to 'carol'")
    carol = _shared(admin, tables, "carol")
    carol.sql("insert into t select k + 100, v from src")
    assert admin.sql("select count(*) c from t").c[0] == 8


def test_roles_carry_grants():
    tables = {"t": _t(), "secret": _t()}
    admin = Session(tables)
    admin.sql("create user 'dora'")
    admin.sql("create role 'analyst'")
    admin.sql("grant select on t to role 'analyst'")
    dora = _shared(admin, tables, "dora")
    dora._role_map = admin._roles()
    dora._user_role_map = admin._user_roles()
    with pytest.raises(PermissionError):
        dora.sql("select k from t")
    admin.sql("grant 'analyst' to 'dora'")
    assert len(dora.sql("select k from t")) == 4
    with pytest.raises(PermissionError):      # role doesn't cover secret
        dora.sql("select k from secret")
    admin.sql("revoke 'analyst' from 'dora'")
    with pytest.raises(PermissionError):
        dora.sql("select k, v from t")
    # role administration is admin-only
    with pytest.raises(PermissionError):
        dora.sql("create role 'sneaky'")
    with pytest.raises(PermissionError):
        dora.sql("grant 'analyst' to 'dora'")
    admin.sql("drop role 'analyst'")
