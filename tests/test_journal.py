"""Catalog journal: edit-log + image + replay recovery (exec/journal.py).

Reference behavior being modeled: FE journals every metadata mutation
(fe/fe-core/.../persist/EditLog.java), folds the log into an image via the
checkpoint daemon, and on restart replays the journal suffix over the
newest image; unfinished transactions are aborted on restart.
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.exec.session import Session


def _table(vals):
    return Table(columns={
        "k": Column.from_numpy(np.arange(len(vals), dtype=np.int64),
                               dt.INT64),
        "v": Column.from_numpy(np.asarray(vals, np.int64), dt.INT64),
    })


@pytest.fixture
def sess(tmp_path):
    s = Session({"t": _table([10, 20, 30])})
    s.enable_journal(str(tmp_path / "meta"))
    return s


def test_replay_recovers_ddl_and_mutations(sess, tmp_path):
    sess.sql("create view big as select k, v from t where v >= 20")
    sess.sql("insert into t (k, v) values (3, 40)")
    sess.sql("delete from t where v = 10")
    sess.sql("create table t2 as select v * 2 as w from t")
    # crash: abandon `sess` without checkpointing
    r = Session.recover(str(tmp_path / "meta"))
    assert sorted(r.sql("select v from t")["v"]) == [20, 30, 40]
    assert sorted(r.sql("select * from big")["v"]) == [20, 30, 40]
    assert sorted(r.sql("select w from t2")["w"]) == [40, 60, 80]


def test_read_only_statements_not_journaled(sess):
    sess.sql("show tables")
    sess.sql("select sum(v) s from t")
    sess.sql("describe t")
    assert sess._journal.lsn == 0
    sess.sql("create view x as select k from t")
    assert sess._journal.lsn == 1


def test_auth_survives_recovery(sess, tmp_path):
    sess.sql("create user 'alice'")
    sess.sql("create role reader")
    sess.sql("grant select on t to role 'reader'")
    sess.sql("grant 'reader' to 'alice'")
    r = Session.recover(str(tmp_path / "meta"))
    r.user = "alice"
    assert int(r.sql("select sum(v) s from t")["s"][0]) == 60
    r.user = "admin"
    r.sql("revoke 'reader' from 'alice'")
    r.user = "alice"
    with pytest.raises(PermissionError):
        r.sql("select sum(v) s from t")


def test_checkpoint_folds_and_truncates(sess, tmp_path):
    sess.sql("insert into t (k, v) values (3, 99)")
    assert sess._journal.lsn == 1
    sess.checkpoint()
    assert os.path.getsize(tmp_path / "meta" / "journal.jsonl") == 0
    # post-checkpoint mutations land in the fresh log and still recover
    sess.sql("delete from t where v = 10")
    r = Session.recover(str(tmp_path / "meta"))
    assert sorted(r.sql("select v from t")["v"]) == [20, 30, 99]


def test_torn_tail_dropped(sess, tmp_path):
    sess.sql("insert into t (k, v) values (3, 40)")
    path = tmp_path / "meta" / "journal.jsonl"
    with open(path, "a") as fh:        # simulate a crash mid-append
        fh.write('{"lsn": 2, "user": "admin", "stmt": "delete fr')
    r = Session.recover(str(tmp_path / "meta"))
    assert sorted(r.sql("select v from t")["v"]) == [10, 20, 30, 40]


def test_open_txn_rolled_back_on_recovery(sess, tmp_path):
    sess.sql("begin")
    sess.sql("delete from t where v = 10")
    # crash before COMMIT: the replayed prefix must not survive
    r = Session.recover(str(tmp_path / "meta"))
    assert sorted(r.sql("select v from t")["v"]) == [10, 20, 30]


def test_committed_txn_survives(sess, tmp_path):
    sess.sql("begin")
    sess.sql("delete from t where v = 10")
    sess.sql("commit")
    r = Session.recover(str(tmp_path / "meta"))
    assert sorted(r.sql("select v from t")["v"]) == [20, 30]


def test_programmatic_load_folds_into_image(sess, tmp_path):
    sess.sql("insert into t (k, v) values (3, 40)")
    sess.register("fresh", _table([7]))     # bulk load: not replayable text
    assert os.path.getsize(tmp_path / "meta" / "journal.jsonl") == 0
    r = Session.recover(str(tmp_path / "meta"))
    assert sorted(r.sql("select v from t")["v"]) == [10, 20, 30, 40]
    assert list(r.sql("select v from fresh")["v"]) == [7]
