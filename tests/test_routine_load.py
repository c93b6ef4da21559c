"""Routine load: continuous file ingest with offset tracking
(RoutineLoadJob.java analog over a file glob; io/routine_load.py)."""

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session


def _write_csv(path, rows):
    with open(path, "w") as f:
        f.write("k,v\n")
        for k, v in rows:
            f.write(f"{k},{v}\n")


def _base():
    return Table(columns={
        "k": Column.from_numpy(np.array([1, 2], dtype=np.int64), dt.INT64),
        "v": Column.from_numpy(np.array([10, 20], dtype=np.int64), dt.INT64),
    })


def test_poll_ingests_new_files_once(tmp_path):
    s = Session({"t": _base()})
    job = s.create_routine_load("j1", "t", str(tmp_path / "*.csv"))
    assert job.poll_once() == 0                      # nothing yet
    _write_csv(tmp_path / "a.csv", [(3, 30), (4, 40)])
    assert job.poll_once() == 2
    assert job.poll_once() == 0                      # offsets: no re-ingest
    got = s.sql("select k, v from t order by k")
    assert got.k.tolist() == [1, 2, 3, 4]
    assert got.v.tolist() == [10, 20, 30, 40]
    _write_csv(tmp_path / "b.csv", [(5, 50)])
    assert job.poll_once() == 1
    assert s.sql("select sum(v) sv from t").sv[0] == 150
    assert job.rows_loaded == 3


def test_pause_resume_stop(tmp_path):
    s = Session({"t": _base()})
    job = s.create_routine_load("j2", "t", str(tmp_path / "*.csv"))
    _write_csv(tmp_path / "a.csv", [(9, 90)])
    job.pause()
    assert job.poll_once() == 0
    job.resume()
    assert job.poll_once() == 1
    job.stop()
    _write_csv(tmp_path / "b.csv", [(7, 70)])
    assert job.poll_once() == 0 and job.state == "STOPPED"


def test_refreshes_mv_via_register(tmp_path):
    s = Session({"t": _base()})
    s.sql("create materialized view m as select sum(v) sv from t group by k")
    job = s.create_routine_load("j3", "t", str(tmp_path / "*.csv"))
    _write_csv(tmp_path / "a.csv", [(1, 5)])
    job.poll_once()
    # MV auto-refreshed by the append's register()
    got = s.sql("select k, sum(v) sv from t group by k order by k")
    assert got.sv.tolist() == [15, 20]
