"""Parquet ingest/export and session DDL (CTAS / INSERT / views / DROP)."""

import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session


def test_parquet_roundtrip(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from starrocks_tpu.io.parquet_io import read_parquet, write_parquet

    df = pd.DataFrame({
        "i": pd.array([1, 2, None, 4], dtype="Int64"),
        "f": [1.5, None, 2.5, -3.0],
        "s": ["a", "bb", None, "dd"],
        "d": pd.to_datetime(["1995-01-01", "2000-06-15", None, "1992-12-31"]),
    })
    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)

    t = read_parquet(path)
    back = t.to_pandas()
    assert back.i.tolist()[0:2] == [1, 2] and back.i[2] is None
    assert back.f[1] is None and back.f[3] == -3.0
    def _n(v):
        return None if v is None or (isinstance(v, float) and np.isnan(v)) else v
    assert [_n(v) for v in back.s.tolist()] == ["a", "bb", None, "dd"]
    assert _n(back.d[2]) is None
    assert np.asarray(back.d[0]).astype("datetime64[D]") == np.datetime64("1995-01-01")

    # query it through a session
    s = Session({"t": t})
    r = s.sql("select s, f from t where i is not null order by i desc")
    assert r.s.tolist() == ["dd", "bb", "a"]

    # export
    out = str(tmp_path / "out.parquet")
    write_parquet(s.execute("select i, s from t where f > 0"), out)
    rt = pq.read_table(out).to_pandas()
    assert len(rt) == 2


def test_session_ddl():
    t = Table(columns={
        "k": Column.from_numpy(np.array([1, 2, 3, 4], np.int64), dt.INT64),
        "v": Column.from_numpy(np.array([10, 20, 30, 40], np.int64), dt.INT64),
    })
    s = Session({"t": t})
    s.sql("create table big as select k, v from t where v >= 20")
    r = s.sql("select count(*) c from big")
    assert r.c[0] == 3

    s.sql("insert into big select k, v from t where v = 10")
    assert s.sql("select count(*) c from big").c[0] == 4
    assert sorted(s.sql("select v from big").v.tolist()) == [10, 20, 30, 40]

    s.sql("create view doubled as select k, v * 2 as v2 from big")
    r = s.sql("select sum(v2) sv from doubled")
    assert r.sv[0] == 200

    s.sql("drop view doubled")
    s.sql("drop table big")
    with pytest.raises(KeyError):
        s.sql("select * from big")


def test_read_parquet_pipelined(tmp_path, tpch_tables):
    """Row-group-pipelined ingest decodes to the same Table as the one-shot
    reader (P11 async-scan analog)."""
    import pyarrow.parquet as pq
    from starrocks_tpu.io.parquet_io import (read_parquet,
                                             read_parquet_pipelined,
                                             write_parquet)

    path = str(tmp_path / "orders.parquet")
    # small row groups force the multi-group pipeline
    t = tpch_tables["orders"]
    write_parquet(t, path)
    tab = pq.read_table(path)
    pq.write_table(tab, path, row_group_size=max(64, tab.num_rows // 7))
    assert pq.ParquetFile(path).num_row_groups > 1

    a = read_parquet(path).to_pandas()
    b = read_parquet_pipelined(path).to_pandas()
    assert a.equals(b)


def test_save_load_catalog(tmp_path):
    """Checkpoint/resume: parquet-per-table + manifest round trip (the FE
    image / per-load manifest analog)."""
    import numpy as np
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.session import Session

    t = Table(columns={
        "id": Column.from_numpy(np.arange(100, dtype=np.int64), dt.INT64),
        "name": Column.from_numpy(
            np.asarray([f"n{i % 7}" for i in range(100)], object), dt.STRING),
        "price": Column.from_numpy(np.arange(100, dtype=np.int64) * 5,
                                   dt.DECIMAL(2)),
    })
    s = Session({"t": t})
    s.sql("create view v as select id, price from t where id < 10")
    d = str(tmp_path / "cat")
    s.save_catalog(d)

    s2 = Session.load_catalog(d)
    q = "select count(*) c, sum(price) p from t where name = 'n3'"
    assert s2.sql(q).equals(s.sql(q))
    assert len(s2.sql("select * from v")) == 10
    import json, os
    m = json.load(open(os.path.join(d, "manifest.json")))
    assert m["tables"]["t"]["rows"] == 100


def test_show_and_describe():
    t = Table(columns={
        "a": Column.from_numpy(np.arange(3, dtype=np.int64), dt.INT64),
        "b": Column.from_numpy(np.array([1.0, 2.0, 3.0]), dt.FLOAT64),
    })
    s = Session({"t1": t})
    s.sql("create view v1 as select a from t1")
    s.sql("create materialized view m1 as select a, sum(b) sb from t1 group by a")
    assert s.sql("show tables").table_name.tolist() == ["t1"]
    assert s.sql("show views").view_name.tolist() == ["v1"]
    mv = s.sql("show materialized views")
    assert mv.name.tolist() == ["m1"] and mv.rows.tolist() == [3]
    d = s.sql("desc t1")
    assert d.field.tolist() == ["a", "b"]
    assert d.type.tolist() == ["INT64", "FLOAT64"]


def test_delete_and_update():
    t = Table(columns={
        "k": Column.from_numpy(np.arange(6, dtype=np.int64), dt.INT64),
        "v": Column.from_numpy(np.array([10, 20, 30, 40, 50, 60],
                                        dtype=np.int64), dt.INT64,
                               valid=np.array([1, 1, 0, 1, 1, 1], bool)),
    })
    s = Session({"t": t})
    # DELETE with 3VL: v>25 is NULL for k=2 -> that row SURVIVES
    s.sql("delete from t where v > 25")
    got = s.sql("select k from t order by k")
    assert got.k.tolist() == [0, 1, 2]
    # UPDATE with predicate; untouched rows keep values (incl. NULL)
    s.sql("update t set v = v + 1 where k = 0")
    got = s.sql("select k, v from t order by k")
    assert got.v.tolist()[0] == 11 and got.v.tolist()[1] == 20
    assert got.v.tolist()[2] is None
    # unconditional UPDATE with a function call containing a comma
    s.sql("update t set v = coalesce(v, 0)")
    assert s.sql("select v from t order by k").v.tolist() == [11, 20, 0]
