"""Avro container-file ingest (io/avro_io.py) — decode into the columnar
model and query through the engine; format surface modeled on the
reference's avro scanner (be/src/exec/avro_scanner.cpp)."""

import numpy as np
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.io.avro_io import read_avro, write_avro


def _sample():
    return Table(columns={
        "id": Column.from_numpy(np.arange(5, dtype=np.int64), dt.INT64),
        "name": Column.from_numpy(
            np.asarray(["ann", "bo", "", "dee", "ann"]), dt.STRING,
            valid=np.asarray([True, True, False, True, True])),
        "price": Column.from_numpy(
            np.asarray([199, -250, 0, 1234567, 5], np.int64),
            dt.DECIMAL(2)),
        "day": Column.from_numpy(
            np.asarray([0, 1, 9000, 19000, 20000], np.int32), dt.DATE),
        "score": Column.from_numpy(
            np.asarray([1.5, -2.25, 0.0, 3.0, 4.125]), dt.FLOAT64),
        "ok": Column.from_numpy(
            np.asarray([True, False, True, True, False]), dt.BOOL),
    })


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip(tmp_path, codec):
    t = _sample()
    path = str(tmp_path / "t.avro")
    write_avro(t, path, codec=codec)
    r = read_avro(path)
    assert r.nrows == 5
    assert np.array_equal(np.asarray(r["id"].data), np.arange(5))
    names = np.asarray(dt.dict_values(r["name"].dict_id))[
        np.asarray(r["name"].data)]
    assert list(names[[0, 1, 3, 4]]) == ["ann", "bo", "dee", "ann"]
    assert not r["name"].valid[2]
    assert r["price"].dtype.scale == 2
    assert np.array_equal(np.asarray(r["price"].data),
                          [199, -250, 0, 1234567, 5])
    assert r["day"].dtype is dt.DATE
    assert np.array_equal(np.asarray(r["day"].data),
                          [0, 1, 9000, 19000, 20000])
    assert np.allclose(np.asarray(r["score"].data),
                       [1.5, -2.25, 0.0, 3.0, 4.125])
    assert np.array_equal(np.asarray(r["ok"].data),
                          [True, False, True, True, False])


def test_query_over_avro(tmp_path):
    from starrocks_tpu.exec.session import Session
    path = str(tmp_path / "t.avro")
    write_avro(_sample(), path)
    s = Session({"t": read_avro(path)})
    df = s.sql("select name, sum(price) p from t "
               "where ok group by name order by name")
    # rows passing `ok`: (ann, 1.99), (NULL-name, 0.00), (dee, 12345.67);
    # the NULL name groups alone (SQL GROUP BY) and sorts first
    assert [x if isinstance(x, str) else None for x in df["name"]] \
        == [None, "ann", "dee"]
    assert list(df["p"]) == [0.00, 1.99, 12345.67]


def test_bad_magic(tmp_path):
    p = tmp_path / "x.avro"
    p.write_bytes(b"PAR1junk")
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro(str(p))
