"""CSV ingest: native parser vs pure-Python fallback, quoting, NULLs,
schema inference, and query-through-Session (csv_reader.cpp analog tests,
be/test/formats/csv/*)."""
import numpy as np
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.io import csv_io


CSV = ('id,name,price,qty,ship,note\n'
       '1,widget,10.50,3,2024-01-05,plain\n'
       '2,"gadget, large",0.99,10,2024-02-10,"says ""hi"""\n'
       '3,doohickey,123.00,,2024-03-15,\n'
       '-4,"multi\nline",5.25,7,2024-04-01,x\n')


@pytest.fixture
def csv_file(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(CSV)
    return str(p)


SCHEMA = {"id": dt.INT64, "name": dt.STRING, "price": dt.DECIMAL(2),
          "qty": dt.INT64, "ship": dt.DATE, "note": dt.STRING}


def test_native_parse_roundtrip(csv_file):
    t = csv_io.read_csv(csv_file, SCHEMA)
    df = t.to_pandas()
    assert len(df) == 4
    assert list(df.id) == [1, 2, 3, -4]
    assert list(df.name) == ["widget", "gadget, large", "doohickey",
                             "multi\nline"]
    # decimal cents
    assert list(df.price) == [10.50, 0.99, 123.00, 5.25]
    # empty unquoted fields are NULL
    assert df.qty.tolist()[:2] == [3, 10] and df.qty.isna().tolist()[2]
    assert df.note.isna().tolist() == [False, False, True, False]
    assert str(df.ship.iloc[0])[:10] == "2024-01-05"
    # quoted "" un-escapes
    assert df.note.iloc[1] == 'says "hi"'


def test_python_fallback_parity(csv_file):
    native = csv_io.read_csv(csv_file, SCHEMA).to_pandas()
    cols, valids = csv_io._parse_csv_python(csv_file, SCHEMA, ",", True)
    from starrocks_tpu.column.column import Column, Table
    py = Table(columns={
        n: Column.from_numpy(cols[n], d,
                             valid=None if valids[n].all() else valids[n])
        for n, d in SCHEMA.items()}).to_pandas()
    assert native.equals(py)


def test_schema_inference(csv_file):
    sch = csv_io.infer_schema(csv_file)
    assert sch["id"] is dt.INT64
    assert sch["name"] is dt.STRING
    assert sch["price"].kind is dt.TypeKind.FLOAT64
    assert sch["qty"] is dt.INT64
    assert sch["ship"].kind is dt.TypeKind.DATE
    t = csv_io.read_csv(csv_file)       # fully inferred load
    assert len(t.to_pandas()) == 4


def test_custom_delimiter_no_header(tmp_path):
    p = tmp_path / "pipe.csv"
    p.write_text("1|a|2.5\n2|b|3.5\n")
    t = csv_io.read_csv(str(p), {"x": dt.INT64, "y": dt.STRING,
                                 "z": dt.FLOAT64},
                        delimiter="|", header=False)
    df = t.to_pandas()
    assert list(df.x) == [1, 2]
    assert list(df.y) == ["a", "b"]
    assert list(df.z) == [2.5, 3.5]


def test_csv_through_session(csv_file):
    from starrocks_tpu.exec.session import Session
    s = Session({})
    s.load_csv("t", csv_file, SCHEMA)
    df = s.sql("select count(*) n, sum(qty) q from t where id > 0")
    assert df.n[0] == 3
    assert df.q[0] == 13
    df2 = s.sql("select name from t order by id limit 2")
    assert list(df2.name) == ["multi\nline", "widget"]


def test_json_lines_ingest(tmp_path):
    from starrocks_tpu.exec.session import Session
    p = tmp_path / "t.ndjson"
    p.write_text(
        '{"id": 1, "name": "a", "score": 1.5, "tags": ["x", "y"]}\n'
        '{"id": 2, "name": "b", "score": 2.5}\n'
        '{"id": 3, "score": 3.25, "tags": {"k": 1}}\n')
    s = Session({})
    s.load_json("j", str(p))
    df = s.sql("select * from j order by id")
    assert list(df.id) == [1, 2, 3]
    assert df.name.isna().iloc[2]
    assert list(df.score) == [1.5, 2.5, 3.25]
    assert df.tags.iloc[0] == '["x", "y"]'      # nested -> JSON text
    assert df.tags.isna().iloc[1]
    agg = s.sql("select count(name) c, sum(score) s from j")
    assert agg.c[0] == 2 and abs(agg.s[0] - 7.25) < 1e-9


def test_orc_ingest_roundtrip(tmp_path):
    import pyarrow as pa
    from pyarrow import orc
    from starrocks_tpu.exec.session import Session

    p = str(tmp_path / "t.orc")
    at = pa.table({
        "id": pa.array([1, 2, 3, None], pa.int64()),
        "name": pa.array(["x", "y", None, "x"]),
        "score": pa.array([1.5, None, 2.5, 3.5], pa.float64()),
    })
    orc.write_table(at, p)
    s = Session({})
    s.load_orc("o", p)
    df = s.sql("select * from o order by id")
    assert df.id.dropna().tolist() == [1, 2, 3]
    agg = s.sql("select count(name) c, sum(score) sc from o")
    assert agg.c[0] == 3 and abs(agg.sc[0] - 7.5) < 1e-9
