import json
import urllib.request

import pytest

from starrocks_tpu.exec.session import Session
from starrocks_tpu.sql.tpch_sql import QUERIES


@pytest.fixture(scope="module")
def session(tpch_tables):
    return Session(tpch_tables)


def test_explain_renders_plan(session):
    text = session.explain(QUERIES["q3"])
    assert "HashJoin" in text and "Aggregate" in text and "Sort" in text
    assert "Scan [table=lineitem]" in text


def test_explain_analyze_counts_rows(session, tpch_frames):
    df, prof = session.explain_analyze(QUERIES["q5"])
    assert len(df) == 5
    assert "rows=" in prof and "time=" in prof
    # root row count matches result
    first = prof.splitlines()[0]
    assert "rows=5" in first


def test_metrics_and_audit_endpoint(session):
    from starrocks_tpu.utils import metrics as M

    before = M.REGISTRY.snapshot().get("queries_total", 0)
    session.sql("select count(*) as n from nation")
    after = M.REGISTRY.snapshot()["queries_total"]
    assert after == before + 1

    srv = M.serve_metrics(port=18731)
    try:
        text = urllib.request.urlopen(
            "http://127.0.0.1:18731/metrics", timeout=10).read().decode()
        assert "starrocks_tpu_queries_total" in text
        audit = json.loads(urllib.request.urlopen(
            "http://127.0.0.1:18731/audit", timeout=10).read().decode())
        assert any("nation" in r["sql"] for r in audit)
        assert all(r["ok"] for r in audit[-1:])
    finally:
        srv.shutdown()


def test_audit_records_failures(session):
    from starrocks_tpu.utils import metrics as M

    with pytest.raises(Exception):
        session.sql("select nope from nation")
    rec = M.AUDIT.tail(1)[0]
    assert not rec.ok and "nope" in (rec.error or "")


def test_result_cache_and_memory_accounting(tpch_tables):
    """Query-cache analog (cache_operator.h:42) + MemTracker-style gauges."""
    from starrocks_tpu.config import CONFIG
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.utils.metrics import REGISTRY

    sess = Session(dict(tpch_tables))
    assert REGISTRY.snapshot().get("tables_bytes", 0) > 0

    q = "select count(*) c from lineitem where l_quantity < 10"
    before = REGISTRY.snapshot().get("result_cache_hits_total", 0)
    a = sess.sql(q)
    b = sess.sql(q)                     # served from the result cache
    assert a.equals(b)
    assert REGISTRY.snapshot().get("result_cache_hits_total", 0) == before + 1

    # catalog mutation invalidates
    sess.register("tiny", sess.execute("select n_name from nation"))
    c = sess.sql(q)
    assert c.equals(a)

    # config off bypasses entirely
    CONFIG.enable_result_cache = False
    try:
        sess.sql(q)
        hits = REGISTRY.snapshot().get("result_cache_hits_total", 0)
        sess.sql(q)
        assert REGISTRY.snapshot().get("result_cache_hits_total", 0) == hits
    finally:
        CONFIG.enable_result_cache = True


def test_capture_trace_writes_xprof(tmp_path):
    """capture_trace produces an xprof trace directory for a real query."""
    import os
    import numpy as np
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.utils.profile import capture_trace

    t = Table(columns={"v": Column.from_numpy(np.arange(10000), dt.INT64)})
    s = Session({"t": t})
    d = str(tmp_path / "trace")
    df = capture_trace(lambda: s.sql("select sum(v) s from t where v < 5000"),
                       d)
    assert df.s[0] == sum(range(5000))
    found = [os.path.join(r, f) for r, _, fs in os.walk(d) for f in fs]
    assert found, "no trace files written"


def test_insert_values_roundtrip():
    import numpy as np
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.session import Session

    t = Table(columns={
        "id": Column.from_numpy(np.array([1, 2], np.int64), dt.INT64),
        "name": Column.from_numpy(np.array(["a", "b"], object), dt.STRING),
        "price": Column.from_numpy(np.array([150, 250], np.int64),
                                   dt.DECIMAL(2)),
        "d": Column.from_numpy(np.array([0, 1], np.int32), dt.DATE),
    })
    s = Session({"t": t})
    s.sql("insert into t values (3, 'c', 3.75, '2024-06-01'), "
          "(4, 'zed', 10, '1999-12-31')")
    df = s.sql("select * from t order by id")
    assert list(df.id) == [1, 2, 3, 4]
    assert list(df.name) == ["a", "b", "c", "zed"]
    assert list(df.price) == [1.50, 2.50, 3.75, 10.00]
    assert str(df.d.iloc[2])[:10] == "2024-06-01"
    # partial column list -> unnamed columns become NULL
    s.sql("insert into t (id, name) values (5, null)")
    df = s.sql("select * from t where id = 5")
    assert df.name.isna().iloc[0] and df.price.isna().iloc[0]
    # aggregates see appended rows
    assert s.sql("select count(*) c from t").c[0] == 5


def test_admission_control_queues_and_rejects():
    """Concurrency gate (query-queue/SlotManager analog): with 1 slot, a
    second query queues behind the first; with a zero timeout it rejects."""
    import threading
    import time
    import numpy as np
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.config import CONFIG, set_config
    from starrocks_tpu.exec.session import Session

    t = Table(columns={"v": Column.from_numpy(np.arange(1000), dt.INT64)})
    s = Session({"t": t})
    old = (CONFIG.max_concurrent_queries, CONFIG.admission_timeout_s,
           CONFIG.enable_result_cache)
    set_config(max_concurrent_queries=1, admission_timeout_s=30.0,
               enable_result_cache=False)
    Session._admission = None          # rebuild the gate at the new size
    try:
        results = []
        barrier = threading.Barrier(3)

        def worker():
            barrier.wait()
            results.append(int(s.sql("select sum(v) s from t").s[0]))

        threads = [threading.Thread(target=worker) for _ in range(2)]
        for th in threads:
            th.start()
        barrier.wait()
        for th in threads:
            th.join(60)
        assert results == [sum(range(1000))] * 2   # both ran (serialized)

        # zero-timeout rejection while the single slot is held
        gate = Session._admit()
        assert gate.acquire(timeout=1)
        try:
            set_config(admission_timeout_s=0.05)
            import pytest as _pt
            with _pt.raises(RuntimeError, match="admission timeout"):
                s.sql("select count(*) c from t")
        finally:
            gate.release()
    finally:
        set_config(max_concurrent_queries=old[0], admission_timeout_s=old[1],
                   enable_result_cache=old[2])
        Session._admission = None


def test_http_query_endpoint(tpch_tables):
    """REST query front door: POST /api/query runs SQL through the session
    and returns JSON rows; errors surface as JSON with HTTP 400."""
    import json
    import urllib.request

    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.utils.metrics import serve_metrics

    s = Session(dict(tpch_tables))
    srv = serve_metrics(port=0, session=s)
    try:
        port = srv.server_address[1]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/query",
            data=b"select count(*) c from nation", method="POST")
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["columns"] == ["c"] and out["rows"][0][0] == 25
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/query",
            data=b"select nope from nation", method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400 and b"error" in e.read()
    finally:
        srv.shutdown()
