"""The 22 TPC-H queries from SQL text through the full frontend
(parse -> bind -> decorrelate -> plan -> execute), exact-match vs goldens."""

import pytest

from starrocks_tpu.exec.session import Session
from starrocks_tpu.golden import tpch_queries as golden
from starrocks_tpu.sql.tpch_sql import QUERIES

from test_tpch_suite import assert_rows_equal


@pytest.fixture(scope="module")
def session(tpch_tables):
    return Session(tpch_tables)


@pytest.mark.parametrize("name", [f"q{i}" for i in range(1, 23)])
def test_sql_query(name, session, tpch_frames):
    got = session.sql(QUERIES[name])
    want = golden.run(name, tpch_frames)
    got.columns = list(want.columns)  # synthetic names for exprs w/o alias
    assert_rows_equal(got, want)


def test_chain_fusion_fallback(tpch_tables, tpch_frames):
    """If a fused row-operator chain fails to compile (TPU remote-compile
    500 analog), the chain head degrades to per-operator execution and the
    query still returns exact results."""
    from starrocks_tpu.exec import plan as P
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.golden import tpch_queries as golden
    from starrocks_tpu.sql.tpch_sql import QUERIES

    s = Session(dict(tpch_tables))
    orig_op = P.ExecContext.op

    def poisoned(self, node, fn, *a, key=()):
        if (isinstance(key, tuple) and key and key[0] == "fchain"
                and not getattr(node, "_poked", False)):
            node._poked = True
            raise RuntimeError("simulated remote compile failure")
        return orig_op(self, node, fn, *a, key=key)

    P.ExecContext.op = poisoned
    try:
        for q in ("q1", "q6"):
            got = s.sql(QUERIES[q])
            want = golden.run(q, tpch_frames)
            assert_rows_equal(got, want)
    finally:
        P.ExecContext.op = orig_op
