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
