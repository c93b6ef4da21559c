"""Two-phase aggregation pre-agg passthrough decision (P8 completion —
the should_expand_preagg_hash_tables analog, be/src/exec/aggregator.cpp:770):
a GROUP BY on a near-unique key must shuffle raw rows and aggregate ONCE;
a low-cardinality GROUP BY must keep the local pre-agg."""

import numpy as np
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.session import Session
from starrocks_tpu.parallel import dist as D


@pytest.fixture
def tables():
    n = 4096
    return {"t": Table(columns={
        "uk": Column.from_numpy(np.arange(n, dtype=np.int64), dt.INT64),
        "lk": Column.from_numpy(np.arange(n, dtype=np.int64) % 8, dt.INT64),
        "v": Column.from_numpy(np.ones(n, np.int64), dt.INT64),
    })}


def test_near_unique_key_passes_through(tables):
    D.AGG_STRATEGY.clear()
    mesh = D.make_mesh(4)
    sess = Session(dict(tables), mesh=mesh, partitioning={"t": None})
    df = sess.sql("select uk, sum(v) s from t group by uk order by uk limit 5")
    assert list(df.s) == [1] * 5
    assert "passthrough" in D.AGG_STRATEGY.values()
    assert "two_phase" not in D.AGG_STRATEGY.values()


def test_low_cardinality_key_keeps_preagg(tables):
    D.AGG_STRATEGY.clear()
    mesh = D.make_mesh(4)
    sess = Session(dict(tables), mesh=mesh, partitioning={"t": None})
    df = sess.sql("select lk, sum(v) s from t group by lk order by lk")
    assert list(df.s) == [512] * 8
    assert "two_phase" in D.AGG_STRATEGY.values()
    assert "passthrough" not in D.AGG_STRATEGY.values()
