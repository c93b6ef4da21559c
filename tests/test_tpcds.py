"""TPC-DS: engine results vs an independent SQLite golden executor.

Same role as the reference's SQL-tester golden diffs (test/run.py, R/ files):
run the query text over identical generated data in both engines, then
compare canonicalized rows (exact for ints/strings, 1e-6 relative for
floats/decimals — SQLite computes decimal math in binary floating point).
"""
import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.exec.session import Session
from starrocks_tpu.golden.sqlite_golden import build_db, run_golden
from starrocks_tpu.io import tpcds
from starrocks_tpu.sql.tpcds_sql import GOLDEN_OVERRIDES, QUERIES


@pytest.fixture(scope="module")
def ds():
    raw = tpcds.generate(sf=0.04)
    tables = tpcds.to_tables(raw)
    frames = tpcds.to_pandas(raw)
    return Session(tables), build_db(frames)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for i, c in enumerate(df.columns):
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.strftime("%Y-%m-%d")
        elif not pd.api.types.is_numeric_dtype(s):
            s = s.astype(object)
        out[f"c{i}"] = s.reset_index(drop=True)
    return pd.DataFrame(out)


def compare(got: pd.DataFrame, want: pd.DataFrame, qname: str):
    got, want = _canon(got), _canon(want)
    assert got.shape == want.shape, \
        f"{qname}: shape {got.shape} vs golden {want.shape}"
    # canonical order: sort by every column (floats rounded so ordering
    # can't flip on representation noise)
    def keyframe(df):
        k = df.copy()
        for c in k.columns:
            if k[c].dtype.kind == "f":
                k[c] = k[c].round(4)
        return k.sort_values(list(k.columns), kind="stable",
                             na_position="last").index
    got = got.loc[keyframe(got)].reset_index(drop=True)
    want = want.loc[keyframe(want)].reset_index(drop=True)
    for c in got.columns:
        g, w = got[c], want[c]
        g_na, w_na = g.isna(), w.isna()
        assert (g_na == w_na).all(), f"{qname}/{c}: NULL mismatch"
        g, w = g[~g_na], w[~w_na]
        if len(g) == 0:
            continue
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.astype(float), w.astype(float), rtol=1e-6, atol=1e-9,
                err_msg=f"{qname}/{c}")
        else:
            assert (g.astype(str).to_numpy()
                    == w.astype(str).to_numpy()).all(), f"{qname}/{c}"


@pytest.mark.parametrize("qname", sorted(QUERIES, key=lambda s: (int(s[1:].rstrip('b')), s)))
def test_tpcds_query(ds, qname):
    sess, conn = ds
    got = sess.sql(QUERIES[qname])
    want = run_golden(conn, GOLDEN_OVERRIDES.get(qname, QUERIES[qname]))
    compare(got, want, qname)
