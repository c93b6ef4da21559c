"""SSB-Flat: the 13 queries, engine vs pandas goldens, exact row match."""

import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.exec.session import Session
from starrocks_tpu.io import ssb
from starrocks_tpu.sql.ssb_sql import QUERIES

from test_tpch_suite import assert_rows_equal


@pytest.fixture(scope="module")
def data():
    raw = ssb.generate_flat(sf=0.01)
    return Session({"lineorder_flat": ssb.to_table(raw)}), ssb.to_pandas(raw)


def golden(name, df):
    d = df
    yr = d.lo_orderdate.dt.year

    def agg(sel, keys, val, out):
        g = (sel.assign(d_year=yr[sel.index])
             .groupby(keys, as_index=False)[[val]].sum()
             .rename(columns={val: out}))
        return g

    if name.startswith("q1"):
        if name == "q1.1":
            sel = d[(yr == 1993) & d.lo_discount.between(1, 3) & (d.lo_quantity < 25)]
        elif name == "q1.2":
            sel = d[(yr == 1994) & (d.lo_orderdate.dt.month == 1)
                    & d.lo_discount.between(4, 6) & d.lo_quantity.between(26, 35)]
        else:
            iso = d.lo_orderdate.dt.isocalendar().week
            sel = d[(iso == 6) & (yr == 1994)
                    & d.lo_discount.between(5, 7) & d.lo_quantity.between(26, 35)]
        return pd.DataFrame({"revenue": [
            (sel.lo_extendedprice * sel.lo_discount).sum()]})
    if name.startswith("q2"):
        if name == "q2.1":
            sel = d[(d.p_category == "MFGR#12") & (d.s_region == "AMERICA")]
        elif name == "q2.2":
            sel = d[(d.p_brand >= "MFGR#2221") & (d.p_brand <= "MFGR#2228")
                    & (d.s_region == "ASIA")]
        else:
            sel = d[(d.p_brand == "MFGR#2239") & (d.s_region == "EUROPE")]
        g = agg(sel, ["d_year", "p_brand"], "lo_revenue", "lo_revenue")
        g = g[["lo_revenue", "d_year", "p_brand"]]
        return g.sort_values(["d_year", "p_brand"], kind="stable").reset_index(drop=True)
    if name.startswith("q3"):
        rng = (d.lo_orderdate >= "1992-01-01") & (d.lo_orderdate <= "1997-12-31")
        if name == "q3.1":
            sel = d[(d.c_region == "ASIA") & (d.s_region == "ASIA") & rng]
            keys = ["c_nation", "s_nation", "d_year"]
        elif name == "q3.2":
            sel = d[(d.c_nation == "UNITED STATES") & (d.s_nation == "UNITED STATES") & rng]
            keys = ["c_city", "s_city", "d_year"]
        elif name == "q3.3":
            sel = d[d.c_city.isin(["UNITED KI1", "UNITED KI5"])
                    & d.s_city.isin(["UNITED KI1", "UNITED KI5"]) & rng]
            keys = ["c_city", "s_city", "d_year"]
        else:
            sel = d[d.c_city.isin(["UNITED KI1", "UNITED KI5"])
                    & d.s_city.isin(["UNITED KI1", "UNITED KI5"])
                    & (yr == 1997) & (d.lo_orderdate.dt.month == 12)]
            keys = ["c_city", "s_city", "d_year"]
        g = agg(sel, keys, "lo_revenue", "lo_revenue")
        return (g.sort_values(["d_year", "lo_revenue"], ascending=[True, False],
                              kind="stable").reset_index(drop=True))
    # q4.x
    prof = d.lo_revenue - d.lo_supplycost
    if name == "q4.1":
        sel = d[(d.c_region == "AMERICA") & (d.s_region == "AMERICA")
                & d.p_mfgr.isin(["MFGR#1", "MFGR#2"])]
        keys = ["d_year", "c_nation"]
    elif name == "q4.2":
        sel = d[(d.c_region == "AMERICA") & (d.s_region == "AMERICA")
                & yr.isin([1997, 1998]) & d.p_mfgr.isin(["MFGR#1", "MFGR#2"])]
        keys = ["d_year", "s_nation", "p_category"]
    else:
        sel = d[(d.s_nation == "UNITED STATES") & yr.isin([1997, 1998])
                & (d.p_category == "MFGR#14")]
        keys = ["d_year", "s_city", "p_brand"]
    g = (sel.assign(d_year=yr[sel.index], profit=prof[sel.index])
         .groupby(keys, as_index=False)[["profit"]].sum())
    return g.sort_values(keys, kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", list(QUERIES))
def test_ssb_query(name, data):
    sess, df = data
    got = sess.sql(QUERIES[name])
    want = golden(name, df)
    got.columns = list(want.columns)
    assert_rows_equal(got, want)
