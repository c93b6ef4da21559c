"""Golden (trusted host) implementations of the TPC-H queries in pandas.

The model for exact-row-match verification follows the reference's SQL-tester
(T/R golden diff, /root/reference/test/run.py): the engine's output rows are
compared against these pandas results over the *same* generated data.

Representation contract (matches the engine's storage):
- decimals are int64 fixed-point (scale in comments); arithmetic stays in
  exact integer domain wherever the engine's does
- dates are int32 days since 1970-01-01
- averages / divisions are float64 (compared with tolerance)
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _days(s: str) -> int:
    return int((np.datetime64(s) - np.datetime64("1970-01-01")).astype(int))


def q1(t: dict[str, pd.DataFrame]) -> pd.DataFrame:
    li = t["lineitem"]
    m = li.l_shipdate <= _days("1998-12-01") - 90
    d = li[m].copy()
    d["disc_price"] = d.l_extendedprice * (100 - d.l_discount)           # scale 4
    d["charge"] = d.disc_price * (100 + d.l_tax)                          # scale 6
    g = d.groupby(["l_returnflag", "l_linestatus"], sort=False)
    out = pd.DataFrame({
        "sum_qty": g.l_quantity.sum(),                                    # scale 2
        "sum_base_price": g.l_extendedprice.sum(),                        # scale 2
        "sum_disc_price": g.disc_price.sum(),                             # scale 4
        "sum_charge": g.charge.sum(),                                     # scale 6
        "avg_qty": g.l_quantity.mean() / 100.0,
        "avg_price": g.l_extendedprice.mean() / 100.0,
        "avg_disc": g.l_discount.mean() / 100.0,
        "count_order": g.size(),
    }).reset_index()
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q6(t: dict[str, pd.DataFrame]) -> pd.DataFrame:
    li = t["lineitem"]
    m = (
        (li.l_shipdate >= _days("1994-01-01"))
        & (li.l_shipdate < _days("1995-01-01"))
        & (li.l_discount >= 5) & (li.l_discount <= 7)
        & (li.l_quantity < 24 * 100)
    )
    rev = (li.l_extendedprice[m] * li.l_discount[m]).sum()                # scale 4
    return pd.DataFrame({"revenue": [rev]})
