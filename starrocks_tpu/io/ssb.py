"""SSB (Star Schema Benchmark) data generator — flat (denormalized) form.

Analog of the reference's SSB benchmark setup (docs/en/benchmarking/
SSB_Benchmarking.md; schema test/common/sql/ssb/create.sql). The reference's
headline is SSB-Flat: the 13 queries over a pre-joined `lineorder_flat`
table (lineorder x customer x supplier x part on-the-fly dims), which is the
shape that matters for a columnar scan engine.

Domains follow the SSB spec: 5 regions, 25 nations, cities = nation prefix
(9 chars) + digit, part mfgr MFGR#1-5 / category MFGR#<m><1-5> / brand
MFGR#<cat><1-40>, discounts 0-10, quantities 1-50, order dates
1992-01-01..1998-08-02. Values are plain ints (the reference stores SSB
prices as int), so goldens are exact.
"""

from __future__ import annotations

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table

REGIONS = np.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])
NATIONS = np.array([
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES"])
NATION_REGION = np.array([0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0, 0, 0,
                          1, 2, 3, 4, 2, 3, 3, 1])

DATE_LO = np.datetime64("1992-01-01").astype("datetime64[D]").astype(np.int32)
DATE_HI = np.datetime64("1998-08-02").astype("datetime64[D]").astype(np.int32)


def _cities(nation_idx, digit):
    base = np.array([n[:9].ljust(9) for n in NATIONS])
    return np.char.add(base[nation_idx], digit.astype(str))


def generate_flat(sf: float = 0.01, seed: int = 19940607) -> dict[str, np.ndarray]:
    """Generate `lineorder_flat` raw columns (~6M rows at sf=1)."""
    rng = np.random.default_rng(seed)
    n = int(6_000_000 * sf)

    ncust = max(int(30_000 * sf), 500)
    nsupp = max(int(2_000 * sf), 250)
    npart = max(int(200_000 * min(sf, 1) ** 0.5), 2000)

    # round-robin nation/city/part-hierarchy assignment: every (nation, city
    # digit) and every brand exists at any scale, so the benchmark's
    # constant filters (UNITED KI1, MFGR#2239, ...) are never vacuous
    c_nation = np.arange(ncust) % 25
    c_city_d = (np.arange(ncust) // 25) % 10
    s_nation = np.arange(nsupp) % 25
    s_city_d = (np.arange(nsupp) // 25) % 10
    p_mfgr = np.arange(npart) % 5 + 1                     # MFGR#1..5
    p_cat = p_mfgr * 10 + (np.arange(npart) // 5) % 5 + 1
    p_brand = p_cat * 100 + (np.arange(npart) // 25) % 40 + 1

    ck = rng.integers(0, ncust, n)
    sk = rng.integers(0, nsupp, n)
    pk = rng.integers(0, npart, n)

    lo_orderdate = rng.integers(DATE_LO, DATE_HI + 1, n).astype(np.int32)
    lo_quantity = rng.integers(1, 51, n).astype(np.int64)
    lo_discount = rng.integers(0, 11, n).astype(np.int64)
    lo_extendedprice = rng.integers(90_000, 10_000_000, n).astype(np.int64)
    lo_revenue = lo_extendedprice * (100 - lo_discount) // 100
    lo_supplycost = (lo_extendedprice * 6) // 10 + rng.integers(0, 100_000, n)

    return {
        "lo_orderkey": np.arange(n, dtype=np.int64) // 4 + 1,
        "lo_linenumber": np.arange(n, dtype=np.int64) % 7 + 1,
        "lo_custkey": ck.astype(np.int64) + 1,
        "lo_suppkey": sk.astype(np.int64) + 1,
        "lo_partkey": pk.astype(np.int64) + 1,
        "lo_orderdate": lo_orderdate,
        "lo_quantity": lo_quantity,
        "lo_discount": lo_discount,
        "lo_extendedprice": lo_extendedprice,
        "lo_revenue": lo_revenue,
        "lo_supplycost": lo_supplycost.astype(np.int64),
        "c_city": _cities(c_nation, c_city_d)[ck],
        "c_nation": NATIONS[c_nation][ck],
        "c_region": REGIONS[NATION_REGION[c_nation]][ck],
        "s_city": _cities(s_nation, s_city_d)[sk],
        "s_nation": NATIONS[s_nation][sk],
        "s_region": REGIONS[NATION_REGION[s_nation]][sk],
        "p_mfgr": np.char.add("MFGR#", p_mfgr.astype(str))[pk],
        "p_category": np.char.add("MFGR#", p_cat.astype(str))[pk],
        "p_brand": np.char.add("MFGR#", p_brand.astype(str))[pk],
    }


_TYPES = {
    "lo_orderdate": dt.DATE,
}


def to_table(raw: dict[str, np.ndarray]) -> Table:
    # cluster-sort by order date (the flat-table sort key): SSB's
    # d_year/yearmonth filters prune via zone maps on the sorted column
    if "lo_orderdate" in raw:
        order = np.argsort(raw["lo_orderdate"], kind="stable")
        raw = {c: v[order] for c, v in raw.items()}
    cols = {}
    for name, arr in raw.items():
        if arr.dtype.kind in ("U", "O", "S"):
            cols[name] = Column.from_numpy(arr.astype(str), dt.STRING)
        elif name in _TYPES:
            cols[name] = Column.from_numpy(arr, _TYPES[name])
        elif (arr.dtype.kind == "i" and name.endswith("key")
                and arr.size and 0 <= arr.min() and arr.max() < 2**31):
            cols[name] = Column.from_numpy(arr.astype(np.int32), dt.INT32)
        else:
            cols[name] = Column.from_numpy(arr, dt.INT64)
    return Table(columns=cols)


def to_pandas(raw: dict[str, np.ndarray]):
    import pandas as pd
    out = {}
    for name, arr in raw.items():
        if name == "lo_orderdate":
            out[name] = arr.astype("datetime64[D]")
        else:
            out[name] = arr
    return pd.DataFrame(out)
