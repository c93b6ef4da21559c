"""TPC-H schema + data generator.

The engine's correctness bar is exact-row-match between the TPU engine and a
trusted host (pandas) executor over the *same* generated data, mirroring the
reference's SQL-tester golden-diff strategy (/root/reference/test/run.py,
T/R result files). This generator follows dbgen's schema, value domains and
word lists (distributions are simplified; seeded + deterministic) so all 22
queries select non-trivial row sets.

Monetary values are fixed-point cents (DECIMAL scale 2); discount/tax are
scale-2 fractions (e.g. 0.04 -> 4). Dates are int32 days since 1970-01-01.
"""

from __future__ import annotations

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table

# ---------------------------------------------------------------------------
# Schemas (column name -> DataType), TPC-H spec order.
# ---------------------------------------------------------------------------

DEC2 = dt.DECIMAL(2)

SCHEMAS: dict[str, dict[str, dt.DataType]] = {
    "region": {
        "r_regionkey": dt.INT32,
        "r_name": dt.STRING,
        "r_comment": dt.STRING,
    },
    "nation": {
        "n_nationkey": dt.INT32,
        "n_name": dt.STRING,
        "n_regionkey": dt.INT32,
        "n_comment": dt.STRING,
    },
    "supplier": {
        "s_suppkey": dt.INT64,
        "s_name": dt.STRING,
        "s_address": dt.STRING,
        "s_nationkey": dt.INT32,
        "s_phone": dt.STRING,
        "s_acctbal": DEC2,
        "s_comment": dt.STRING,
    },
    "part": {
        "p_partkey": dt.INT64,
        "p_name": dt.STRING,
        "p_mfgr": dt.STRING,
        "p_brand": dt.STRING,
        "p_type": dt.STRING,
        "p_size": dt.INT32,
        "p_container": dt.STRING,
        "p_retailprice": DEC2,
        "p_comment": dt.STRING,
    },
    "partsupp": {
        "ps_partkey": dt.INT64,
        "ps_suppkey": dt.INT64,
        "ps_availqty": dt.INT32,
        "ps_supplycost": DEC2,
        "ps_comment": dt.STRING,
    },
    "customer": {
        "c_custkey": dt.INT64,
        "c_name": dt.STRING,
        "c_address": dt.STRING,
        "c_nationkey": dt.INT32,
        "c_phone": dt.STRING,
        "c_acctbal": DEC2,
        "c_mktsegment": dt.STRING,
        "c_comment": dt.STRING,
    },
    "orders": {
        "o_orderkey": dt.INT64,
        "o_custkey": dt.INT64,
        "o_orderstatus": dt.STRING,
        "o_totalprice": DEC2,
        "o_orderdate": dt.DATE,
        "o_orderpriority": dt.STRING,
        "o_clerk": dt.STRING,
        "o_shippriority": dt.INT32,
        "o_comment": dt.STRING,
    },
    "lineitem": {
        "l_orderkey": dt.INT64,
        "l_partkey": dt.INT64,
        "l_suppkey": dt.INT64,
        "l_linenumber": dt.INT32,
        "l_quantity": DEC2,
        "l_extendedprice": DEC2,
        "l_discount": DEC2,
        "l_tax": DEC2,
        "l_returnflag": dt.STRING,
        "l_linestatus": dt.STRING,
        "l_shipdate": dt.DATE,
        "l_commitdate": dt.DATE,
        "l_receiptdate": dt.DATE,
        "l_shipinstruct": dt.STRING,
        "l_shipmode": dt.STRING,
        "l_comment": dt.STRING,
    },
}

# ---------------------------------------------------------------------------
# dbgen word lists (TPC-H spec 4.2.2.13 / appendix)
# ---------------------------------------------------------------------------

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# (name, regionkey) in nationkey order, per dbgen dists.dss
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]

TYPE_S1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_S2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_S3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAINER_S1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_S2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
INSTRUCTIONS = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
# p_name is 5 words from this color list (dbgen P_NAME)
COLORS = [
    "almond", "antique", "aquamarine", "azure", "beige", "bisque", "black",
    "blanched", "blue", "blush", "brown", "burlywood", "burnished", "chartreuse",
    "chiffon", "chocolate", "coral", "cornflower", "cornsilk", "cream", "cyan",
    "dark", "deep", "dim", "dodger", "drab", "firebrick", "floral", "forest",
    "frosted", "gainsboro", "ghost", "goldenrod", "green", "grey", "honeydew",
    "hot", "hotpink", "indian", "ivory", "khaki", "lace", "lavender", "lawn",
    "lemon", "light", "lime", "linen", "magenta", "maroon", "medium", "metallic",
    "midnight", "mint", "misty", "moccasin", "navajo", "navy", "olive", "orange",
    "orchid", "pale", "papaya", "peach", "peru", "pink", "plum", "powder",
    "puff", "purple", "red", "rose", "rosy", "royal", "saddle", "salmon",
    "sandy", "seashell", "sienna", "sky", "slate", "smoke", "snow", "spring",
    "steel", "tan", "thistle", "tomato", "turquoise", "violet", "wheat", "white",
    "yellow",
]
COMMENT_WORDS = [
    "furiously", "quickly", "carefully", "blithely", "slyly", "ironic",
    "final", "bold", "regular", "express", "pending", "even", "silent",
    "unusual", "deposits", "packages", "accounts", "instructions", "requests",
    "foxes", "ideas", "theodolites", "pinto", "beans", "platelets", "asymptotes",
    "dependencies", "excuses", "sauternes", "warthogs", "courts", "dolphins",
]

EPOCH_1992 = (np.datetime64("1992-01-01") - np.datetime64("1970-01-01")).astype(int)
DATE_RANGE_DAYS = (np.datetime64("1998-08-03") - np.datetime64("1992-01-01")).astype(int)


def _comments(rng: np.random.Generator, n: int, nwords: int = 5) -> np.ndarray:
    words = np.array(COMMENT_WORDS)
    picks = rng.integers(0, len(words), size=(n, nwords))
    parts = words[picks]
    out = parts[:, 0]
    for i in range(1, nwords):
        out = np.char.add(np.char.add(out, " "), parts[:, i])
    return out.astype(object)


def _inject(rng, comments: np.ndarray, pattern_words: tuple[str, str], frac: float):
    """Inject 'X ... Y' into a fraction of comments (for LIKE '%X%Y%')."""
    n = len(comments)
    hit = rng.random(n) < frac
    mid = _comments(rng, int(hit.sum()), 2)
    comments[hit] = np.char.add(
        np.char.add(pattern_words[0] + " ", mid.astype(str)),
        " " + pattern_words[1],
    ).astype(object)
    return comments


def _phones(rng, nationkeys: np.ndarray) -> np.ndarray:
    cc = (nationkeys + 10).astype(str)
    def seg(width, lo, hi):
        return np.char.zfill(rng.integers(lo, hi, size=len(nationkeys)).astype(str), width)
    return (
        np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
            cc, "-"), seg(3, 100, 1000)), "-"), seg(3, 100, 1000)), "-"), seg(4, 1000, 10000))
    ).astype(object)


def generate(sf: float = 0.01, seed: int = 19920401) -> dict[str, dict[str, np.ndarray]]:
    """Generate all 8 TPC-H tables at scale factor `sf` as numpy column dicts."""
    rng = np.random.default_rng(seed)
    t: dict[str, dict[str, np.ndarray]] = {}

    # region / nation -------------------------------------------------------
    t["region"] = {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": np.array(REGIONS, object),
        "r_comment": _comments(rng, 5),
    }
    nk = np.arange(25, dtype=np.int32)
    t["nation"] = {
        "n_nationkey": nk,
        "n_name": np.array([n for n, _ in NATIONS], object),
        "n_regionkey": np.array([r for _, r in NATIONS], np.int32),
        "n_comment": _comments(rng, 25),
    }

    # supplier --------------------------------------------------------------
    n_supp = max(int(10_000 * sf), 10)
    sk = np.arange(1, n_supp + 1, dtype=np.int64)
    s_nat = rng.integers(0, 25, n_supp).astype(np.int32)
    s_comment = _comments(rng, n_supp, 6)
    # ~0.05% get 'Customer ... Complaints' (Q16 anti-filter)
    s_comment = _inject(rng, s_comment, ("Customer", "Complaints"), 0.005)
    t["supplier"] = {
        "s_suppkey": sk,
        "s_name": np.char.add("Supplier#", np.char.zfill(sk.astype(str), 9)).astype(object),
        "s_address": _comments(rng, n_supp, 2),
        "s_nationkey": s_nat,
        "s_phone": _phones(rng, s_nat),
        "s_acctbal": rng.integers(-99999, 999999, n_supp).astype(np.int64),
        "s_comment": s_comment,
    }

    # part ------------------------------------------------------------------
    n_part = max(int(200_000 * sf), 200)
    pk = np.arange(1, n_part + 1, dtype=np.int64)
    name_picks = np.array(COLORS, object)[rng.integers(0, len(COLORS), (n_part, 5))]
    p_name = name_picks[:, 0]
    for i in range(1, 5):
        p_name = np.char.add(np.char.add(p_name.astype(str), " "), name_picks[:, i].astype(str))
    mfgr_m = rng.integers(1, 6, n_part)
    brand_n = rng.integers(1, 6, n_part)
    p_type = (
        np.char.add(np.char.add(np.char.add(np.char.add(
            np.array(TYPE_S1, object)[rng.integers(0, 6, n_part)].astype(str), " "),
            np.array(TYPE_S2, object)[rng.integers(0, 5, n_part)].astype(str)), " "),
            np.array(TYPE_S3, object)[rng.integers(0, 5, n_part)].astype(str))
    )
    container = np.char.add(
        np.char.add(np.array(CONTAINER_S1, object)[rng.integers(0, 5, n_part)].astype(str), " "),
        np.array(CONTAINER_S2, object)[rng.integers(0, 8, n_part)].astype(str))
    # spec: (90000 + ((partkey/10) mod 20001) + 100*(partkey mod 1000)) cents
    retail = 90000 + (pk // 10) % 20001 + 100 * (pk % 1000)
    t["part"] = {
        "p_partkey": pk,
        "p_name": p_name.astype(object),
        "p_mfgr": np.char.add("Manufacturer#", mfgr_m.astype(str)).astype(object),
        "p_brand": np.char.add("Brand#", (mfgr_m * 10 + brand_n).astype(str)).astype(object),
        "p_type": p_type.astype(object),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_container": container.astype(object),
        "p_retailprice": retail.astype(np.int64),
        "p_comment": _comments(rng, n_part, 3),
    }

    # partsupp: 4 suppliers per part ---------------------------------------
    ps_pk = np.repeat(pk, 4)
    # dbgen formula spreads suppliers; emulate with stride pattern (unique pairs)
    j = np.tile(np.arange(4, dtype=np.int64), n_part)
    ps_sk = 1 + (ps_pk + j * (n_supp // 4 + 1)) % n_supp
    t["partsupp"] = {
        "ps_partkey": ps_pk,
        "ps_suppkey": ps_sk,
        "ps_availqty": rng.integers(1, 10_000, len(ps_pk)).astype(np.int32),
        "ps_supplycost": rng.integers(100, 100_001, len(ps_pk)).astype(np.int64),
        "ps_comment": _comments(rng, len(ps_pk), 4),
    }

    # customer --------------------------------------------------------------
    n_cust = max(int(150_000 * sf), 150)
    ck = np.arange(1, n_cust + 1, dtype=np.int64)
    c_nat = rng.integers(0, 25, n_cust).astype(np.int32)
    t["customer"] = {
        "c_custkey": ck,
        "c_name": np.char.add("Customer#", np.char.zfill(ck.astype(str), 9)).astype(object),
        "c_address": _comments(rng, n_cust, 2),
        "c_nationkey": c_nat,
        "c_phone": _phones(rng, c_nat),
        "c_acctbal": rng.integers(-99999, 999999, n_cust).astype(np.int64),
        "c_mktsegment": np.array(SEGMENTS, object)[rng.integers(0, 5, n_cust)],
        "c_comment": _comments(rng, n_cust, 6),
    }

    # orders ----------------------------------------------------------------
    n_ord = max(int(1_500_000 * sf), 1500)
    ok = np.arange(1, n_ord + 1, dtype=np.int64)
    # dbgen: only custkeys not divisible by 3 place orders (Q22 needs no-order customers)
    cand = ck[ck % 3 != 0]
    o_ck = cand[rng.integers(0, len(cand), n_ord)]
    o_date = (EPOCH_1992 + rng.integers(0, DATE_RANGE_DAYS - 151, n_ord)).astype(np.int32)
    o_comment = _comments(rng, n_ord, 6)
    o_comment = _inject(rng, o_comment, ("special", "requests"), 0.01)
    t["orders"] = {
        "o_orderkey": ok,
        "o_custkey": o_ck,
        "o_orderstatus": None,  # filled after lineitem
        "o_totalprice": None,
        "o_orderdate": o_date,
        "o_orderpriority": np.array(PRIORITIES, object)[rng.integers(0, 5, n_ord)],
        "o_clerk": np.char.add("Clerk#", np.char.zfill(
            rng.integers(1, max(int(1000 * sf), 10) + 1, n_ord).astype(str), 9)).astype(object),
        "o_shippriority": np.zeros(n_ord, np.int32),
        "o_comment": o_comment,
    }

    # lineitem: 1..7 lines per order ---------------------------------------
    nlines = rng.integers(1, 8, n_ord)
    l_ok = np.repeat(ok, nlines)
    n_li = len(l_ok)
    l_ln = np.concatenate([np.arange(1, c + 1) for c in nlines]).astype(np.int32)
    l_pk = rng.integers(1, n_part + 1, n_li).astype(np.int64)
    # supplier must be one of the part's 4 partsupp suppliers (Q9 joins ps on both keys)
    jj = rng.integers(0, 4, n_li).astype(np.int64)
    l_sk = 1 + (l_pk + jj * (n_supp // 4 + 1)) % n_supp
    qty = rng.integers(1, 51, n_li).astype(np.int64)
    extended = qty * retail[l_pk - 1]  # cents, = l_quantity * p_retailprice
    disc = rng.integers(0, 11, n_li).astype(np.int64)   # 0.00-0.10
    tax = rng.integers(0, 9, n_li).astype(np.int64)     # 0.00-0.08
    od = np.repeat(o_date, nlines).astype(np.int64)
    shipd = od + rng.integers(1, 122, n_li)
    commitd = od + rng.integers(30, 91, n_li)
    receiptd = shipd + rng.integers(1, 31, n_li)
    today = EPOCH_1992 + DATE_RANGE_DAYS - 151 + 121 + 30  # generation currentdate analog
    cur = (np.datetime64("1995-06-17") - np.datetime64("1970-01-01")).astype(int)
    rflag = np.where(
        receiptd <= cur, np.where(rng.random(n_li) < 0.5, "R", "A"), "N"
    ).astype(object)
    lstatus = np.where(shipd > cur, "O", "F").astype(object)
    t["lineitem"] = {
        "l_orderkey": l_ok,
        "l_partkey": l_pk,
        "l_suppkey": l_sk,
        "l_linenumber": l_ln,
        "l_quantity": qty * 100,          # scale-2 cents representation
        "l_extendedprice": extended,
        "l_discount": disc,
        "l_tax": tax,
        "l_returnflag": rflag,
        "l_linestatus": lstatus,
        "l_shipdate": shipd.astype(np.int32),
        "l_commitdate": commitd.astype(np.int32),
        "l_receiptdate": receiptd.astype(np.int32),
        "l_shipinstruct": np.array(INSTRUCTIONS, object)[rng.integers(0, 4, n_li)],
        "l_shipmode": np.array(SHIPMODES, object)[rng.integers(0, 7, n_li)],
        "l_comment": _comments(rng, n_li, 4),
    }

    # derive o_orderstatus / o_totalprice from lineitems
    # totalprice = sum(extendedprice*(1+tax)*(1-discount)) -- scale 2, rounded
    line_total = extended * (100 + tax) * (100 - disc) // 10_000
    o_total = np.zeros(n_ord, np.int64)
    np.add.at(o_total, l_ok - 1, line_total)
    all_f = np.ones(n_ord, bool)
    any_f = np.zeros(n_ord, bool)
    is_f = lstatus == "F"
    np.logical_and.at(all_f, l_ok - 1, is_f)
    np.logical_or.at(any_f, l_ok - 1, is_f)
    t["orders"]["o_orderstatus"] = np.where(all_f, "F", np.where(any_f, "P", "O")).astype(object)
    t["orders"]["o_totalprice"] = o_total
    return t


# cluster (sort-at-load) keys per the reference's benchmark DDL
# (docs/en/benchmarking/TPC-H_Benchmarking.md DUPLICATE KEY clauses):
# physically ordering fact rows by date makes zone maps selective for the
# date-range predicates every TPC-H query carries
CLUSTER_KEYS = {
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def to_tables(raw: dict[str, dict[str, np.ndarray]],
              cluster: dict | None = None) -> dict[str, Table]:
    """Convert generated numpy columns into engine Tables; fact tables are
    cluster-sorted host-side first (the sort-key/DUPLICATE KEY analog)."""
    from starrocks_tpu.column import dtypes as _dt
    out = {}
    cluster = CLUSTER_KEYS if cluster is None else cluster
    for tname, cols in raw.items():
        schema = SCHEMAS[tname]
        keys = cluster.get(tname)
        if keys:
            order = np.lexsort([cols[k] for k in reversed(keys)])
            cols = {c: v[order] for c, v in cols.items()}
        columns = {}
        for cname in schema:
            arr, dtype = cols[cname], schema[cname]
            # join/group keys that fit int32 load narrow: halves the
            # bit-packed sort passes in merge joins and the gather traffic
            # of carried columns (TPC-H keys fit up to ~SF300)
            if (dtype.kind is _dt.TypeKind.INT64 and cname.endswith("key")
                    and arr.size and arr.max() < 2**31 and arr.min() >= 0):
                arr, dtype = arr.astype(np.int32), _dt.INT32
            columns[cname] = Column.from_numpy(arr, dtype)
        out[tname] = Table(columns=columns)
    return out


def to_pandas(raw: dict[str, dict[str, np.ndarray]]):
    """Convert generated numpy columns into pandas frames for the golden
    executor. Decimal columns stay as int64 cents (exact); dates as int days
    — golden queries must use the same representation to compare exactly."""
    import pandas as pd

    return {tname: pd.DataFrame(cols) for tname, cols in raw.items()}
