"""Hand-built physical plans for the 22 TPC-H queries.

These are the engine's reference plans (the SQL planner, sql/, must produce
equivalent plans from query text). Join order and build-side choices follow
TPC-H's FK->PK structure so every join builds on a unique key — the analog of
StarRocks' optimizer choosing the small/unique side as the hash-table build
(HashJoinCostModel.java). Scalar subqueries become global aggregates +
BroadcastScalar; correlated EXISTS subqueries are decorrelated into
aggregates + joins (the same rewrites StarRocks' optimizer applies,
fe/.../sql/optimizer/rule/transformation/).

Each builder takes a scale factor `sf` for capacity estimates (inaccuracy is
safe: exec.plan.execute grows capacities on overflow and retries).
"""

from __future__ import annotations

from starrocks_tpu.exprs.expr import (
    Case, Coalesce, ExtractYear, IsNull, Like, col, date_lit, decimal_lit,
    lift, substring,
)
from starrocks_tpu.exec.plan import (
    AddColumns, Aggregate, BroadcastScalar, Filter, HashJoin, Limit, PlanNode,
    Project, Scan, Sort,
)
from starrocks_tpu.ops.hash_agg import AggSpec
from starrocks_tpu.ops.sort import SortKey


def _cap(n: float) -> int:
    p = 16
    while p < 2 * n:
        p *= 2
    return p


def _sizes(sf: float) -> dict[str, int]:
    return {
        "supplier": max(int(10_000 * sf), 10),
        "part": max(int(200_000 * sf), 200),
        "partsupp": 4 * max(int(200_000 * sf), 200),
        "customer": max(int(150_000 * sf), 150),
        "orders": max(int(1_500_000 * sf), 1500),
        "lineitem": 4 * max(int(1_500_000 * sf), 1500),
        "nation": 25,
        "region": 5,
    }


ALL = {}


def _q(fn):
    ALL[fn.__name__] = fn
    return fn


@_q
def q1(sf):
    disc_price = col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))
    base = Filter(Scan("lineitem"), col("l_shipdate") <= date_lit("1998-09-02"))
    base = AddColumns(base, {"disc_price": disc_price,
                             "charge": disc_price * (decimal_lit(1, 2) + col("l_tax"))})
    agg = Aggregate(base, ("l_returnflag", "l_linestatus"), (
        AggSpec("sum", "l_quantity", "sum_qty"),
        AggSpec("sum", "l_extendedprice", "sum_base_price"),
        AggSpec("sum", "disc_price", "sum_disc_price"),
        AggSpec("sum", "charge", "sum_charge"),
        AggSpec("sum", "l_discount", "sum_disc"),
        AggSpec("count_star", None, "count_order"),
    ), est_groups=8)
    proj = Project(agg, {
        "l_returnflag": "l_returnflag", "l_linestatus": "l_linestatus",
        "sum_qty": "sum_qty", "sum_base_price": "sum_base_price",
        "sum_disc_price": "sum_disc_price", "sum_charge": "sum_charge",
        "avg_qty": col("sum_qty") / col("count_order"),
        "avg_price": col("sum_base_price") / col("count_order"),
        "avg_disc": col("sum_disc") / col("count_order"),
        "count_order": "count_order",
    })
    return Sort(proj, (SortKey("l_returnflag"), SortKey("l_linestatus")))


@_q
def q2(sf):
    z = _sizes(sf)
    nat_eu = HashJoin(Scan("nation"),
                      Filter(Scan("region"), col("r_name") == "EUROPE"),
                      ("n_regionkey",), ("r_regionkey",), "semi", capacity=16)
    supp_eu = HashJoin(Scan("supplier"), nat_eu, ("s_nationkey",), ("n_nationkey",),
                       "inner", ("n_name",), capacity=64)
    eu_ps = HashJoin(Scan("partsupp"), supp_eu, ("ps_suppkey",), ("s_suppkey",),
                     "inner", ("s_name", "s_acctbal", "s_address", "s_phone",
                               "s_comment", "n_name"), capacity=_cap(z["supplier"]))
    minc = Project(
        Aggregate(eu_ps, ("ps_partkey",), (AggSpec("min", "ps_supplycost", "min_cost"),),
                  est_groups=z["part"]),
        {"ps_partkey": "ps_partkey", "min_cost": "min_cost"})
    pf = Filter(Scan("part"), (col("p_size") == 15) & col("p_type").like("%BRASS"))
    j = HashJoin(eu_ps, pf, ("ps_partkey",), ("p_partkey",), "inner",
                 ("p_mfgr",), capacity=_cap(z["part"] / 50))
    j = HashJoin(j, minc, ("ps_partkey",), ("ps_partkey",), "inner",
                 ("min_cost",), capacity=_cap(z["part"]))
    j = Filter(j, col("ps_supplycost") == col("min_cost"))
    proj = Project(j, {k: k for k in
                       ("s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
                        "s_address", "s_phone", "s_comment")})
    proj.outputs["p_partkey"] = col("ps_partkey")
    return Sort(proj, (SortKey("s_acctbal", asc=False), SortKey("n_name"),
                       SortKey("s_name"), SortKey("p_partkey")), limit=100)


@_q
def q3(sf):
    z = _sizes(sf)
    c = Filter(Scan("customer"), col("c_mktsegment") == "BUILDING")
    o = Filter(Scan("orders"), col("o_orderdate") < date_lit("1995-03-15"))
    li = Filter(Scan("lineitem"), col("l_shipdate") > date_lit("1995-03-15"))
    o2 = HashJoin(o, c, ("o_custkey",), ("c_custkey",), "semi", capacity=_cap(z["customer"] / 4))
    j = HashJoin(li, o2, ("l_orderkey",), ("o_orderkey",), "inner",
                 ("o_orderdate", "o_shippriority"), capacity=_cap(z["orders"] / 2))
    j = AddColumns(j, {"rev": col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))})
    g = Aggregate(j, ("l_orderkey", "o_orderdate", "o_shippriority"),
                  (AggSpec("sum", "rev", "revenue"),), est_groups=z["orders"] // 8)
    g = Project(g, {"l_orderkey": "l_orderkey", "revenue": "revenue",
                    "o_orderdate": "o_orderdate", "o_shippriority": "o_shippriority"})
    return Sort(g, (SortKey("revenue", asc=False), SortKey("o_orderdate")), limit=10)


@_q
def q4(sf):
    z = _sizes(sf)
    o = Filter(Scan("orders"), (col("o_orderdate") >= date_lit("1993-07-01"))
               & (col("o_orderdate") < date_lit("1993-10-01")))
    li = Filter(Scan("lineitem"), col("l_commitdate") < col("l_receiptdate"))
    sel = HashJoin(o, li, ("o_orderkey",), ("l_orderkey",), "semi",
                   capacity=_cap(z["orders"]))
    g = Aggregate(sel, ("o_orderpriority",), (AggSpec("count_star", None, "order_count"),),
                  est_groups=8)
    return Sort(g, (SortKey("o_orderpriority"),))


@_q
def q5(sf):
    z = _sizes(sf)
    o = Filter(Scan("orders"), (col("o_orderdate") >= date_lit("1994-01-01"))
               & (col("o_orderdate") < date_lit("1995-01-01")))
    nat = HashJoin(Scan("nation"), Filter(Scan("region"), col("r_name") == "ASIA"),
                   ("n_regionkey",), ("r_regionkey",), "semi", capacity=16)
    j = HashJoin(Scan("lineitem"), o, ("l_orderkey",), ("o_orderkey",), "inner",
                 ("o_custkey",), capacity=_cap(z["orders"] / 4))
    j = HashJoin(j, Scan("customer"), ("o_custkey",), ("c_custkey",), "inner",
                 ("c_nationkey",), capacity=_cap(z["customer"]))
    j = HashJoin(j, Scan("supplier"), ("l_suppkey",), ("s_suppkey",), "inner",
                 ("s_nationkey",), capacity=_cap(z["supplier"]))
    j = Filter(j, col("c_nationkey") == col("s_nationkey"))
    j = HashJoin(j, nat, ("s_nationkey",), ("n_nationkey",), "inner",
                 ("n_name",), capacity=64)
    j = AddColumns(j, {"rev": col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))})
    g = Aggregate(j, ("n_name",), (AggSpec("sum", "rev", "revenue"),), est_groups=32)
    return Sort(g, (SortKey("revenue", asc=False),))


@_q
def q6(sf):
    li = Filter(Scan("lineitem"),
                (col("l_shipdate") >= date_lit("1994-01-01"))
                & (col("l_shipdate") < date_lit("1995-01-01"))
                & col("l_discount").between(decimal_lit(0.05, 2), decimal_lit(0.07, 2))
                & (col("l_quantity") < decimal_lit(24, 2)))
    li = AddColumns(li, {"rev": col("l_extendedprice") * col("l_discount")})
    return Aggregate(li, (), (AggSpec("sum", "rev", "revenue"),))


@_q
def q7(sf):
    z = _sizes(sf)
    li = Filter(Scan("lineitem"),
                (col("l_shipdate") >= date_lit("1995-01-01"))
                & (col("l_shipdate") <= date_lit("1996-12-31")))
    n1 = Project(Scan("nation"), {"n_nationkey": "n_nationkey", "supp_nation": col("n_name")})
    n2 = Project(Scan("nation"), {"n_nationkey": "n_nationkey", "cust_nation": col("n_name")})
    j = HashJoin(li, Scan("supplier"), ("l_suppkey",), ("s_suppkey",), "inner",
                 ("s_nationkey",), capacity=_cap(z["supplier"]))
    j = HashJoin(j, Scan("orders"), ("l_orderkey",), ("o_orderkey",), "inner",
                 ("o_custkey",), capacity=_cap(z["orders"]))
    j = HashJoin(j, Scan("customer"), ("o_custkey",), ("c_custkey",), "inner",
                 ("c_nationkey",), capacity=_cap(z["customer"]))
    j = HashJoin(j, n1, ("s_nationkey",), ("n_nationkey",), "inner", ("supp_nation",), capacity=64)
    j = HashJoin(j, n2, ("c_nationkey",), ("n_nationkey",), "inner", ("cust_nation",), capacity=64)
    j = Filter(j, ((col("supp_nation") == "FRANCE") & (col("cust_nation") == "GERMANY"))
               | ((col("supp_nation") == "GERMANY") & (col("cust_nation") == "FRANCE")))
    j = AddColumns(j, {"l_year": ExtractYear(col("l_shipdate")),
                       "volume": col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))})
    g = Aggregate(j, ("supp_nation", "cust_nation", "l_year"),
                  (AggSpec("sum", "volume", "revenue"),), est_groups=16)
    return Sort(g, (SortKey("supp_nation"), SortKey("cust_nation"), SortKey("l_year")))


@_q
def q8(sf):
    z = _sizes(sf)
    p = Filter(Scan("part"), col("p_type") == "ECONOMY ANODIZED STEEL")
    o = Filter(Scan("orders"), (col("o_orderdate") >= date_lit("1995-01-01"))
               & (col("o_orderdate") <= date_lit("1996-12-31")))
    amer = HashJoin(Scan("nation"), Filter(Scan("region"), col("r_name") == "AMERICA"),
                    ("n_regionkey",), ("r_regionkey",), "semi", capacity=16)
    n2 = Project(Scan("nation"), {"n_nationkey": "n_nationkey", "nation": col("n_name")})
    j = HashJoin(Scan("lineitem"), p, ("l_partkey",), ("p_partkey",), "semi",
                 capacity=_cap(z["part"] / 64))
    j = HashJoin(j, o, ("l_orderkey",), ("o_orderkey",), "inner",
                 ("o_custkey", "o_orderdate"), capacity=_cap(z["orders"] / 2))
    j = HashJoin(j, Scan("customer"), ("o_custkey",), ("c_custkey",), "inner",
                 ("c_nationkey",), capacity=_cap(z["customer"]))
    j = HashJoin(j, amer, ("c_nationkey",), ("n_nationkey",), "semi", capacity=64)
    j = HashJoin(j, Scan("supplier"), ("l_suppkey",), ("s_suppkey",), "inner",
                 ("s_nationkey",), capacity=_cap(z["supplier"]))
    j = HashJoin(j, n2, ("s_nationkey",), ("n_nationkey",), "inner", ("nation",), capacity=64)
    vol = col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))
    j = AddColumns(j, {
        "o_year": ExtractYear(col("o_orderdate")),
        "volume": vol,
        "brazil": Case([(col("nation") == "BRAZIL", vol)], decimal_lit(0, 4)),
    })
    g = Aggregate(j, ("o_year",), (AggSpec("sum", "brazil", "num"),
                                   AggSpec("sum", "volume", "den")), est_groups=8)
    g = Project(g, {"o_year": "o_year", "mkt_share": col("num") / col("den")})
    return Sort(g, (SortKey("o_year"),))


@_q
def q9(sf):
    z = _sizes(sf)
    p = Filter(Scan("part"), col("p_name").like("%green%"))
    j = HashJoin(Scan("lineitem"), p, ("l_partkey",), ("p_partkey",), "semi",
                 capacity=_cap(z["part"]))
    j = HashJoin(j, Scan("partsupp"), ("l_partkey", "l_suppkey"),
                 ("ps_partkey", "ps_suppkey"), "inner", ("ps_supplycost",),
                 capacity=_cap(z["partsupp"]))
    j = HashJoin(j, Scan("orders"), ("l_orderkey",), ("o_orderkey",), "inner",
                 ("o_orderdate",), capacity=_cap(z["orders"]))
    j = HashJoin(j, Scan("supplier"), ("l_suppkey",), ("s_suppkey",), "inner",
                 ("s_nationkey",), capacity=_cap(z["supplier"]))
    j = HashJoin(j, Project(Scan("nation"), {"n_nationkey": "n_nationkey",
                                             "nation": col("n_name")}),
                 ("s_nationkey",), ("n_nationkey",), "inner", ("nation",), capacity=64)
    j = AddColumns(j, {
        "o_year": ExtractYear(col("o_orderdate")),
        "amount": col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))
                  - col("ps_supplycost") * col("l_quantity"),
    })
    g = Aggregate(j, ("nation", "o_year"), (AggSpec("sum", "amount", "sum_profit"),),
                  est_groups=256)
    return Sort(g, (SortKey("nation"), SortKey("o_year", asc=False)))


@_q
def q10(sf):
    z = _sizes(sf)
    o = Filter(Scan("orders"), (col("o_orderdate") >= date_lit("1993-10-01"))
               & (col("o_orderdate") < date_lit("1994-01-01")))
    li = Filter(Scan("lineitem"), col("l_returnflag") == "R")
    j = HashJoin(li, o, ("l_orderkey",), ("o_orderkey",), "inner",
                 ("o_custkey",), capacity=_cap(z["orders"] / 8))
    j = HashJoin(j, Scan("customer"), ("o_custkey",), ("c_custkey",), "inner",
                 ("c_name", "c_acctbal", "c_phone", "c_address", "c_comment",
                  "c_nationkey"), capacity=_cap(z["customer"]))
    j = HashJoin(j, Scan("nation"), ("c_nationkey",), ("n_nationkey",), "inner",
                 ("n_name",), capacity=64)
    j = AddColumns(j, {"rev": col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))})
    g = Aggregate(j, ("o_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                      "c_address", "c_comment"),
                  (AggSpec("sum", "rev", "revenue"),), est_groups=z["customer"] // 2)
    g = Project(g, {"c_custkey": col("o_custkey"), "c_name": "c_name",
                    "revenue": "revenue", "c_acctbal": "c_acctbal",
                    "n_name": "n_name", "c_address": "c_address",
                    "c_phone": "c_phone", "c_comment": "c_comment"})
    return Sort(g, (SortKey("revenue", asc=False),), limit=20)


@_q
def q11(sf):
    z = _sizes(sf)
    nat = Filter(Scan("nation"), col("n_name") == "GERMANY")
    s = HashJoin(Scan("supplier"), nat, ("s_nationkey",), ("n_nationkey",), "semi",
                 capacity=16)
    ps = HashJoin(Scan("partsupp"), s, ("ps_suppkey",), ("s_suppkey",), "semi",
                  capacity=_cap(z["supplier"]))
    ps = AddColumns(ps, {"value": col("ps_supplycost") * col("ps_availqty")})
    g = Aggregate(ps, ("ps_partkey",), (AggSpec("sum", "value", "value"),),
                  est_groups=z["part"])
    total = Aggregate(ps, (), (AggSpec("sum", "value", "total"),))
    g = BroadcastScalar(g, total, ("total",))
    g = Filter(g, col("value") * lift(10_000) > col("total"))
    g = Project(g, {"ps_partkey": "ps_partkey", "value": "value"})
    return Sort(g, (SortKey("value", asc=False),))


@_q
def q12(sf):
    z = _sizes(sf)
    li = Filter(Scan("lineitem"),
                col("l_shipmode").isin(["MAIL", "SHIP"])
                & (col("l_commitdate") < col("l_receiptdate"))
                & (col("l_shipdate") < col("l_commitdate"))
                & (col("l_receiptdate") >= date_lit("1994-01-01"))
                & (col("l_receiptdate") < date_lit("1995-01-01")))
    j = HashJoin(li, Scan("orders"), ("l_orderkey",), ("o_orderkey",), "inner",
                 ("o_orderpriority",), capacity=_cap(z["orders"]))
    hi = col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
    j = AddColumns(j, {"hi": Case([(hi, lift(1))], lift(0)),
                       "lo": Case([(hi, lift(0))], lift(1))})
    g = Aggregate(j, ("l_shipmode",), (AggSpec("sum", "hi", "high_line_count"),
                                       AggSpec("sum", "lo", "low_line_count")), est_groups=8)
    return Sort(g, (SortKey("l_shipmode"),))


@_q
def q13(sf):
    z = _sizes(sf)
    o = Filter(Scan("orders"), Like(col("o_comment"), "%special%requests%", negate=True))
    cnt = Aggregate(o, ("o_custkey",), (AggSpec("count_star", None, "cnt"),),
                    est_groups=z["customer"])
    c = HashJoin(Scan("customer"), cnt, ("c_custkey",), ("o_custkey",), "left_outer",
                 ("cnt",), capacity=_cap(z["customer"]))
    c = AddColumns(c, {"c_count": Coalesce([col("cnt"), lift(0)])})
    g = Aggregate(c, ("c_count",), (AggSpec("count_star", None, "custdist"),),
                  est_groups=64)
    return Sort(g, (SortKey("custdist", asc=False), SortKey("c_count", asc=False)))


@_q
def q14(sf):
    z = _sizes(sf)
    li = Filter(Scan("lineitem"), (col("l_shipdate") >= date_lit("1995-09-01"))
                & (col("l_shipdate") < date_lit("1995-10-01")))
    j = HashJoin(li, Scan("part"), ("l_partkey",), ("p_partkey",), "inner",
                 ("p_type",), capacity=_cap(z["part"]))
    vol = col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))
    j = AddColumns(j, {"volume": vol,
                       "promo": Case([(col("p_type").like("PROMO%"), vol)],
                                     decimal_lit(0, 4))})
    g = Aggregate(j, (), (AggSpec("sum", "promo", "p"), AggSpec("sum", "volume", "v")))
    return Project(g, {"promo_revenue": lift(100.0) * col("p") / col("v")})


@_q
def q15(sf):
    z = _sizes(sf)
    li = Filter(Scan("lineitem"), (col("l_shipdate") >= date_lit("1996-01-01"))
                & (col("l_shipdate") < date_lit("1996-04-01")))
    li = AddColumns(li, {"rev": col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))})
    rev = Aggregate(li, ("l_suppkey",), (AggSpec("sum", "rev", "total_revenue"),),
                    est_groups=z["supplier"])
    mx = Aggregate(rev, (), (AggSpec("max", "total_revenue", "mx"),))
    top = Filter(BroadcastScalar(rev, mx, ("mx",)), col("total_revenue") == col("mx"))
    j = HashJoin(top, Scan("supplier"), ("l_suppkey",), ("s_suppkey",), "inner",
                 ("s_name", "s_address", "s_phone"), capacity=_cap(z["supplier"]))
    j = Project(j, {"s_suppkey": col("l_suppkey"), "s_name": "s_name",
                    "s_address": "s_address", "s_phone": "s_phone",
                    "total_revenue": "total_revenue"})
    return Sort(j, (SortKey("s_suppkey"),))


@_q
def q16(sf):
    z = _sizes(sf)
    p = Filter(Scan("part"), (col("p_brand") != "Brand#45")
               & Like(col("p_type"), "MEDIUM POLISHED%", negate=True)
               & col("p_size").isin([49, 14, 23, 45, 19, 3, 36, 9]))
    bad = Filter(Scan("supplier"), col("s_comment").like("%Customer%Complaints%"))
    j = HashJoin(Scan("partsupp"), p, ("ps_partkey",), ("p_partkey",), "inner",
                 ("p_brand", "p_type", "p_size"), capacity=_cap(z["part"]))
    j = HashJoin(j, bad, ("ps_suppkey",), ("s_suppkey",), "anti",
                 capacity=_cap(z["supplier"] / 16))
    d = Aggregate(j, ("p_brand", "p_type", "p_size", "ps_suppkey"), (),
                  est_groups=z["partsupp"] // 8)
    g = Aggregate(d, ("p_brand", "p_type", "p_size"),
                  (AggSpec("count_star", None, "supplier_cnt"),),
                  est_groups=z["partsupp"] // 16)
    return Sort(g, (SortKey("supplier_cnt", asc=False), SortKey("p_brand"),
                    SortKey("p_type"), SortKey("p_size")))


@_q
def q17(sf):
    z = _sizes(sf)
    p = Filter(Scan("part"), (col("p_brand") == "Brand#23") & (col("p_container") == "MED BOX"))
    avgq = Aggregate(Scan("lineitem"), ("l_partkey",),
                     (AggSpec("sum", "l_quantity", "s"), AggSpec("count", "l_quantity", "c")),
                     est_groups=z["part"])
    avgq = Project(avgq, {"pk": col("l_partkey"), "s": "s", "c": "c"})
    j = HashJoin(Scan("lineitem"), p, ("l_partkey",), ("p_partkey",), "semi",
                 capacity=_cap(z["part"] / 100))
    j = HashJoin(j, avgq, ("l_partkey",), ("pk",), "inner", ("s", "c"),
                 capacity=_cap(z["part"]))
    j = Filter(j, lift(5) * col("l_quantity") * col("c") < col("s"))
    g = Aggregate(j, (), (AggSpec("sum", "l_extendedprice", "s_ext"),))
    return Project(g, {"avg_yearly": col("s_ext") / lift(7.0)})


@_q
def q18(sf, threshold: int = 300):
    z = _sizes(sf)
    sums = Aggregate(Scan("lineitem"), ("l_orderkey",),
                     (AggSpec("sum", "l_quantity", "sum_qty"),), est_groups=z["orders"])
    big = Filter(sums, col("sum_qty") > decimal_lit(threshold, 2))
    j = HashJoin(Scan("orders"), big, ("o_orderkey",), ("l_orderkey",), "inner",
                 ("sum_qty",), capacity=_cap(z["orders"]))
    j = HashJoin(j, Scan("customer"), ("o_custkey",), ("c_custkey",), "inner",
                 ("c_name",), capacity=_cap(z["customer"]))
    j = Project(j, {"c_name": "c_name", "c_custkey": col("o_custkey"),
                    "o_orderkey": "o_orderkey", "o_orderdate": "o_orderdate",
                    "o_totalprice": "o_totalprice", "sum_qty": "sum_qty"})
    return Sort(j, (SortKey("o_totalprice", asc=False), SortKey("o_orderdate")), limit=100)


@_q
def q19(sf):
    z = _sizes(sf)
    j = HashJoin(Scan("lineitem"), Scan("part"), ("l_partkey",), ("p_partkey",), "inner",
                 ("p_brand", "p_container", "p_size"), capacity=_cap(z["part"]))
    qty = col("l_quantity")
    base = (col("l_shipmode").isin(["AIR", "REG AIR"])
            & (col("l_shipinstruct") == "DELIVER IN PERSON") & (col("p_size") >= 1))
    c1 = ((col("p_brand") == "Brand#12")
          & col("p_container").isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & qty.between(decimal_lit(1, 2), decimal_lit(11, 2)) & (col("p_size") <= 5))
    c2 = ((col("p_brand") == "Brand#23")
          & col("p_container").isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & qty.between(decimal_lit(10, 2), decimal_lit(20, 2)) & (col("p_size") <= 10))
    c3 = ((col("p_brand") == "Brand#34")
          & col("p_container").isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & qty.between(decimal_lit(20, 2), decimal_lit(30, 2)) & (col("p_size") <= 15))
    j = Filter(j, base & (c1 | c2 | c3))
    j = AddColumns(j, {"rev": col("l_extendedprice") * (decimal_lit(1, 2) - col("l_discount"))})
    return Aggregate(j, (), (AggSpec("sum", "rev", "revenue"),))


@_q
def q20(sf):
    z = _sizes(sf)
    p = Filter(Scan("part"), col("p_name").like("forest%"))
    li = Filter(Scan("lineitem"), (col("l_shipdate") >= date_lit("1994-01-01"))
                & (col("l_shipdate") < date_lit("1995-01-01")))
    q = Aggregate(li, ("l_partkey", "l_suppkey"),
                  (AggSpec("sum", "l_quantity", "qsum"),), est_groups=z["partsupp"])
    ps = HashJoin(Scan("partsupp"), p, ("ps_partkey",), ("p_partkey",), "semi",
                  capacity=_cap(z["part"] / 64))
    ps = HashJoin(ps, q, ("ps_partkey", "ps_suppkey"), ("l_partkey", "l_suppkey"),
                  "inner", ("qsum",), capacity=_cap(z["partsupp"]))
    ps = Filter(ps, col("ps_availqty") * lift(200) > col("qsum"))
    s = HashJoin(Scan("supplier"), ps, ("s_suppkey",), ("ps_suppkey",), "semi",
                 capacity=_cap(z["partsupp"] / 4))
    s = HashJoin(s, Filter(Scan("nation"), col("n_name") == "CANADA"),
                 ("s_nationkey",), ("n_nationkey",), "semi", capacity=16)
    s = Project(s, {"s_name": "s_name", "s_address": "s_address"})
    return Sort(s, (SortKey("s_name"),))


@_q
def q21(sf):
    z = _sizes(sf)
    li = Scan("lineitem")
    late = Filter(li, col("l_receiptdate") > col("l_commitdate"))
    d_all = Aggregate(li, ("l_orderkey", "l_suppkey"), (), est_groups=z["lineitem"])
    nsupp = Project(Aggregate(d_all, ("l_orderkey",),
                              (AggSpec("count_star", None, "nsupp"),),
                              est_groups=z["orders"]),
                    {"ok1": col("l_orderkey"), "nsupp": "nsupp"})
    d_late = Aggregate(late, ("l_orderkey", "l_suppkey"), (), est_groups=z["lineitem"])
    nlate = Project(Aggregate(d_late, ("l_orderkey",),
                              (AggSpec("count_star", None, "nlate"),),
                              est_groups=z["orders"]),
                    {"ok2": col("l_orderkey"), "nlate": "nlate"})
    l1 = HashJoin(late, Filter(Scan("orders"), col("o_orderstatus") == "F"),
                  ("l_orderkey",), ("o_orderkey",), "semi", capacity=_cap(z["orders"]))
    l1 = HashJoin(l1, nsupp, ("l_orderkey",), ("ok1",), "inner", ("nsupp",),
                  capacity=_cap(z["orders"]))
    l1 = HashJoin(l1, nlate, ("l_orderkey",), ("ok2",), "inner", ("nlate",),
                  capacity=_cap(z["orders"]))
    l1 = Filter(l1, (col("nsupp") >= lift(2)) & (col("nlate") == lift(1)))
    l1 = HashJoin(l1, Scan("supplier"), ("l_suppkey",), ("s_suppkey",), "inner",
                  ("s_name", "s_nationkey"), capacity=_cap(z["supplier"]))
    l1 = HashJoin(l1, Filter(Scan("nation"), col("n_name") == "SAUDI ARABIA"),
                  ("s_nationkey",), ("n_nationkey",), "semi", capacity=16)
    g = Aggregate(l1, ("s_name",), (AggSpec("count_star", None, "numwait"),),
                  est_groups=z["supplier"])
    return Sort(g, (SortKey("numwait", asc=False), SortKey("s_name")), limit=100)


@_q
def q22(sf):
    z = _sizes(sf)
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    c = AddColumns(Scan("customer"), {"cntrycode": substring(col("c_phone"), 1, 2)})
    sel = Filter(c, col("cntrycode").isin(codes))
    pos = Filter(sel, col("c_acctbal") > decimal_lit(0, 2))
    avg = Aggregate(pos, (), (AggSpec("sum", "c_acctbal", "s"),
                              AggSpec("count", "c_acctbal", "n")))
    sel = BroadcastScalar(sel, avg, ("s", "n"))
    sel = Filter(sel, col("c_acctbal") * col("n") > col("s"))
    sel = HashJoin(sel, Scan("orders"), ("c_custkey",), ("o_custkey",), "anti",
                   capacity=_cap(z["customer"]))
    g = Aggregate(sel, ("cntrycode",), (AggSpec("count_star", None, "numcust"),
                                        AggSpec("sum", "c_acctbal", "totacctbal")),
                  est_groups=16)
    return Sort(g, (SortKey("cntrycode"),))


def build(name: str, sf: float, **kw) -> PlanNode:
    return ALL[name](sf, **kw)
