"""Golden (trusted host) implementations of the 22 TPC-H queries in pandas.

The model for exact-row-match verification follows the reference's SQL-tester
(T/R golden diff, /root/reference/test/run.py): the engine's output rows are
compared against these pandas results over the *same* generated data.

Representation contract (matches the engine's storage):
- decimals are int64 fixed-point; arithmetic stays exact-integer wherever the
  engine's does, and is decoded to float dollars only at the very end
- dates are int32 days since 1970-01-01, decoded to datetime64[D] at the end
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _days(s: str) -> int:
    return int((np.datetime64(s) - np.datetime64("1970-01-01")).astype(int))


def _dec(s, scale: int):
    return s.astype(np.float64) / 10**scale


def _date(s):
    return s.astype("datetime64[D]")


def _year(days):
    return pd.Series(np.asarray(days, "datetime64[D]").astype("datetime64[Y]").astype(int) + 1970,
                     index=days.index)


ALL = {}


def _q(fn):
    ALL[fn.__name__] = fn
    return fn


@_q
def q1(t):
    li = t["lineitem"]
    d = li[li.l_shipdate <= _days("1998-12-01") - 90].copy()
    d["disc_price"] = d.l_extendedprice * (100 - d.l_discount)            # s4
    d["charge"] = d.disc_price * (100 + d.l_tax)                          # s6
    g = d.groupby(["l_returnflag", "l_linestatus"], sort=True)
    out = pd.DataFrame({
        "sum_qty": _dec(g.l_quantity.sum(), 2),
        "sum_base_price": _dec(g.l_extendedprice.sum(), 2),
        "sum_disc_price": _dec(g.disc_price.sum(), 4),
        "sum_charge": _dec(g.charge.sum(), 6),
        "avg_qty": g.l_quantity.mean() / 100.0,
        "avg_price": g.l_extendedprice.mean() / 100.0,
        "avg_disc": g.l_discount.mean() / 100.0,
        "count_order": g.size(),
    }).reset_index()
    return out


@_q
def q2(t):
    p, s, ps, n, r = t["part"], t["supplier"], t["partsupp"], t["nation"], t["region"]
    eu_n = n.merge(r[r.r_name == "EUROPE"], left_on="n_regionkey", right_on="r_regionkey")
    eu = ps.merge(s, left_on="ps_suppkey", right_on="s_suppkey").merge(
        eu_n, left_on="s_nationkey", right_on="n_nationkey")
    minc = eu.groupby("ps_partkey", as_index=False).ps_supplycost.min().rename(
        columns={"ps_supplycost": "min_cost"})
    pf = p[(p.p_size == 15) & p.p_type.str.endswith("BRASS")]
    j = eu.merge(pf, left_on="ps_partkey", right_on="p_partkey").merge(minc, on="ps_partkey")
    j = j[j.ps_supplycost == j.min_cost]
    out = j[["s_acctbal", "s_name", "n_name", "p_partkey", "p_mfgr",
             "s_address", "s_phone", "s_comment"]].copy()
    out["s_acctbal"] = _dec(out.s_acctbal, 2)
    out = out.sort_values(["s_acctbal", "n_name", "s_name", "p_partkey"],
                          ascending=[False, True, True, True], kind="stable").head(100)
    return out.reset_index(drop=True)


@_q
def q3(t):
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    cf = c[c.c_mktsegment == "BUILDING"]
    of = o[o.o_orderdate < _days("1995-03-15")]
    lf = li[li.l_shipdate > _days("1995-03-15")]
    j = lf.merge(of, left_on="l_orderkey", right_on="o_orderkey").merge(
        cf, left_on="o_custkey", right_on="c_custkey")
    j = j.assign(rev=j.l_extendedprice * (100 - j.l_discount))
    g = j.groupby(["l_orderkey", "o_orderdate", "o_shippriority"], as_index=False).rev.sum()
    g = g.sort_values(["rev", "o_orderdate"], ascending=[False, True], kind="stable").head(10)
    return pd.DataFrame({
        "l_orderkey": g.l_orderkey.to_numpy(),
        "revenue": _dec(g.rev, 4).to_numpy(),
        "o_orderdate": _date(g.o_orderdate.to_numpy()),
        "o_shippriority": g.o_shippriority.to_numpy(),
    })


@_q
def q4(t):
    o, li = t["orders"], t["lineitem"]
    of = o[(o.o_orderdate >= _days("1993-07-01")) & (o.o_orderdate < _days("1993-10-01"))]
    lf = li[li.l_commitdate < li.l_receiptdate]
    sel = of[of.o_orderkey.isin(lf.l_orderkey)]
    g = sel.groupby("o_orderpriority", sort=True).size().reset_index(name="order_count")
    return g


@_q
def q5(t):
    c, o, li, s, n, r = (t["customer"], t["orders"], t["lineitem"],
                         t["supplier"], t["nation"], t["region"])
    of = o[(o.o_orderdate >= _days("1994-01-01")) & (o.o_orderdate < _days("1995-01-01"))]
    asian = n.merge(r[r.r_name == "ASIA"], left_on="n_regionkey", right_on="r_regionkey")
    j = (li.merge(of, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j.c_nationkey == j.s_nationkey]
    j = j.merge(asian, left_on="s_nationkey", right_on="n_nationkey")
    j = j.assign(rev=j.l_extendedprice * (100 - j.l_discount))
    g = j.groupby("n_name", as_index=False).rev.sum()
    g = g.sort_values("rev", ascending=False, kind="stable")
    return pd.DataFrame({"n_name": g.n_name.to_numpy(), "revenue": _dec(g.rev, 4).to_numpy()})


@_q
def q6(t):
    li = t["lineitem"]
    m = ((li.l_shipdate >= _days("1994-01-01")) & (li.l_shipdate < _days("1995-01-01"))
         & (li.l_discount >= 5) & (li.l_discount <= 7) & (li.l_quantity < 2400))
    rev = (li.l_extendedprice[m] * li.l_discount[m]).sum()
    return pd.DataFrame({"revenue": [rev / 1e4]})


@_q
def q7(t):
    s, li, o, c, n = t["supplier"], t["lineitem"], t["orders"], t["customer"], t["nation"]
    lf = li[(li.l_shipdate >= _days("1995-01-01")) & (li.l_shipdate <= _days("1996-12-31"))]
    j = (lf.merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(n.rename(columns={"n_name": "supp_nation"}), left_on="s_nationkey",
                  right_on="n_nationkey")
           .merge(n.rename(columns={"n_name": "cust_nation", "n_nationkey": "nk2"}),
                  left_on="c_nationkey", right_on="nk2"))
    m = (((j.supp_nation == "FRANCE") & (j.cust_nation == "GERMANY"))
         | ((j.supp_nation == "GERMANY") & (j.cust_nation == "FRANCE")))
    j = j[m].copy()
    j["l_year"] = _year(j.l_shipdate)
    j["volume"] = j.l_extendedprice * (100 - j.l_discount)
    g = j.groupby(["supp_nation", "cust_nation", "l_year"], as_index=False, sort=True).volume.sum()
    g["revenue"] = _dec(g.volume, 4)
    return g.drop(columns="volume")


@_q
def q8(t):
    p, s, li, o, c, n, r = (t["part"], t["supplier"], t["lineitem"], t["orders"],
                            t["customer"], t["nation"], t["region"])
    pf = p[p.p_type == "ECONOMY ANODIZED STEEL"]
    of = o[(o.o_orderdate >= _days("1995-01-01")) & (o.o_orderdate <= _days("1996-12-31"))]
    amer = n.merge(r[r.r_name == "AMERICA"], left_on="n_regionkey", right_on="r_regionkey")
    j = (li.merge(pf[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
           .merge(of[["o_orderkey", "o_custkey", "o_orderdate"]],
                  left_on="l_orderkey", right_on="o_orderkey")
           .merge(c[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
           .merge(amer[["n_nationkey"]], left_on="c_nationkey", right_on="n_nationkey")
           .merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
           .merge(n.rename(columns={"n_name": "nation", "n_nationkey": "nk2"})[["nation", "nk2"]],
                  left_on="s_nationkey", right_on="nk2"))
    j = j.assign(o_year=_year(j.o_orderdate), volume=j.l_extendedprice * (100 - j.l_discount))
    j["brazil"] = np.where(j.nation == "BRAZIL", j.volume, 0)
    g = j.groupby("o_year", as_index=False, sort=True).agg(num=("brazil", "sum"),
                                                           den=("volume", "sum"))
    g["mkt_share"] = g.num / g.den
    return g[["o_year", "mkt_share"]]


@_q
def q9(t):
    p, s, li, ps, o, n = (t["part"], t["supplier"], t["lineitem"], t["partsupp"],
                          t["orders"], t["nation"])
    pf = p[p.p_name.str.contains("green")]
    j = (li.merge(pf[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
           .merge(ps, left_on=["l_partkey", "l_suppkey"], right_on=["ps_partkey", "ps_suppkey"])
           .merge(o[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
           .merge(s[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
           .merge(n[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey"))
    j = j.assign(
        o_year=_year(j.o_orderdate),
        amount=j.l_extendedprice * (100 - j.l_discount) - j.ps_supplycost * j.l_quantity,  # s4
        nation=j.n_name,
    )
    g = j.groupby(["nation", "o_year"], as_index=False).amount.sum()
    g = g.sort_values(["nation", "o_year"], ascending=[True, False], kind="stable")
    g["sum_profit"] = _dec(g.amount, 4)
    return g.drop(columns="amount").reset_index(drop=True)


@_q
def q10(t):
    c, o, li, n = t["customer"], t["orders"], t["lineitem"], t["nation"]
    of = o[(o.o_orderdate >= _days("1993-10-01")) & (o.o_orderdate < _days("1994-01-01"))]
    lf = li[li.l_returnflag == "R"]
    j = (lf.merge(of, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    j = j.assign(rev=j.l_extendedprice * (100 - j.l_discount))
    g = j.groupby(["c_custkey", "c_name", "c_acctbal", "c_phone", "n_name",
                   "c_address", "c_comment"], as_index=False).rev.sum()
    g = g.sort_values("rev", ascending=False, kind="stable").head(20)
    return pd.DataFrame({
        "c_custkey": g.c_custkey.to_numpy(), "c_name": g.c_name.to_numpy(),
        "revenue": _dec(g.rev, 4).to_numpy(), "c_acctbal": _dec(g.c_acctbal, 2).to_numpy(),
        "n_name": g.n_name.to_numpy(), "c_address": g.c_address.to_numpy(),
        "c_phone": g.c_phone.to_numpy(), "c_comment": g.c_comment.to_numpy(),
    })


@_q
def q11(t):
    ps, s, n = t["partsupp"], t["supplier"], t["nation"]
    sf = s.merge(n[n.n_name == "GERMANY"], left_on="s_nationkey", right_on="n_nationkey")
    j = ps.merge(sf[["s_suppkey"]], left_on="ps_suppkey", right_on="s_suppkey")
    j = j.assign(value=j.ps_supplycost * j.ps_availqty)                   # s2 * qty -> s2
    g = j.groupby("ps_partkey", as_index=False).value.sum()
    total = j.value.sum()
    g = g[g.value * 10_000 > total]
    g = g.sort_values("value", ascending=False, kind="stable")
    return pd.DataFrame({"ps_partkey": g.ps_partkey.to_numpy(),
                         "value": _dec(g.value, 2).to_numpy()})


@_q
def q12(t):
    o, li = t["orders"], t["lineitem"]
    lf = li[li.l_shipmode.isin(["MAIL", "SHIP"])
            & (li.l_commitdate < li.l_receiptdate)
            & (li.l_shipdate < li.l_commitdate)
            & (li.l_receiptdate >= _days("1994-01-01"))
            & (li.l_receiptdate < _days("1995-01-01"))]
    j = lf.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    hi = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    g = j.assign(hi=hi.astype(np.int64), lo=(~hi).astype(np.int64)).groupby(
        "l_shipmode", as_index=False, sort=True).agg(
        high_line_count=("hi", "sum"), low_line_count=("lo", "sum"))
    return g


@_q
def q13(t):
    c, o = t["customer"], t["orders"]
    of = o[~o.o_comment.str.contains("special.*requests", regex=True)]
    cnt = of.groupby("o_custkey").size()
    c_count = c.c_custkey.map(cnt).fillna(0).astype(np.int64)
    g = c_count.value_counts().reset_index()
    g.columns = ["c_count", "custdist"]
    g = g.sort_values(["custdist", "c_count"], ascending=[False, False], kind="stable")
    return g.reset_index(drop=True)


@_q
def q14(t):
    li, p = t["lineitem"], t["part"]
    lf = li[(li.l_shipdate >= _days("1995-09-01")) & (li.l_shipdate < _days("1995-10-01"))]
    j = lf.merge(p, left_on="l_partkey", right_on="p_partkey")
    vol = j.l_extendedprice * (100 - j.l_discount)
    promo = np.where(j.p_type.str.startswith("PROMO"), vol, 0)
    return pd.DataFrame({"promo_revenue": [100.0 * promo.sum() / vol.sum()]})


@_q
def q15(t):
    li, s = t["lineitem"], t["supplier"]
    lf = li[(li.l_shipdate >= _days("1996-01-01")) & (li.l_shipdate < _days("1996-04-01"))]
    rev = lf.assign(r=lf.l_extendedprice * (100 - lf.l_discount)).groupby(
        "l_suppkey", as_index=False).r.sum()
    mx = rev.r.max()
    top = rev[rev.r == mx]
    j = top.merge(s, left_on="l_suppkey", right_on="s_suppkey").sort_values("s_suppkey")
    return pd.DataFrame({
        "s_suppkey": j.s_suppkey.to_numpy(), "s_name": j.s_name.to_numpy(),
        "s_address": j.s_address.to_numpy(), "s_phone": j.s_phone.to_numpy(),
        "total_revenue": _dec(j.r, 4).to_numpy(),
    })


@_q
def q16(t):
    ps, p, s = t["partsupp"], t["part"], t["supplier"]
    pf = p[(p.p_brand != "Brand#45") & ~p.p_type.str.startswith("MEDIUM POLISHED")
           & p.p_size.isin([49, 14, 23, 45, 19, 3, 36, 9])]
    bad = s[s.s_comment.str.contains("Customer.*Complaints", regex=True)].s_suppkey
    j = ps.merge(pf, left_on="ps_partkey", right_on="p_partkey")
    j = j[~j.ps_suppkey.isin(bad)]
    g = j.drop_duplicates(["p_brand", "p_type", "p_size", "ps_suppkey"]).groupby(
        ["p_brand", "p_type", "p_size"], as_index=False).size().rename(
        columns={"size": "supplier_cnt"})
    g = g.sort_values(["supplier_cnt", "p_brand", "p_type", "p_size"],
                      ascending=[False, True, True, True], kind="stable")
    return g.reset_index(drop=True)


@_q
def q17(t):
    li, p = t["lineitem"], t["part"]
    pf = p[(p.p_brand == "Brand#23") & (p.p_container == "MED BOX")]
    avgq = li.groupby("l_partkey").agg(s=("l_quantity", "sum"), c=("l_quantity", "count"))
    j = li.merge(pf[["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
    j = j.join(avgq, on="l_partkey")
    m = 5 * j.l_quantity * j.c < j.s                     # qty < 0.2*avg, exact ints
    return pd.DataFrame({"avg_yearly": [j.l_extendedprice[m].sum() / 100.0 / 7.0]})


@_q
def q18(t):
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    sums = li.groupby("l_orderkey", as_index=False).l_quantity.sum()
    big = sums[sums.l_quantity > 300 * 100]
    j = (o.merge(big, left_on="o_orderkey", right_on="l_orderkey")
          .merge(c, left_on="o_custkey", right_on="c_custkey"))
    j = j.sort_values(["o_totalprice", "o_orderdate"], ascending=[False, True],
                      kind="stable").head(100)
    return pd.DataFrame({
        "c_name": j.c_name.to_numpy(), "c_custkey": j.c_custkey.to_numpy(),
        "o_orderkey": j.o_orderkey.to_numpy(), "o_orderdate": _date(j.o_orderdate.to_numpy()),
        "o_totalprice": _dec(j.o_totalprice, 2).to_numpy(),
        "sum_qty": _dec(j.l_quantity, 2).to_numpy(),
    })


@_q
def q19(t):
    li, p = t["lineitem"], t["part"]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    base = (j.l_shipmode.isin(["AIR", "REG AIR"]) &
            (j.l_shipinstruct == "DELIVER IN PERSON"))
    c1 = ((j.p_brand == "Brand#12") & j.p_container.isin(["SM CASE", "SM BOX", "SM PACK", "SM PKG"])
          & (j.l_quantity >= 100) & (j.l_quantity <= 1100) & (j.p_size <= 5))
    c2 = ((j.p_brand == "Brand#23") & j.p_container.isin(["MED BAG", "MED BOX", "MED PKG", "MED PACK"])
          & (j.l_quantity >= 1000) & (j.l_quantity <= 2000) & (j.p_size <= 10))
    c3 = ((j.p_brand == "Brand#34") & j.p_container.isin(["LG CASE", "LG BOX", "LG PACK", "LG PKG"])
          & (j.l_quantity >= 2000) & (j.l_quantity <= 3000) & (j.p_size <= 15))
    m = base & (j.p_size >= 1) & (c1 | c2 | c3)
    rev = (j.l_extendedprice[m] * (100 - j.l_discount[m])).sum()
    return pd.DataFrame({"revenue": [rev / 1e4]})


@_q
def q20(t):
    s, n, ps, p, li = t["supplier"], t["nation"], t["partsupp"], t["part"], t["lineitem"]
    pf = p[p.p_name.str.startswith("forest")]
    lf = li[(li.l_shipdate >= _days("1994-01-01")) & (li.l_shipdate < _days("1995-01-01"))]
    q = lf.groupby(["l_partkey", "l_suppkey"], as_index=False).l_quantity.sum()
    j = (ps.merge(pf[["p_partkey"]], left_on="ps_partkey", right_on="p_partkey")
           .merge(q, left_on=["ps_partkey", "ps_suppkey"], right_on=["l_partkey", "l_suppkey"]))
    j = j[j.ps_availqty * 200 > j.l_quantity]            # availqty > 0.5*sum(qty), exact
    sel = s[s.s_suppkey.isin(j.ps_suppkey)]
    sel = sel.merge(n[n.n_name == "CANADA"], left_on="s_nationkey", right_on="n_nationkey")
    sel = sel.sort_values("s_name")
    return pd.DataFrame({"s_name": sel.s_name.to_numpy(), "s_address": sel.s_address.to_numpy()})


@_q
def q21(t):
    s, li, o, n = t["supplier"], t["lineitem"], t["orders"], t["nation"]
    nsupp = li.drop_duplicates(["l_orderkey", "l_suppkey"]).groupby("l_orderkey").size()
    late = li[li.l_receiptdate > li.l_commitdate]
    nlate = late.drop_duplicates(["l_orderkey", "l_suppkey"]).groupby("l_orderkey").size()
    l1 = late.merge(o[o.o_orderstatus == "F"][["o_orderkey"]],
                    left_on="l_orderkey", right_on="o_orderkey")
    l1 = l1[(l1.l_orderkey.map(nsupp) >= 2) & (l1.l_orderkey.map(nlate) == 1)]
    j = (l1.merge(s, left_on="l_suppkey", right_on="s_suppkey")
           .merge(n[n.n_name == "SAUDI ARABIA"], left_on="s_nationkey",
                  right_on="n_nationkey"))
    g = j.groupby("s_name", as_index=False).size().rename(columns={"size": "numwait"})
    g = g.sort_values(["numwait", "s_name"], ascending=[False, True], kind="stable").head(100)
    return g.reset_index(drop=True)


@_q
def q22(t):
    c, o = t["customer"], t["orders"]
    codes = ["13", "31", "23", "29", "30", "18", "17"]
    cc = c.c_phone.str[:2]
    sel = c[cc.isin(codes)].copy()
    sel["cntrycode"] = cc[cc.isin(codes)]
    pos = sel[sel.c_acctbal > 0]
    s_, n_ = pos.c_acctbal.sum(), len(pos)
    # c_acctbal > avg  <=>  c_acctbal * n > sum (exact ints)
    sel = sel[sel.c_acctbal * n_ > s_]
    sel = sel[~sel.c_custkey.isin(o.o_custkey)]
    g = sel.groupby("cntrycode", as_index=False, sort=True).agg(
        numcust=("c_custkey", "size"), tot=("c_acctbal", "sum"))
    g["totacctbal"] = _dec(g.tot, 2)
    return g.drop(columns="tot")


def run(name: str, frames) -> pd.DataFrame:
    return ALL[name](frames)
