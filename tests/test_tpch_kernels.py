"""End-to-end TPC-H Q1/Q6 through hand-composed kernel pipelines, exact-match
against the pandas golden executor (the M0+M1+M2 'minimum end-to-end slice'
from SURVEY.md §7)."""

import numpy as np
import pandas as pd
import jax

from starrocks_tpu.exprs import expr as E
from starrocks_tpu.golden import tpch_queries as golden
from starrocks_tpu.ops.hash_agg import AggSpec, groupby


def test_q1_exact(tpch_tables, tpch_frames):
    li = tpch_tables["lineitem"]

    @jax.jit
    def prepare(t):
        t = t.filter((E.col("l_shipdate") <= E.date_lit("1998-09-02")).eval(t).data)
        disc_price = (E.col("l_extendedprice") * (E.decimal_lit(1, 2) - E.col("l_discount")))
        charge = disc_price * (E.decimal_lit(1, 2) + E.col("l_tax"))
        t = t.with_column("disc_price", disc_price.eval(t))
        t = t.with_column("charge", charge.eval(t))
        return t

    t = prepare(li)
    aggs = (
        AggSpec("sum", "l_quantity", "sum_qty"),
        AggSpec("sum", "l_extendedprice", "sum_base_price"),
        AggSpec("sum", "disc_price", "sum_disc_price"),
        AggSpec("sum", "charge", "sum_charge"),
        AggSpec("count_star", None, "count_order"),
    )
    res = groupby(t, ("l_returnflag", "l_linestatus"), aggs)
    got = res.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)

    want = golden.q1(tpch_frames)
    assert list(got.l_returnflag) == list(want.l_returnflag)
    assert list(got.l_linestatus) == list(want.l_linestatus)
    # engine and golden both decode decimals to float dollars
    np.testing.assert_allclose(got.sum_qty, want.sum_qty)
    np.testing.assert_allclose(got.sum_base_price, want.sum_base_price)
    np.testing.assert_allclose(got.sum_disc_price, want.sum_disc_price)
    np.testing.assert_allclose(got.sum_charge, want.sum_charge)
    np.testing.assert_array_equal(got.count_order, want.count_order)
    np.testing.assert_allclose(got.sum_qty / got.count_order, want.avg_qty, rtol=1e-12)


def test_q6_exact(tpch_tables, tpch_frames):
    li = tpch_tables["lineitem"]

    @jax.jit
    def q6(t):
        import jax.numpy as jnp
        pred = (
            (E.col("l_shipdate") >= E.date_lit("1994-01-01"))
            & (E.col("l_shipdate") < E.date_lit("1995-01-01"))
            & E.col("l_discount").between(E.decimal_lit(0.05, 2), E.decimal_lit(0.07, 2))
            & (E.col("l_quantity") < E.decimal_lit(24, 2))
        )
        t = t.filter(pred.eval(t).data)
        rev = (E.col("l_extendedprice") * E.col("l_discount")).eval(t)
        return jnp.sum(jnp.where(t.live_mask(), rev.data, 0))

    got = int(q6(li))  # scale-4 integer revenue
    want = float(golden.q6(tpch_frames).revenue[0])  # decoded dollars
    assert got == round(want * 1e4)


def test_zone_map_pruning_exact():
    """Zone-map block pruning (BlockScan) returns the exact same rows as the
    full scan, and q6's tight shipdate range actually prunes blocks."""
    import jax
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.exec.plan import BlockScan
    from starrocks_tpu.io import tpch
    from starrocks_tpu.sql.tpch_sql import QUERIES
    from starrocks_tpu.sql import catalog as C

    old = C.ZONE_BLOCK_ROWS
    C.ZONE_BLOCK_ROWS = 1 << 12
    try:
        raw = tpch.generate(sf=0.02)
        pruned = Session(tpch.to_tables(raw))
        meta = pruned.catalog.get("lineitem")
        assert meta.zone_maps and meta.block_rows == 1 << 12
        # identical session with zone maps stripped = full scans
        full = Session(dict(pruned.tables))
        for m in full.catalog.tables.values():
            m.zone_maps = {}
        for name in ["q1", "q6", "q14", "q15", "q20"]:
            a = pruned.sql(QUERIES[name])
            b = full.sql(QUERIES[name])
            assert a.equals(b), name
        plan = pruned.plan(QUERIES["q6"])
        scans = [n for n in plan.walk() if isinstance(n, BlockScan)]
        assert scans, "q6 should prune via BlockScan"
        nb = len(next(iter(meta.zone_maps.values()))[0])
        assert len(scans[0].blocks) < nb, "q6 range should drop blocks"
    finally:
        C.ZONE_BLOCK_ROWS = old
