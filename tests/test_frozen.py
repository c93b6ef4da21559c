"""Whole-query frozen execution (exec.plan.execute warm path).

The reference runs a fragment as one pipeline-driver hot loop
(be/src/exec/pipeline/pipeline_driver.cpp:246-360); here the converged plan
re-executes as ONE jitted module. These tests pin: (a) the frozen run
produces the same rows as the eager run, (b) the frozen path actually
engages, (c) a frozen-size overflow (data grew under a cached capacity)
falls back to eager refitting and still returns correct rows, (d)
non-traceable plans (GroupConcat) stay on the eager path.
"""

import pytest

from starrocks_tpu.config import set_config
from starrocks_tpu.exec import plan as P
from starrocks_tpu.exec import tpch_plans
from starrocks_tpu.exec.session import Session
from starrocks_tpu.golden import tpch_queries as golden
from starrocks_tpu.io import tpch

from tests.test_tpch_suite import assert_rows_equal


@pytest.mark.parametrize("q", ["q1", "q3", "q13", "q17"])
def test_frozen_matches_eager(tpch_tables, q):
    plan = tpch_plans.build(q, 0.01)
    cold = P.execute(plan, tpch_tables).to_pandas()
    assert getattr(plan, "_converged", False)
    warm = P.execute(plan, tpch_tables).to_pandas()
    assert plan.__dict__.get("_frozen_jits"), \
        "second run should have taken the whole-query frozen path"
    assert_rows_equal(warm, cold)
    # third run reuses the compiled frozen module
    assert_rows_equal(P.execute(plan, tpch_tables).to_pandas(), cold)


def test_frozen_overflow_falls_back(tpch_tables):
    # converge on small data, then run the SAME plan on 4x data: frozen
    # capacities overflow, flags fire, and the eager refit still answers
    plan = tpch_plans.build("q3", 0.01)
    P.execute(plan, tpch_tables)
    P.execute(plan, tpch_tables)
    assert plan.__dict__.get("_frozen_jits")
    big_raw = tpch.generate(sf=0.04, seed=4)
    big = tpch.to_tables(big_raw)
    out = P.execute(plan, big).to_pandas()
    assert_rows_equal(out, golden.run("q3", tpch.to_pandas(big_raw)))


def test_frozen_disabled_config(tpch_tables):
    set_config(enable_whole_query_jit=False)
    try:
        plan = tpch_plans.build("q6", 0.01)
        P.execute(plan, tpch_tables)
        P.execute(plan, tpch_tables)
        assert not plan.__dict__.get("_frozen_jits")
    finally:
        set_config(enable_whole_query_jit=True)


def test_group_concat_stays_eager(tpch_tables):
    sess = Session(dict(tpch_tables))
    set_config(enable_result_cache=False)
    try:
        sql = ("select l_linestatus, group_concat(l_returnflag) gc "
               "from lineitem where l_orderkey < 10 "
               "group by l_linestatus order by l_linestatus")
        a = sess.sql(sql)
        b = sess.sql(sql)
        assert (a["gc"] == b["gc"]).all()
    finally:
        set_config(enable_result_cache=True)


def test_converged_manifest_roundtrip(tpch_tables):
    """export_converged/import_converged: a fresh plan seeded from a prior
    process's manifest runs the frozen whole-query module on its FIRST
    execution (the bench's cold-cost eliminator), with identical rows."""
    import json

    donor = tpch_plans.build("q3", 0.01)
    want = P.execute(donor, tpch_tables).to_pandas()
    manifest = json.loads(json.dumps(P.export_converged(donor)))  # disk trip
    assert manifest and manifest["caps"]

    fresh = tpch_plans.build("q3", 0.01)   # new node_ids (new process analog)
    assert P.import_converged(fresh, manifest)
    got = P.execute(fresh, tpch_tables).to_pandas()
    assert fresh.__dict__.get("_frozen_jits"), \
        "manifest-seeded first run should take the frozen path"
    assert_rows_equal(got, want)

    # signature mismatch -> manifest rejected, eager convergence still works
    other = tpch_plans.build("q6", 0.01)
    assert not P.import_converged(other, manifest)
    assert not getattr(other, "_converged", False)


def test_manifest_stale_sizes_fall_back(tpch_tables):
    """A manifest whose sizes are too small for the data trips the frozen
    flags and the query refits eagerly — graceful, exact."""
    donor = tpch_plans.build("q3", 0.01)
    want = P.execute(donor, tpch_tables).to_pandas()
    manifest = P.export_converged(donor)
    shrunk = {"sig": manifest["sig"],
              "caps": [[i, s, max(16, v // 64)] for i, s, v in manifest["caps"]]}
    fresh = tpch_plans.build("q3", 0.01)
    assert P.import_converged(fresh, shrunk)
    got = P.execute(fresh, tpch_tables).to_pandas()
    assert_rows_equal(got, want)


def test_execute_df_packed_single_readback(tpch_tables, tpch_frames):
    """execute_df: discovery run records the result bound, then the packed
    frozen module (query + extraction in one program) serves warm runs —
    rows exactly equal to the plain path and to goldens."""
    plan = tpch_plans.build("q3", 0.01)
    d1 = P.execute_df(plan, tpch_tables)            # discovery (eager)
    assert getattr(plan, "_result_m", None)
    d2 = P.execute_df(plan, tpch_tables)            # packed frozen
    assert plan.__dict__.get("_frozen_packed"), \
        "second run should have compiled the packed frozen module"
    d3 = P.execute_df(plan, tpch_tables)            # packed, cached
    want = golden.run("q3", tpch_frames)
    for got in (d1, d2, d3):
        got = got.copy()
        got.columns = list(want.columns)
        assert_rows_equal(got, want)


def test_execute_df_bound_growth(tpch_tables):
    """If the result outgrows the packed bound, the run stays exact and the
    bound grows for the next execution."""
    plan = tpch_plans.build("q3", 0.01)
    P.execute_df(plan, tpch_tables)
    plan._result_m = 16                  # force an undersized bound
    plan._frozen_packed = {}
    d = P.execute_df(plan, tpch_tables)
    assert len(d) > 16 or plan._result_m == 16   # grew only if needed
    d2 = P.execute_df(plan, tpch_tables)
    assert d2.shape == d.shape


def test_execute_df_manifest_seeded(tpch_tables):
    """Manifest with result_m: a fresh plan's FIRST execute_df run uses the
    packed frozen module (no eager per-op compiles)."""
    donor = tpch_plans.build("q1", 0.01)
    P.execute_df(donor, tpch_tables)
    want = P.execute_df(donor, tpch_tables)
    manifest = P.export_converged(donor)
    assert manifest.get("result_m")
    fresh = tpch_plans.build("q1", 0.01)
    assert P.import_converged(fresh, manifest)
    got = P.execute_df(fresh, tpch_tables)
    assert fresh.__dict__.get("_frozen_packed"), \
        "seeded first run should be packed-frozen"
    assert not fresh.__dict__.get("_op_jits", {})
    assert_rows_equal(got, want)
