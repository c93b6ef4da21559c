"""Distributed (8 virtual CPU devices) execution: the PseudoCluster analog.

Runs TPC-H queries SPMD over a shard_map mesh with hash-partitioned tables
and compares against the same pandas goldens as the single-chip suite.
"""

import numpy as np
import pandas as pd
import pytest
import jax

from starrocks_tpu.exec import tpch_plans
from starrocks_tpu.golden import tpch_queries as golden
from starrocks_tpu.parallel import dist as D

from test_tpch_suite import assert_rows_equal

SF = 0.01


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return D.make_mesh(8)


@pytest.fixture(scope="module")
def dist_tables(mesh):
    # build fresh tables (module scope) to place on the mesh
    from starrocks_tpu.io import tpch
    raw = tpch.generate(sf=SF)
    tables = tpch.to_tables(raw)
    frames = tpch.to_pandas(raw)
    return D.place_tables(tables, mesh, D.TPCH_PARTITIONING), frames


def test_shuffle_by_key_roundtrip(mesh):
    """Every row arrives exactly once, and equal keys land on one device."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Table
    from starrocks_tpu.parallel import shuffle as shuf

    rng = np.random.default_rng(7)
    n = 1600
    t = Table.from_pydict({
        "k": (rng.integers(0, 37, n).astype(np.int64), dt.INT64),
        "v": (np.arange(n, dtype=np.int64), dt.INT64),
    })
    pt = D.partition_table(t, None, 8)
    pt = jax.device_put(pt, NamedSharding(mesh, P("d")))

    def body(tab):
        out, overflow = shuf.shuffle_by_key(tab, ("k",), "d", bucket_cap=128)
        # tag each surviving row with its device id
        dev = jax.lax.axis_index("d")
        devcol = jnp.full((out.nrows,), dev, jnp.int64)
        from starrocks_tpu.column.column import Column
        out = out.with_column("dev", Column(devcol, None, dt.INT64))
        return shuf.gather_rows(out, "d"), overflow

    fn = shard_map(body, mesh=mesh, in_specs=(P("d"),), out_specs=(P(), P()),
                   check_vma=False)
    gathered, overflow = jax.jit(fn)(pt)
    assert not bool(np.asarray(overflow).any())
    df = gathered.to_pandas()
    # all n rows exactly once
    assert sorted(df.v) == list(range(n))
    # each key on exactly one device
    per_key_devs = df.groupby("k").dev.nunique()
    assert (per_key_devs == 1).all()


# coverage: local colocate agg (q1 group on lineitem), colocated join +
# reshuffle agg (q3), broadcast joins + semi (q5), global agg (q6),
# left outer + coalesce (q13), distinct two-level (q16), anti join +
# broadcast scalar (q22)
DIST_QUERIES = ["q1", "q3", "q4", "q5", "q6", "q9", "q13", "q14", "q16", "q18", "q22"]


@pytest.mark.parametrize("name", DIST_QUERIES)
def test_distributed_query(name, mesh, dist_tables):
    dtabs, frames = dist_tables
    plan = tpch_plans.build(name, SF)
    got = D.dist_execute(plan, dtabs, mesh).to_pandas()
    want = golden.run(name, frames)
    assert_rows_equal(got, want)
