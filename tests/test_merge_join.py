import numpy as np
import jax
import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops import hash_join as hj
from starrocks_tpu.ops import merge_join as mj


def _mk(keys, valid=None):
    return [Column.from_numpy(np.asarray(keys, np.int64), dt.INT64, valid=valid)]


def test_merge_lookup_matches_hash_lookup():
    rng = np.random.default_rng(9)
    nb, np_ = 4000, 20_000
    bkeys = rng.permutation(50_000)[:nb].astype(np.int64)
    pkeys = rng.integers(0, 50_000, np_).astype(np.int64)
    bl = jnp.asarray(rng.random(nb) < 0.9)
    pl = jnp.asarray(rng.random(np_) < 0.9)

    bcols, pcols = _mk(bkeys), _mk(pkeys)
    m1, r1 = mj.merge_lookup(bcols, bl, pcols, pl)
    bt = hj.build(bcols, bl, 16384)
    m2, r2, _ = hj.lookup(bt, pcols, pl)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    # unique build keys -> matched rows must be identical
    np.testing.assert_array_equal(
        np.asarray(r1)[np.asarray(m1)], np.asarray(r2)[np.asarray(m2)])


def test_merge_lookup_multikey_nulls():
    b = [Column.from_numpy(np.array([1, 1, 2], np.int64), dt.INT64),
         Column.from_numpy(np.array([10, 20, 10], np.int64), dt.INT64,
                           valid=np.array([True, True, False]))]
    p = [Column.from_numpy(np.array([1, 1, 2], np.int64), dt.INT64),
         Column.from_numpy(np.array([20, 10, 10], np.int64), dt.INT64)]
    ones_b = jnp.ones((3,), bool)
    ones_p = jnp.ones((3,), bool)
    m, r = mj.merge_lookup(b, ones_b, p, ones_p)
    # (2,10) must not match the NULL build row
    np.testing.assert_array_equal(np.asarray(m), [True, True, False])
    np.testing.assert_array_equal(np.asarray(r)[:2], [1, 0])


def test_plan_join_uses_merge_for_large_builds(tpch_tables, tpch_frames):
    """A plan-level join above MERGE_THRESHOLD produces identical results."""
    from starrocks_tpu.exec.plan import HashJoin, Scan, execute

    j = HashJoin(Scan("lineitem"), Scan("orders"), ("l_orderkey",),
                 ("o_orderkey",), "inner", ("o_custkey",),
                 capacity=mj.MERGE_THRESHOLD * 2)
    out = execute(j, tpch_tables).to_pandas()
    li, o = tpch_frames["lineitem"], tpch_frames["orders"]
    want = li.merge(o[["o_orderkey", "o_custkey"]], left_on="l_orderkey",
                    right_on="o_orderkey")
    assert len(out) == len(want)
    got = out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    want = want.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    np.testing.assert_array_equal(got.o_custkey, want.o_custkey)
