"""fast_sort: tiled sort + merge-path rounds vs numpy oracles.

Mirrors the reference's sorting unit tests (be/test/exec/sorting_test.cpp,
chunks_sorter_test.cpp) for the packed TPU sort engine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column
from starrocks_tpu.ops import fast_sort as fs


@pytest.mark.parametrize("n", [1, 5, 8192, 8193, 40_000, 300_000])
def test_sort_packed(n):
    rng = np.random.default_rng(n)
    v = rng.integers(0, 1 << 62, n, dtype=np.uint64)
    got = np.asarray(jax.jit(fs.sort_packed)(jnp.asarray(v)))
    assert (got == np.sort(v)).all()


def test_sort_packed_duplicand_sentinel_safety():
    # values just below the sentinel boundary, with duplicates of the max
    v = np.array([(1 << 62) + 1, 3, (1 << 62) + 1, 0], np.uint64)
    # duplicates are allowed to land in any order; sorted multiset must match
    got = np.asarray(fs.sort_packed(jnp.asarray(v)))
    assert (got == np.sort(v)).all()


def test_argsort_packed_stability():
    rng = np.random.default_rng(0)
    n = 100_000
    codes = rng.integers(0, 50, n, dtype=np.uint64)
    perm = np.asarray(jax.jit(lambda c: fs.argsort_packed(c, 6))(jnp.asarray(codes)))
    assert (perm == np.argsort(codes, kind="stable")).all()


def test_stable_argsort_multikey_and_wide():
    rng = np.random.default_rng(1)
    n = 60_000
    f = rng.standard_normal(n)                      # 64-bit key -> 2 passes
    g = rng.integers(0, 9, n, dtype=np.uint64)      # narrow key
    col = Column.from_numpy(f, dt.FLOAT64)
    keys = [(jnp.asarray(g), 4)] + fs.normalize_keys(col)
    perm = np.asarray(jax.jit(lambda: fs.stable_argsort(keys, n))())
    want = np.lexsort((np.arange(n), f, g))
    assert (perm == want).all()


def test_normalize_keys_desc_nulls():
    rng = np.random.default_rng(2)
    n = 20_000
    valid = rng.random(n) > 0.3
    iv = rng.integers(-500, 500, n)
    col = Column.from_numpy(iv, dt.INT64, valid=valid)
    # DESC, NULLS LAST
    keys = fs.normalize_keys(col, asc=False, nulls_first=False)
    perm = np.asarray(jax.jit(lambda: fs.stable_argsort(keys, n))())
    want = np.lexsort((np.arange(n), np.where(valid, -iv, 0), ~valid * 1))
    assert (perm == want).all()
    # ASC, NULLS FIRST
    keys = fs.normalize_keys(col, asc=True, nulls_first=True)
    perm = np.asarray(jax.jit(lambda: fs.stable_argsort(keys, n))())
    want = np.lexsort((np.arange(n), np.where(valid, iv, 0), valid * 1))
    assert (perm == want).all()


def test_normalize_keys_float_total_order():
    v = np.array([np.inf, -np.inf, 0.0, -0.0, 1.5, -2.5, 3e300, -3e300])
    col = Column.from_numpy(v, dt.FLOAT64)
    (codes, nbits), = fs.normalize_keys(col)
    assert nbits == 64
    order = np.argsort(np.asarray(codes), kind="stable")
    assert (v[order] == np.sort(v)).all()
