import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops import hash_join as hj


def _cols(t: Table, names):
    return [t[n] for n in names]


def test_unique_build_lookup_inner():
    rng = np.random.default_rng(2)
    nb, np_ = 1000, 5000
    bkeys = rng.permutation(10_000)[:nb].astype(np.int64)
    bvals = rng.integers(0, 100, nb).astype(np.int64)
    pkeys = rng.integers(0, 10_000, np_).astype(np.int64)
    bt_tab = Table.from_pydict({"k": (bkeys, dt.INT64), "v": (bvals, dt.INT64)})
    pt = Table.from_pydict({"k": (pkeys, dt.INT64)})

    @jax.jit
    def run(btab, ptab):
        b = hj.build(_cols(btab, ["k"]), btab.live_mask(), 2048)
        matched, row, _ = hj.lookup(b, _cols(ptab, ["k"]), ptab.live_mask())
        return matched, row, b.dup_count, b.overflow

    matched, row, dups, overflow = run(bt_tab, pt)
    assert not bool(overflow) and int(dups) == 0
    lut = {int(k): int(v) for k, v in zip(bkeys, bvals)}
    got_v = np.asarray(bvals)[np.asarray(row)]
    for i in range(np_):
        k = int(pkeys[i])
        if k in lut:
            assert bool(matched[i]) and got_v[i] == lut[k], i
        else:
            assert not bool(matched[i]), i


def test_multi_key_and_null_keys():
    b = Table.from_pydict({
        "a": (np.array([1, 1, 2], np.int64), dt.INT64),
        "b": (np.array([10, 20, 10], np.int64), dt.INT64),
        "v": (np.array([100, 200, 300], np.int64), dt.INT64),
    })
    pa = Column.from_numpy(np.array([1, 1, 2, 9], np.int64), dt.INT64,
                           valid=np.array([True, True, False, True]))
    p = Table(columns={
        "a": pa,
        "b": Column.from_numpy(np.array([20, 10, 10, 10], np.int64), dt.INT64),
    })
    bt = hj.build(_cols(b, ["a", "b"]), b.live_mask(), 16)
    matched, row, _ = hj.lookup(bt, _cols(p, ["a", "b"]), p.live_mask())
    np.testing.assert_array_equal(np.asarray(matched), [True, True, False, False])
    np.testing.assert_array_equal(np.asarray(row)[:2], [1, 0])


def test_duplicate_build_expand():
    # build: key -> multiple rows; probe expands all matches
    bk = np.array([7, 7, 7, 3, 3, 5], np.int64)
    b = Table.from_pydict({"k": (bk, dt.INT64)})
    p = Table.from_pydict({"k": (np.array([7, 3, 5, 9], np.int64), dt.INT64)})

    bt = hj.build(_cols(b, ["k"]), b.live_mask(), 16)
    assert int(bt.dup_count) == 3
    pi, bi, ok, trunc = hj.probe_expand(bt, _cols(p, ["k"]), p.live_mask(), fanout_cap=4)
    assert not bool(trunc)
    pairs = sorted(
        (int(a), int(c)) for a, c, v in zip(pi, bi, ok) if bool(v)
    )
    assert pairs == [(0, 0), (0, 1), (0, 2), (1, 3), (1, 4), (2, 5)]
    # truncation flag fires when cap too small
    *_, trunc2 = hj.probe_expand(bt, _cols(p, ["k"]), p.live_mask(), fanout_cap=2)
    assert bool(trunc2)


def test_expand_respects_dead_build_rows():
    bk = np.array([7, 7, 7], np.int64)
    b = Table.from_pydict({"k": (bk, dt.INT64)})
    live = jnp.asarray(np.array([True, False, True]))
    bt = hj.build(_cols(b, ["k"]), live, 8)
    p = Table.from_pydict({"k": (np.array([7], np.int64), dt.INT64)})
    pi, bi, ok, trunc = hj.probe_expand(bt, _cols(p, ["k"]), p.live_mask(), fanout_cap=4)
    pairs = [(int(a), int(c)) for a, c, v in zip(pi, bi, ok) if bool(v)]
    assert pairs == [(0, 0), (0, 2)]
