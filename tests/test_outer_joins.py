"""Right/full-outer, right-semi/anti, and null-aware anti joins vs pandas.

Covers the remaining StarRocks join types (be/src/exec/hash_joiner.h TJoinOp
set) through the plan-level HashJoin on both the unique-build lookup path and
the duplicate-key expansion path.
"""

import numpy as np
import pandas as pd
import pytest

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.exec.plan import HashJoin, Scan, execute


def _mk_tables(dup_build: bool, seed=7):
    rng = np.random.default_rng(seed)
    nb, np_ = 40, 100
    if dup_build:
        bkeys = rng.integers(0, 20, nb).astype(np.int64)
    else:
        bkeys = rng.permutation(200)[:nb].astype(np.int64)
    bvals = rng.integers(0, 1000, nb).astype(np.int64)
    pkeys = rng.integers(0, 60, np_).astype(np.int64)
    pvals = rng.integers(0, 1000, np_).astype(np.int64)
    build = Table.from_pydict({"k": (bkeys, dt.INT64), "bv": (bvals, dt.INT64)})
    probe = Table.from_pydict({"pk": (pkeys, dt.INT64), "pv": (pvals, dt.INT64)})
    bdf = pd.DataFrame({"k": bkeys, "bv": bvals})
    pdf = pd.DataFrame({"pk": pkeys, "pv": pvals})
    return {"build": build, "probe": probe}, bdf, pdf


def _run(tables, join_type, unique, build_cols=("bv",)):
    plan = HashJoin(
        probe=Scan("probe"), build=Scan("build"),
        left_keys=("pk",), right_keys=("k",),
        join_type=join_type, build_cols=build_cols,
        capacity=256, unique=unique, fanout=8)
    return execute(plan, tables).to_pandas()


def _canon(df, cols):
    out = df[list(cols)].copy()
    for c in out.columns:
        out[c] = out[c].map(lambda v: -10**9 if v is None or
                            (isinstance(v, float) and np.isnan(v)) else int(v))
    return out.sort_values(list(cols), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("dup", [False, True])
def test_right_outer(dup):
    tables, bdf, pdf = _mk_tables(dup)
    got = _run(tables, "right_outer", unique=not dup)
    want = pdf.merge(bdf, left_on="pk", right_on="k", how="right")
    want = want[["pk", "pv", "bv"]]
    pd.testing.assert_frame_equal(
        _canon(got, ("pk", "pv", "bv")), _canon(want, ("pk", "pv", "bv")))


@pytest.mark.parametrize("dup", [False, True])
def test_full_outer(dup):
    tables, bdf, pdf = _mk_tables(dup)
    got = _run(tables, "full_outer", unique=not dup)
    want = pdf.merge(bdf, left_on="pk", right_on="k", how="outer")
    want = want[["pk", "pv", "bv"]]
    pd.testing.assert_frame_equal(
        _canon(got, ("pk", "pv", "bv")), _canon(want, ("pk", "pv", "bv")))


@pytest.mark.parametrize("dup", [False, True])
def test_right_semi_anti(dup):
    tables, bdf, pdf = _mk_tables(dup)
    semi = _run(tables, "right_semi", unique=not dup, build_cols=())
    anti = _run(tables, "right_anti", unique=not dup, build_cols=())
    in_probe = bdf.k.isin(pdf.pk)
    pd.testing.assert_frame_equal(
        _canon(semi, ("k", "bv")), _canon(bdf[in_probe], ("k", "bv")))
    pd.testing.assert_frame_equal(
        _canon(anti, ("k", "bv")), _canon(bdf[~in_probe], ("k", "bv")))


def test_sql_right_and_full_join():
    from starrocks_tpu.exec.session import Session

    tables, bdf, pdf = _mk_tables(dup_build=True)
    s = Session(tables)
    got = s.sql("select pk, pv, bv from probe right join build on pk = k")
    want = pdf.merge(bdf, left_on="pk", right_on="k", how="right")
    pd.testing.assert_frame_equal(
        _canon(got, ("pk", "pv", "bv")), _canon(want, ("pk", "pv", "bv")))

    got = s.sql("select pk, pv, bv from probe full outer join build on pk = k")
    want = pdf.merge(bdf, left_on="pk", right_on="k", how="outer")
    pd.testing.assert_frame_equal(
        _canon(got, ("pk", "pv", "bv")), _canon(want, ("pk", "pv", "bv")))


def test_null_aware_anti_not_in():
    # probe NOT IN build; build contains no NULLs -> plain anti minus
    # NULL-key probe rows
    pk = Column.from_numpy(np.array([1, 2, 3, 4], np.int64), dt.INT64,
                           valid=np.array([True, True, False, True]))
    probe = Table(columns={"pk": pk})
    build = Table.from_pydict({"k": (np.array([2, 9], np.int64), dt.INT64)})
    tables = {"probe": probe, "build": build}
    got = _run(tables, "null_aware_anti", unique=True, build_cols=())
    assert sorted(got.pk.tolist()) == [1, 4]

    # build contains a NULL key -> empty result (x NOT IN (..., NULL) is
    # never TRUE)
    bk = Column.from_numpy(np.array([2, 0], np.int64), dt.INT64,
                           valid=np.array([True, False]))
    tables = {"probe": probe, "build": Table(columns={"k": bk})}
    got = _run(tables, "null_aware_anti", unique=True, build_cols=())
    assert len(got) == 0

    # empty build set -> everything passes, even NULL probe keys
    import jax.numpy as jnp
    empty = Table(columns={"k": Column.from_numpy(
        np.array([2], np.int64), dt.INT64)}, live=jnp.asarray([False]))
    tables = {"probe": probe, "build": empty}
    got = _run(tables, "null_aware_anti", unique=True, build_cols=())
    assert len(got) == 4
