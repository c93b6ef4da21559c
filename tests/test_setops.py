import numpy as np
import pytest

from starrocks_tpu.exec.session import Session


@pytest.fixture(scope="module")
def session(tpch_tables):
    return Session(tpch_tables)


def test_union_all_and_union(session, tpch_frames):
    got = session.sql("""
        select n_name from nation where n_regionkey = 0
        union all
        select n_name from nation where n_regionkey <= 1
        order by n_name
    """)
    n = tpch_frames["nation"]
    want = sorted(list(n[n.n_regionkey == 0].n_name) + list(n[n.n_regionkey <= 1].n_name))
    assert list(got.n_name) == want

    got = session.sql("""
        select n_regionkey from nation where n_regionkey <= 2
        union
        select n_regionkey from nation where n_regionkey >= 1
        order by n_regionkey
    """)
    assert list(got.n_regionkey) == [0, 1, 2, 3, 4]


def test_intersect_and_except(session, tpch_frames):
    got = session.sql("""
        select n_regionkey from nation where n_regionkey <= 2
        intersect
        select n_regionkey from nation where n_regionkey >= 1
        order by n_regionkey
    """)
    assert list(got.n_regionkey) == [1, 2]

    got = session.sql("""
        select n_regionkey from nation
        except
        select n_regionkey from nation where n_regionkey >= 3
        order by n_regionkey
    """)
    assert list(got.n_regionkey) == [0, 1, 2]


def test_union_strings_different_dicts(session, tpch_frames):
    # r_name and n_name live in different dictionaries; union must remap
    got = session.sql("""
        select r_name as name from region
        union
        select n_name as name from nation where n_regionkey = 3
        order by name
    """)
    n = tpch_frames["nation"]
    want = sorted(set(tpch_frames["region"].r_name) | set(n[n.n_regionkey == 3].n_name))
    assert list(got.name) == want


def test_union_in_derived_table(session):
    got = session.sql("""
        select count(*) as c from (
            select n_nationkey as k from nation
            union all
            select r_regionkey as k from region) t
    """)
    assert int(got.c[0]) == 30
