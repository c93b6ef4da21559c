"""Native .tbl parser: round-trip generator data through dbgen text format."""

import numpy as np
import pytest

from starrocks_tpu.io import tpch
from starrocks_tpu.io.tbl_loader import load_tpch_dir, parse_tbl, write_tbl


@pytest.fixture(scope="module")
def tbl_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tbl")
    raw = tpch.generate(sf=0.002, seed=99)
    for tname in ("nation", "supplier", "orders", "lineitem"):
        write_tbl(str(d / f"{tname}.tbl"), raw[tname], tpch.SCHEMAS[tname])
    return d, raw


def test_native_parse_roundtrip(tbl_dir):
    d, raw = tbl_dir
    cols = parse_tbl(str(d / "lineitem.tbl"), tpch.SCHEMAS["lineitem"])
    for name, want in raw["lineitem"].items():
        got = cols[name]
        if tpch.SCHEMAS["lineitem"][name].is_string:
            assert list(got[:100]) == list(np.asarray(want, str)[:100]), name
        else:
            np.testing.assert_array_equal(got, want, err_msg=name)


def test_load_dir_to_tables(tbl_dir):
    d, raw = tbl_dir
    tables = load_tpch_dir(str(d))
    assert set(tables) == {"nation", "supplier", "orders", "lineitem"}
    li = tables["lineitem"]
    assert li.nrows == len(raw["lineitem"]["l_orderkey"])
    df = li.to_pandas()
    np.testing.assert_array_equal(df.l_orderkey, raw["lineitem"]["l_orderkey"])
    # decimals decoded to dollars
    np.testing.assert_allclose(
        df.l_extendedprice, raw["lineitem"]["l_extendedprice"] / 100.0)
    # negative decimals (acctbal) round-trip
    s = tables["supplier"].to_pandas()
    np.testing.assert_allclose(s.s_acctbal, raw["supplier"]["s_acctbal"] / 100.0)
