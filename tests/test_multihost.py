"""Multi-host PseudoCluster: 2 OS processes x 4 virtual CPU devices form an
8-device global mesh via jax.distributed; a TPC-H query runs SPMD across
them and must match the single-process engine exactly.

The process-level analog of the reference's PseudoCluster multi-BE harness
(fe/fe-core/src/test/java/com/starrocks/pseudocluster/PseudoCluster.java) —
real process boundary, real gloo collectives, no real cluster.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SF = 0.005


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("query", ["q3", "q6"])
def test_two_process_mesh_query(tmp_path, query):
    port = _free_port()
    out_file = tmp_path / "rows.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["STARROCKS_TPU_COMPILE_CACHE"] = "0"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "scripts" / "multihost_worker.py"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--cpu-devices", "4", "--sf", str(SF), "--query", query,
             "--out", str(out_file)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    got = json.loads(out_file.read_text())

    # single-process golden on the same generated data
    from starrocks_tpu.exec import tpch_plans
    from starrocks_tpu.exec.plan import execute
    from starrocks_tpu.io import tpch
    raw = tpch.generate(sf=SF)
    tables = tpch.to_tables(raw)
    want = execute(tpch_plans.build(query, SF), tables).to_pandas()
    assert set(got.keys()) == set(want.columns)
    n = len(next(iter(got.values())))
    assert n == len(want), (n, len(want))
    # compare first sort key column as strings (json round-trips types)
    first = want.columns[0]
    assert [str(x) for x in got[first]] == [str(x) for x in want[first]]
