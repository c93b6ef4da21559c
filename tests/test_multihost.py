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


def test_run_with_recovery_fails_over_to_smaller_mesh():
    """The fail-retry harness: execution on the primary mesh dies (lost
    device), the SAME query re-places and reruns on the surviving mesh,
    exact result."""
    import jax
    import numpy as np
    import pandas as pd
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.plan import Aggregate, Filter, Scan
    from starrocks_tpu.exprs.expr import col, lift as lit
    from starrocks_tpu.ops.hash_agg import AggSpec
    from starrocks_tpu.parallel import dist as D
    from starrocks_tpu.parallel import multihost as MH

    n = 2000
    t = Table(columns={
        "k": Column.from_numpy(np.arange(n, dtype=np.int64), dt.INT64)})
    meshes = [D.make_mesh(8), D.make_mesh(4)]
    attempts = []

    def flaky_execute(plan, dtabs, mesh):
        attempts.append(mesh.devices.size)
        if len(attempts) == 1:
            raise jax.errors.JaxRuntimeError(
                "simulated device loss on the 8-chip mesh")
        return D.dist_execute(plan, dtabs, mesh)

    def build_plan():
        return Aggregate(Filter(Scan("t"), col("k") < lit(500)), (),
                         (AggSpec("sum", "k", "s"),
                          AggSpec("count", "k", "c")))

    out = MH.run_with_recovery(build_plan, {"t": t}, {"t": ("k",)}, meshes,
                               execute=flaky_execute)
    df = out.to_pandas()
    assert attempts == [8, 4]
    assert df.s[0] == sum(range(500)) and df.c[0] == 500


def test_run_with_recovery_exhausted_raises():
    import numpy as np
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.plan import Scan
    from starrocks_tpu.parallel import dist as D
    from starrocks_tpu.parallel import multihost as MH

    t = Table(columns={"k": Column.from_numpy(np.arange(10), dt.INT64)})

    import jax

    def always_fail(plan, dtabs, mesh):
        raise jax.errors.JaxRuntimeError("down")

    with pytest.raises(RuntimeError, match="every mesh"):
        MH.run_with_recovery(lambda: Scan("t"), {"t": t}, {"t": ("k",)},
                             [D.make_mesh(2)], execute=always_fail)


def test_run_with_recovery_reraises_deterministic_errors():
    """Planner/value errors must NOT be retried on smaller meshes (r3
    advisor: blanket retry buried root causes under 'failed on every
    mesh')."""
    import numpy as np
    from starrocks_tpu.column import dtypes as dt
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.exec.plan import Scan
    from starrocks_tpu.parallel import dist as D
    from starrocks_tpu.parallel import multihost as MH

    t = Table(columns={"k": Column.from_numpy(np.arange(10), dt.INT64)})
    attempts = []

    def planner_bug(plan, dtabs, mesh):
        attempts.append(mesh.devices.size)
        raise ValueError("unsupported shape in planner")

    with pytest.raises(ValueError, match="unsupported shape"):
        MH.run_with_recovery(lambda: Scan("t"), {"t": t}, {"t": ("k",)},
                             [D.make_mesh(4), D.make_mesh(2)],
                             execute=planner_bug)
    assert attempts == [4]      # no second-mesh retry
