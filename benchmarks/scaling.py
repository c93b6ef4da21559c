"""Scaling-efficiency harness (north star: >=80% rows/s efficiency 1 -> N).

Runs a scan-heavy distributed query (Q6 filter+global-agg over lineitem) on
meshes of growing size within one process and reports rows/s + efficiency
relative to the 1-device run. On a real pod slice, run via
scripts/multihost_worker.py on every host and pass --num-processes; the
measurement logic is identical because the SPMD program is mesh-agnostic.

CPU mode (no hardware): JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchmarks/scaling.py
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import starrocks_tpu  # noqa: F401  (x64 + cache config)
    import jax

    sf = float(os.environ.get("SCALE_SF", "0.1"))
    trials = int(os.environ.get("SCALE_TRIALS", "3"))

    from starrocks_tpu.exec import tpch_plans
    from starrocks_tpu.io import tpch
    from starrocks_tpu.parallel import dist as D

    raw = tpch.generate(sf=sf)
    tables = tpch.to_tables(raw)
    n_li = tables["lineitem"].nrows
    ndev_all = len(jax.devices())
    sizes = sorted({1, 2, ndev_all // 2, ndev_all} - {0})

    results = {}
    for nd in sizes:
        if nd < 1 or nd > ndev_all:
            continue
        mesh = D.make_mesh(nd)
        dtabs = D.place_tables(tables, mesh, D.TPCH_PARTITIONING)
        plan = tpch_plans.build("q6", sf)
        D.dist_execute(plan, dtabs, mesh)      # compile + converge
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            D.dist_execute(plan, dtabs, mesh).to_pandas()
            best = min(best, time.perf_counter() - t0)
        results[nd] = n_li / best
        print(f"# ndev={nd}: {results[nd]/1e6:.1f} M rows/s", flush=True)

    base = results[min(results)]
    eff = {nd: r / (base * nd / min(results)) for nd, r in results.items()}
    print(json.dumps({
        "metric": "q6_scaling_efficiency",
        "value": round(min(eff[nd] for nd in eff if nd == max(eff)), 3)
        if eff else None,
        "unit": "fraction",
        "rows_per_s": {str(k): round(v) for k, v in results.items()},
        "efficiency": {str(k): round(v, 3) for k, v in eff.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
