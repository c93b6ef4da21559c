"""Multi-host worker: one process per host (the BE-process analog).

Real TPU pod-slice launch (run on EVERY host, e.g. via gcloud ssh --worker=all):
    python scripts/multihost_worker.py --coordinator host0:8476 \
        --num-processes N --process-id $HOST_INDEX --sf 1.0 --query q3
On TPU VMs, jax.distributed discovers local devices automatically; the SPMD
query program is identical for any host count (parallel/multihost.py).

PseudoCluster mode (tests/test_multihost.py): each process forces CPU with
4 virtual devices, so 2 processes form an 8-device global mesh — the
process-level analog of the reference's in-JVM PseudoCluster
(fe/fe-core/src/test/java/com/starrocks/pseudocluster/PseudoCluster.java).
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--sf", type=float, default=0.005)
    ap.add_argument("--query", default="q3")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force CPU with N virtual devices (PseudoCluster)")
    ap.add_argument("--out", default="", help="write result rows (json) here")
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu_devices}")
        os.environ["STARROCKS_TPU_COMPILE_CACHE"] = "0"
    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    # initialize BEFORE importing engine modules (module-level device
    # constants would initialise the XLA backend single-process)
    jax.distributed.initialize(args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    from starrocks_tpu.parallel import multihost as MH
    from starrocks_tpu.exec import tpch_plans
    from starrocks_tpu.io import tpch
    from starrocks_tpu.parallel import dist as D

    mesh = MH.global_mesh()
    # deterministic generation: every host derives the same tables, the
    # callback materializes only this host's shards
    raw = tpch.generate(sf=args.sf)
    tables = tpch.to_tables(raw)
    dtabs = MH.place_tables_global(tables, mesh, D.TPCH_PARTITIONING)
    plan = tpch_plans.build(args.query, args.sf)
    out = MH.dist_execute(plan, dtabs, mesh)
    df = out.to_pandas()
    print(f"proc {args.process_id}: {args.query} -> {len(df)} rows", flush=True)
    if args.out and args.process_id == 0:
        with open(args.out, "w") as f:
            json.dump(df.astype(object).where(df.notna(), None)
                      .to_dict(orient="list"), f, default=str)


if __name__ == "__main__":
    main()
