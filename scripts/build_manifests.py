"""Build benchmarks/converged/*.json capacity manifests on the real chip.

Run from the repo root on TPU hardware:

    python scripts/build_manifests.py tpch 1.0
    python scripts/build_manifests.py ssb 1.0
    python scripts/build_manifests.py tpcds 0.1

For each suite query: seed from the existing manifest entry when present,
run until the packed frozen module is compiled (populating the persistent
XLA compile cache), export the converged capacities + result bound, and
save the manifest after EVERY query — the build is restartable, and a
subsequent `bench.py` run starts every query on the packed warm path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    converge_only = "--converge-only" in sys.argv
    if "--cpu" in sys.argv:
        # capacity convergence is DATA-dependent, not backend-dependent:
        # converge cheaply on CPU (fast local compiles), ship the manifest,
        # and pay the TPU only for the packed-module compile it actually
        # needs. (The axon sitecustomize pins JAX_PLATFORMS; override
        # programmatically before first backend use.)
        import jax
        jax.config.update("jax_platforms", "cpu")
    suite = args[0] if len(args) > 0 else "tpch"
    sf = float(args[1]) if len(args) > 1 else 1.0
    only = args[2].split(",") if len(args) > 2 else None

    from starrocks_tpu.config import set_config
    from starrocks_tpu.exec import plan as P
    from starrocks_tpu.exec.session import Session
    set_config(enable_result_cache=False)

    t0 = time.time()
    if suite == "tpch":
        from starrocks_tpu.io import tpch
        from starrocks_tpu.sql.tpch_sql import QUERIES
        tables = tpch.to_tables(tpch.generate(sf=sf))
        order = [f"q{i}" for i in range(1, 23)]
    elif suite == "ssb":
        from starrocks_tpu.io import ssb
        from starrocks_tpu.sql.ssb_sql import QUERIES
        tables = {"lineorder_flat": ssb.to_table(ssb.generate_flat(sf=sf))}
        order = list(QUERIES)
    else:
        from starrocks_tpu.io import tpcds
        from starrocks_tpu.sql.tpcds_sql import QUERIES
        tables = tpcds.to_tables(tpcds.generate(sf=sf))
        order = sorted(QUERIES, key=lambda s: (int(s[1:].rstrip("b")), s))
    print(f"# {suite} sf={sf} generated in {time.time()-t0:.0f}s", flush=True)

    label = f"{suite}_sf{sf}"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "converged",
        f"{label}.json")
    manifest = {}
    if os.path.exists(path):
        with open(path) as f:
            manifest = json.load(f)

    session = Session(tables)
    for name in (only or order):
        sql = QUERIES[name]
        try:
            plan = session.plan(sql)
            seeded = P.import_converged(plan, manifest.get(name))
            t1 = time.time()
            session.sql(sql)            # converge (or packed via manifest)
            c1 = time.time() - t1
            c2 = c3 = 0.0
            if not converge_only:
                t1 = time.time()
                session.sql(sql)        # packed compile (or warm)
                c2 = time.time() - t1
                t1 = time.time()
                session.sql(sql)        # warm
                c3 = time.time() - t1
            exp = P.export_converged(plan)
            status = "ok"
            if exp is not None and manifest.get(name) != exp:
                manifest[name] = exp
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "w") as f:
                    json.dump(manifest, f, sort_keys=True)
                status = "saved"
            print(f"# {label} {name}: run1 {c1:.1f}s run2 {c2:.1f}s "
                  f"warm {c3*1e3:.0f}ms seeded={seeded} "
                  f"packed={bool(plan.__dict__.get('_frozen_packed'))} "
                  f"{status}", flush=True)
        except Exception as e:
            print(f"# {label} {name} FAILED: {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)
        if "--cpu" in sys.argv:
            # XLA:CPU accumulates LLVM compile state across a suite of
            # eager convergences until allocation fails; converged sizes
            # are already exported, so compiled modules are disposable
            import gc
            import jax
            jax.clear_caches()
            gc.collect()


if __name__ == "__main__":
    main()
