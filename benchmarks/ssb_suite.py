"""SSB-Flat 13-query suite timing on the real chip.

Reference headline: SSB-Flat 100G total = 992 ms on 3 BE x 16 cores
(docs/en/benchmarking/SSB_Benchmarking.md:9-12). Timing mirrors
benchmarks/tpch_suite.py: best-of-N wall time per query ending in result
extraction, minus the measured relay round-trip.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    import starrocks_tpu  # noqa: F401
    from starrocks_tpu.config import set_config
    set_config(enable_result_cache=False)   # time executions, not cache hits
    import jax
    import jax.numpy as jnp

    sf = float(os.environ.get("SUITE_SF", "1.0"))
    trials = int(os.environ.get("SUITE_TRIALS", "3"))

    from starrocks_tpu.io import ssb
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.sql.ssb_sql import QUERIES

    t0 = time.time()
    raw = ssb.generate_flat(sf=sf)
    print(f"# generated sf={sf} ({len(raw['lo_orderkey'])} rows) in {time.time()-t0:.1f}s",
          flush=True)
    t0 = time.time()
    table = ssb.to_table(raw)
    jax.block_until_ready([c.data for c in table.columns.values()])
    print(f"# uploaded in {time.time()-t0:.1f}s", flush=True)

    session = Session({"lineorder_flat": table})

    x = jnp.zeros((8,), jnp.int32)
    nop = jax.jit(lambda a: jnp.sum(a))
    float(nop(x))
    base = min(_timed(lambda: float(nop(x))) for _ in range(5))
    print(f"# relay round-trip {base*1e3:.1f}ms", flush=True)

    total = 0.0
    for name, sql in QUERIES.items():
        t0 = time.time()
        df = session.sql(sql)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(trials):
            best = min(best, _timed(lambda: session.sql(sql)))
        ms = max(best - base, 0.0) * 1e3
        total += ms
        print(f"{name}: {ms:8.1f} ms   (compile {compile_s:.1f}s, rows {len(df)})",
              flush=True)
    print(f"# total: {total:.0f} ms for 13 queries at SF{sf}", flush=True)
    print(json.dumps({"metric": f"ssb_flat_sf{sf}_suite_total",
                      "value": round(total), "unit": "ms"}), flush=True)


if __name__ == "__main__":
    main()
