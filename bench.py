"""Benchmark: TPC-H operator throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: lineitem rows/s through the Q6 filter+aggregate pipeline (scan-class,
HBM-bandwidth-bound) at SF ~= BENCH_SF (default 1.0 -> ~6M rows).

Timing methodology: the axon relay's block_until_ready does not actually wait
and a device->host readback costs ~30ms of relay latency, so the kernel is
iterated K times inside one jit (a lax.scan whose predicate threshold depends
on the carry, preventing loop-invariant hoisting); throughput is derived from
the time difference between K=1+KITER and K=1 runs, each ended by a scalar
readback.

Baseline anchor (BASELINE.md): StarRocks TPC-H SF100 Q6 = 600M rows in 56 ms
on 48 cores ~= 223 M rows/s/core. vs_baseline = ours_per_chip / that.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    sf = float(os.environ.get("BENCH_SF", "1.0"))
    kiter = int(os.environ.get("BENCH_ITERS", "32"))
    trials = int(os.environ.get("BENCH_TRIALS", "3"))

    from starrocks_tpu.io import tpch
    from starrocks_tpu.column.column import Column, Table

    raw = tpch.generate(sf=sf)
    schema = tpch.SCHEMAS["lineitem"]
    cols = ("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
    table = Table(columns={k: Column.from_numpy(raw["lineitem"][k], schema[k])
                           for k in cols})
    n = table.nrows

    d0 = int((np.datetime64("1994-01-01") - np.datetime64("1970-01-01")).astype(int))
    d1 = int((np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int))

    def make(k):
        @jax.jit
        def f(t):
            ship = t["l_shipdate"].data
            disc = t["l_discount"].data
            qty = t["l_quantity"].data
            price = t["l_extendedprice"].data

            def step(carry, _):
                # every operand depends on the carry so NO subexpression is
                # loop-invariant (nothing can be hoisted out of the scan)
                s = carry & 1
                m = ((ship >= d0 + s) & (ship < d1 + s)
                     & (disc >= 5 + s) & (disc <= 7 + s)
                     & (qty < 2400 + s))
                rev = jnp.sum(jnp.where(m, price * (disc + s), 0))
                return rev, None

            out, _ = lax.scan(step, jnp.int64(0), None, length=k)
            return out

        return f

    f1, fk = make(1), make(1 + kiter)
    float(f1(table))   # compile + relay warmup
    float(fk(table))

    def timed(f):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(f(table))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = timed(f1), timed(fk)
    per_iter = max((tk - t1) / kiter, 1e-9)
    rows_per_s = n / per_iter

    baseline_per_core = 223e6  # BASELINE.md derived anchor
    print(json.dumps({
        "metric": "q6_filter_agg_rows_per_s_per_chip",
        "value": round(rows_per_s),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / baseline_per_core, 3),
    }))


if __name__ == "__main__":
    main()
