"""Per-kernel microbenchmarks on the real chip.

Mirrors the reference's microbench suite (be/src/bench: chunks_sorter_bench,
hash_functions_bench, shuffle_chunk_bench, filter_data_bench) as rows/s
numbers per operator class.

Timing: the axon relay's block_until_ready does not wait and a readback costs
~30ms, so each kernel runs K iterations inside one jit via lax.scan with a
carry-dependent salt (prevents loop-invariant hoisting); rows/s is derived
from T(1+K) - T(1).
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_scan(fn, args, kiter=16, trials=3):
    """fn(salt:int64 scalar, *args) -> scalar. Returns secs per iteration."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make(k):
        @jax.jit
        def run(*a):
            def step(carry, _):
                return fn(carry & 1, *a).astype(jnp.int64), None
            out, _ = lax.scan(step, jnp.int64(0), None, length=k)
            return out
        return run

    f1, fk = make(1), make(1 + kiter)
    float(f1(*args)); float(fk(*args))
    def timed(f):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best
    return max((timed(fk) - timed(f1)) / kiter, 1e-9)


def main():
    import starrocks_tpu  # noqa: F401  (enables x64 before backend use)
    import jax
    import jax.numpy as jnp

    n = int(float(os.environ.get("KBENCH_ROWS", "6e6")))
    rng = np.random.default_rng(0)
    results = {}

    def report(name, rows_per_s):
        results[name] = rows_per_s
        print(json.dumps({"metric": name, "value": round(rows_per_s),
                          "unit": "rows/s"}), flush=True)

    ship = jnp.asarray(rng.integers(8000, 10500, n).astype(np.int32))
    qty = jnp.asarray(rng.integers(100, 5100, n).astype(np.int64))
    price = jnp.asarray(rng.integers(90000, 2100000, n).astype(np.int64))
    disc = jnp.asarray(rng.integers(0, 11, n).astype(np.int64))

    # 1. filter+agg (Q6 class, HBM bound)
    def filt(salt, ship, qty, price, disc):
        m = (ship >= 8766 + salt) & (ship < 9131 + salt) & (disc >= 5) & (qty < 2400 + salt)
        return jnp.sum(jnp.where(m, price * disc, 0))
    dt = bench_scan(filt, (ship, qty, price, disc))
    report("filter_agg_rows_per_s", n / dt)

    # 2. low-cardinality group-by (Q1 class: 8 groups)
    from starrocks_tpu.column import dtypes as dtp
    from starrocks_tpu.column.column import Column, Table
    from starrocks_tpu.ops.hash_agg import AggSpec, groupby, sorted_groupby

    k8 = jnp.asarray(rng.integers(0, 8, n).astype(np.int64))
    def agg_low(salt, keys, vals):
        t = Table(columns={
            "k": Column(keys + salt, None, dtp.INT64),
            "v": Column(vals, None, dtp.INT64),
        })
        out = groupby(t, ("k",), (AggSpec("sum", "v", "s"),))
        return jnp.sum(out["s"].data)
    dt = bench_scan(agg_low, (k8, price))
    report("hash_agg_8groups_rows_per_s", n / dt)

    # 3. high-cardinality group-by (1M groups)
    km = jnp.asarray(rng.integers(0, 1_000_000, n).astype(np.int64))
    def agg_high(salt, keys, vals):
        t = Table(columns={
            "k": Column(keys + salt, None, dtp.INT64),
            "v": Column(vals, None, dtp.INT64),
        })
        out = sorted_groupby(t, ("k",), (AggSpec("sum", "v", "s"),))
        return jnp.sum(out["s"].data)
    try:
        dt = bench_scan(agg_high, (km, price), kiter=4)
        report("hash_agg_1m_groups_rows_per_s", n / dt)
    except Exception as e:
        print(json.dumps({"metric": "hash_agg_1m_groups_rows_per_s",
                          "error": str(e)[:120]}), flush=True)

    # 4. hash join build+probe (1.5M unique build keys, n probes)
    from starrocks_tpu.ops import hash_join as hj
    nb = 1_500_000
    bkeys = jnp.asarray(rng.permutation(4 * nb)[:nb].astype(np.int64))
    pkeys = jnp.asarray(rng.integers(0, 4 * nb, n).astype(np.int64))
    ones = jnp.ones((nb,), bool)
    pones = jnp.ones((n,), bool)
    def join(salt, bk, pk):
        bcol = [Column(bk + salt, None, dtp.INT64)]
        pcol = [Column(pk + salt, None, dtp.INT64)]
        bt = hj.build(bcol, ones, 1 << 22)
        matched, row, _ovf = hj.lookup(bt, pcol, pones)
        return jnp.sum(matched.astype(jnp.int64)) + jnp.sum(row.astype(jnp.int64))
    try:
        dt = bench_scan(join, (bkeys, pkeys), kiter=4)
        report("hash_join_build1.5m_probe_rows_per_s", n / dt)
    except Exception as e:
        print(json.dumps({"metric": "hash_join_build1.5m_probe_rows_per_s",
                          "error": str(e)[:120]}), flush=True)

    # 5. sort (key-normalized argsort, 6M rows)
    def srt(salt, keys):
        perm = jnp.argsort(keys ^ salt, stable=True)
        return keys[perm[0]] + keys[perm[-1]]
    dt = bench_scan(srt, (km,), kiter=4)
    report("sort_rows_per_s", n / dt)


if __name__ == "__main__":
    main()
