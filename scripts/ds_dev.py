"""Dev loop: run one or more TPC-DS queries against the SQLite golden.

Usage: python scripts/ds_dev.py q21 q22 ...   (or no args = all QUERIES)
"""
import os
import sys
import traceback

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from starrocks_tpu.exec.session import Session
from starrocks_tpu.golden.sqlite_golden import build_db, run_golden
from starrocks_tpu.io import tpcds
from starrocks_tpu.sql.tpcds_sql import GOLDEN_OVERRIDES, QUERIES

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_tpcds import compare  # noqa: E402

raw = tpcds.generate(sf=0.04)
sess = Session(tpcds.to_tables(raw))
conn = build_db(tpcds.to_pandas(raw))

names = sys.argv[1:] or sorted(QUERIES, key=lambda s: (int(s[1:].rstrip('b')), s))
fails = []
for qi, qname in enumerate(names):
    if qi and qi % 12 == 0:
        # drop accumulated jit executables (mmap sections add up across
        # ~100 queries; the persistent compile cache makes re-jit cheap)
        jax.clear_caches()
    try:
        got = sess.sql(QUERIES[qname])
        want = run_golden(conn, GOLDEN_OVERRIDES.get(qname, QUERIES[qname]))
        compare(got, want, qname)
        print(f"{qname}: OK ({len(want)} rows)")
    except Exception as e:
        fails.append(qname)
        print(f"{qname}: FAIL {type(e).__name__}: {e}")
        if len(names) <= 3:
            traceback.print_exc()
print(f"\n{len(names) - len(fails)}/{len(names)} pass; fails: {fails}")
