"""SQLite-backed golden executor for TPC-DS.

The TPC-H/SSB golden executors are hand-written pandas programs
(golden/tpch_queries.py); at 99 queries that approach stops scaling, so the
TPC-DS suite is verified against an independent SQL engine instead — the
same role DuckDB/StarRocks-itself plays for the reference's SQL-tester
(test/README.md "Test Data" section): run the same query text over the same
data and diff rows.

Dialect bridging (our SQL -> SQLite):
- dates are ISO TEXT in SQLite (comparisons/sorts work lexicographically);
  `date 'YYYY-MM-DD'` literals lose the keyword, date +/- interval folds to
  sqlite date() arithmetic
- stddev/variance aggregates are registered as Python aggregate functions
- queries using ROLLUP/GROUPING SETS (SQLite lacks them) register an
  explicit union-of-group-bys golden override next to the query text
"""

from __future__ import annotations

import math
import re
import sqlite3


class _Var:
    """Welford accumulators for the variance/stddev aggregate family."""

    def __init__(self, fn):
        self.fn = fn
        self.n = 0
        self.s1 = 0.0
        self.s2 = 0.0

    def step(self, v):
        if v is None:
            return
        v = float(v)
        self.n += 1
        self.s1 += v
        self.s2 += v * v

    def finalize(self):
        if self.n == 0:
            return None
        m2 = max(self.s2 - self.s1 * self.s1 / self.n, 0.0)
        if self.fn.endswith("_samp"):
            if self.n < 2:
                return None
            var = m2 / (self.n - 1)
        else:
            var = m2 / self.n
        return math.sqrt(var) if self.fn.startswith("stddev") else var


def _make_var(fn):
    class V(_Var):
        def __init__(self):
            super().__init__(fn)
    return V


def build_db(frames: dict) -> sqlite3.Connection:
    """Load pandas frames (from io/tpcds.to_pandas) into in-memory SQLite."""
    conn = sqlite3.connect(":memory:")
    for fn in ("stddev_samp", "stddev_pop", "var_samp", "var_pop"):
        conn.create_aggregate(fn, 1, _make_var(fn))
    conn.create_aggregate("stddev", 1, _make_var("stddev_pop"))
    conn.create_aggregate("variance", 1, _make_var("var_pop"))
    for tname, df in frames.items():
        cols = ", ".join(f'"{c}"' for c in df.columns)
        qs = ", ".join("?" * len(df.columns))
        conn.execute(f'CREATE TABLE {tname} ({cols})')
        conn.executemany(
            f"INSERT INTO {tname} VALUES ({qs})",
            (tuple(None if v is None or (isinstance(v, float) and math.isnan(v))
                   else (v.item() if hasattr(v, "item") else v) for v in row)
             for row in df.itertuples(index=False, name=None)))
    conn.commit()
    return conn


_DATE_ADD = re.compile(
    r"\(\s*date\s+'(\d{4}-\d{2}-\d{2})'\s*([+-])\s*interval\s+'(\d+)'\s+day\s*\)",
    re.I)
_DATE_LIT = re.compile(r"\bdate\s+('(\d{4}-\d{2}-\d{2})')", re.I)
_CAST_DATE = re.compile(r"cast\s*\(\s*('[^']*')\s+as\s+date\s*\)", re.I)


def to_sqlite(sql: str) -> str:
    """Rewrite the engine dialect into SQLite's."""
    sql = _DATE_ADD.sub(lambda m: "date('%s', '%s%s day')"
                        % (m.group(1), m.group(2), m.group(3)), sql)
    sql = _DATE_LIT.sub(lambda m: m.group(1), sql)
    sql = _CAST_DATE.sub(lambda m: m.group(1), sql)
    return sql


def run_golden(conn: sqlite3.Connection, sql: str):
    import pandas as pd
    cur = conn.execute(to_sqlite(sql))
    names = [d[0] for d in cur.description]
    # de-duplicate output names positionally (frames need unique columns)
    seen: dict = {}
    uniq = []
    for n in names:
        k = seen.get(n, 0)
        seen[n] = k + 1
        uniq.append(n if k == 0 else f"{n}__{k}")
    return pd.DataFrame(cur.fetchall(), columns=uniq)
