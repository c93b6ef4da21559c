"""Session: the user-facing query API.

Analog of StarRocks' ConnectContext + StmtExecutor (fe/.../qe/StmtExecutor.java:524)
— parse, plan, execute, return rows. Holds registered tables + catalog stats
and an optional mesh for distributed execution.
"""

from __future__ import annotations

from typing import Optional

from starrocks_tpu.column.column import Table
from starrocks_tpu.sql.catalog import Catalog
from starrocks_tpu.sql.planner import plan_sql


class Session:
    def __init__(self, tables: dict[str, Table], catalog: Optional[Catalog] = None,
                 mesh=None, partitioning: Optional[dict] = None, variables=None):
        from starrocks_tpu.config import SessionVariables
        self.variables = variables or SessionVariables()
        self.tables = tables
        self.catalog = catalog or Catalog.from_tables(tables)
        self.mesh = mesh
        self._dist_tables = None
        if mesh is not None:
            from starrocks_tpu.parallel import dist as D
            self._dist_tables = D.place_tables(
                tables, mesh, partitioning or D.TPCH_PARTITIONING)
        self._plan_cache: dict[str, object] = {}

    def plan(self, text: str):
        if text not in self._plan_cache:
            self._plan_cache[text] = plan_sql(text, self.catalog)
        return self._plan_cache[text]

    def execute(self, text: str) -> Table:
        plan = self.plan(text)
        if self.mesh is not None:
            from starrocks_tpu.parallel import dist as D
            return D.dist_execute(plan, self._dist_tables, self.mesh)
        from starrocks_tpu.exec.plan import execute
        return execute(plan, self.tables)

    def sql(self, text: str):
        """Run a query, return a pandas DataFrame of the result rows."""
        import time
        from starrocks_tpu.utils.metrics import AUDIT, REGISTRY, AuditRecord

        t0 = time.perf_counter()
        try:
            df = self.execute(text).to_pandas()
        except Exception as e:
            REGISTRY.inc("queries_failed_total")
            AUDIT.record(AuditRecord(time.time(), text.strip()[:500],
                                     (time.perf_counter() - t0) * 1e3, 0,
                                     ok=False, error=str(e)[:200]))
            raise
        wall_ms = (time.perf_counter() - t0) * 1e3
        REGISTRY.inc("queries_total")
        REGISTRY.inc("rows_returned_total", len(df))
        REGISTRY.inc("query_ms_total", wall_ms)
        AUDIT.record(AuditRecord(time.time(), text.strip()[:500], wall_ms,
                                 len(df), ok=True))
        return df

    def explain(self, text: str) -> str:
        from starrocks_tpu.utils.profile import explain
        return explain(self.plan(text))

    def explain_analyze(self, text: str):
        """Run with per-operator timing; returns (DataFrame, profile text)."""
        from starrocks_tpu.utils.profile import explain_analyze
        result, prof = explain_analyze(self.plan(text), self.tables)
        return result.to_pandas(), prof.render()
