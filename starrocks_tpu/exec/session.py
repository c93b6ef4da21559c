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


class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class Session:
    def __init__(self, tables: dict[str, Table], catalog: Optional[Catalog] = None,
                 mesh=None, partitioning: Optional[dict] = None, variables=None,
                 user: str = "default"):
        from starrocks_tpu.config import SessionVariables
        from starrocks_tpu.utils.rwlock import RWLock
        self.variables = variables or SessionVariables()
        self.user = user
        # catalog mutation (register/drop/txn) vs query planning+execution
        # fence: a background routine-load register() must not swap tables
        # under a planning query (utils/rwlock.py docstring)
        self._lock = RWLock()
        self.tables = tables
        self.catalog = catalog or Catalog.from_tables(tables)
        self.mesh = mesh
        self._dist_tables = None
        self._partitioning = partitioning
        if mesh is not None:
            from starrocks_tpu.parallel import dist as D
            self._dist_tables = D.place_tables(
                tables, mesh, partitioning or D.TPCH_PARTITIONING)
        self._plan_cache: dict[str, object] = {}
        self.views: dict[str, str] = {}
        # materialized views: name -> MaterializedView (sql/mv.py); their
        # storage tables live in self.tables under __mv_<name>
        self.mviews: dict[str, object] = {}
        # result cache: SQL text -> DataFrame, exact because registered
        # tables are immutable between catalog versions (query-cache analog,
        # be/src/exec/query_cache/cache_operator.h:42)
        self._result_cache: dict[str, object] = {}
        self._catalog_version = 0
        from starrocks_tpu.utils.metrics import table_bytes
        table_bytes(self.tables)

    def plan(self, text: str):
        if text not in self._plan_cache:
            plan = None
            if self.mviews:
                from starrocks_tpu.sql.mv import try_rewrite
                from starrocks_tpu.sql.parser import parse
                from starrocks_tpu.sql.planner import plan_ast
                try:
                    stmt = parse(text)
                except Exception:
                    stmt = None
                rewritten = (try_rewrite(stmt, self.mviews)
                             if stmt is not None else None)
                if rewritten is not None:
                    plan = plan_ast(rewritten, self.catalog,
                                    views=self.views)
                    plan.mv_rewritten = True
            if plan is None:
                plan = plan_sql(text, self.catalog, views=self.views)
            self._plan_cache[text] = plan
        return self._plan_cache[text]

    def execute(self, text: str) -> Table:
        plan = self.plan(text)
        if self.mesh is not None:
            # adaptive DOP (P14): below the byte threshold a 1-instance
            # "fragment" on the session's retained host tables beats paying
            # per-op collective latency across the mesh
            from starrocks_tpu.config import CONFIG
            if CONFIG.adaptive_dop_min_bytes > 0:
                from starrocks_tpu.exec.workgroup import plan_mem_estimate
                if (plan_mem_estimate(plan, self.tables)
                        < CONFIG.adaptive_dop_min_bytes):
                    from starrocks_tpu.exec.plan import execute
                    plan.adaptive_dop_local = True
                    return execute(plan, self.tables)
            from starrocks_tpu.parallel import dist as D
            D.annotate_skew(plan, self.catalog, self.mesh.devices.size)
            try:
                return D.dist_execute(plan, self._dist_tables, self.mesh)
            except NotImplementedError:
                # nodes without a distributed path (e.g. host-finalized
                # group_concat) fall back to single-chip execution over the
                # session's retained host-placed tables — the coordinator
                # choosing a 1-instance fragment, not an error
                from starrocks_tpu.exec.plan import execute
                return execute(plan, self.tables)
        from starrocks_tpu.exec.stream import HostTable, stream_execute
        if any(isinstance(t, HostTable) for t in self.tables.values()):
            # out-of-core: host-RAM tables stream through the chip blockwise
            from starrocks_tpu.config import CONFIG
            return stream_execute(plan, self.tables,
                                  block_rows=CONFIG.stream_block_rows)
        from starrocks_tpu.exec.plan import execute
        return execute(plan, self.tables)

    def _execute_df(self, text: str):
        """Query -> DataFrame. The pure single-chip device path routes
        through exec.plan.execute_df (whole query + result extraction as
        one jitted module, one readback); every other configuration
        executes to a Table and pulls it."""
        from starrocks_tpu.exec.stream import HostTable
        if (self.mesh is None
                and not any(isinstance(t, HostTable)
                            for t in self.tables.values())):
            from starrocks_tpu.exec.plan import execute_df
            return execute_df(self.plan(text), self.tables)
        return self.execute(text).to_pandas()

    # -- catalog mutation (DDL analog: LocalMetastore + bulk-load sinks) ----
    def register(self, name: str, table: Table) -> None:
        """Register (or replace) a table; re-derives catalog stats (the
        ANALYZE-at-load behavior of Catalog.from_tables)."""
        with self._lock.write():
            self._register_locked(name, table)
        # a programmatic bulk load carries data the edit log cannot
        # reproduce from text — fold it into the image right away (the
        # statement-driven register()s inside _try_ddl are replayable and
        # skip this via _in_stmt)
        if (getattr(self, "_journal", None) is not None
                and not getattr(self, "_in_stmt", False)):
            self.checkpoint()

    def _register_locked(self, name: str, table: Table) -> None:
        self.tables[name] = table
        self.catalog = Catalog.from_tables(self.tables)
        self._plan_cache.clear()
        self._result_cache.clear()
        self._catalog_version += 1
        from starrocks_tpu.utils.metrics import table_bytes
        table_bytes(self.tables)
        if self.mesh is not None:
            from starrocks_tpu.parallel import dist as D
            self._dist_tables = D.place_tables(
                self.tables, self.mesh,
                self._partitioning or D.TPCH_PARTITIONING)
        # auto-refresh MVs over the re-registered base (the reference's
        # version-triggered refresh task; immutable loads make a full
        # recompute THE incremental unit)
        for mv in list(self.mviews.values()):
            if name in mv.base_tables:
                self._refresh_mv(mv)

    def drop(self, name: str) -> None:
        with self._lock.write():
            self.tables.pop(name, None)
            self.views.pop(name, None)
            # MVs over a dropped base are dropped with it (the reference
            # marks them inactive; with no base there is nothing to refresh
            # from)
            for mname in [m for m, mv in self.mviews.items()
                          if name in mv.base_tables]:
                mv = self.mviews.pop(mname)
                self.tables.pop(mv.table_name, None)
            self.catalog = Catalog.from_tables(self.tables)
            self._plan_cache.clear()
            self._result_cache.clear()
            self._catalog_version += 1
        if (getattr(self, "_journal", None) is not None
                and not getattr(self, "_in_stmt", False)):
            self.checkpoint()   # programmatic drop: fold, like register()

    # -- materialized views (sql/mv.py; MaterializedView.java analog) -------
    def create_materialized_view(self, name: str, select_sql: str) -> None:
        from starrocks_tpu.sql.mv import analyze_mv
        result = self._execute_base(select_sql)
        mv = analyze_mv(name, select_sql, list(result.column_names()))
        self.register(mv.table_name, result)
        self.mviews[name] = mv

    def _refresh_mv(self, mv) -> None:
        # plan WITHOUT MV rewrite: the defining query exact-matches its own
        # materialization, so the normal path would "refresh" the MV from
        # its stale self
        result = self._execute_base(mv.sql)
        # register() would re-enter the refresh loop; the storage name is
        # never a base table, so the nested pass over mviews no-ops
        self.register(mv.table_name, result)

    def _execute_base(self, text: str) -> Table:
        """Execute against base tables only (MV rewrite disabled)."""
        plan = plan_sql(text, self.catalog, views=self.views)
        from starrocks_tpu.exec.plan import execute
        return execute(plan, self.tables)

    def load_parquet(self, name: str, path: str) -> Table:
        from starrocks_tpu.io.parquet_io import read_parquet
        t = read_parquet(path)
        self.register(name, t)
        return t

    def load_csv(self, name: str, path: str, schema=None,
                 delimiter: str = ",", header: bool = True) -> Table:
        """CSV bulk load (stream/broker-load front-end analog); schema=None
        infers column types from a sample."""
        from starrocks_tpu.io.csv_io import read_csv
        t = read_csv(path, schema, delimiter, header)
        self.register(name, t)
        return t

    def load_orc(self, name: str, path: str) -> Table:
        """ORC bulk load (orc scanner analog)."""
        from starrocks_tpu.io.parquet_io import read_orc
        t = read_orc(path)
        self.register(name, t)
        return t

    def load_avro(self, name: str, path: str) -> Table:
        """Avro container-file bulk load (avro_scanner.cpp analog)."""
        from starrocks_tpu.io.avro_io import read_avro
        t = read_avro(path)
        self.register(name, t)
        return t

    def load_json(self, name: str, path: str, schema=None) -> Table:
        """ndjson bulk load (json_scanner.cpp analog); schema inferred when
        omitted."""
        from starrocks_tpu.io.json_io import read_json
        t = read_json(path, schema)
        self.register(name, t)
        return t

    def create_routine_load(self, name: str, table: str, pattern: str,
                            fmt: str = "csv", interval_s: float = 5.0,
                            start: bool = False, **load_kwargs):
        """Continuous ingest job: new files matching `pattern` append to
        `table` on each poll (io/routine_load.py; RoutineLoadJob.java
        analog with a file glob standing in for the Kafka topic)."""
        from starrocks_tpu.io.routine_load import RoutineLoadJob
        job = RoutineLoadJob(self, name, table, pattern, fmt, interval_s,
                             **load_kwargs)
        if not hasattr(self, "routine_jobs"):
            self.routine_jobs = {}
        self.routine_jobs[name] = job
        if start:
            job.start()
        return job

    def save_segment(self, name: str, dirpath: str) -> None:
        """Write a registered table to a persistent columnar segment
        directory (exec/stream.py HostTable.save: raw column files +
        validity + dictionaries + zone maps)."""
        from starrocks_tpu.exec.stream import HostTable
        t = self.tables[name]
        ht = t if isinstance(t, HostTable) else HostTable.from_table(t)
        ht.save(dirpath)

    def load_segment(self, name: str, dirpath: str, mmap: bool = True):
        """Register a saved segment as a DISK-tier table: with mmap=True
        its columns stay on disk and stream through the chip blockwise
        (the third storage level under HBM and host RAM)."""
        from starrocks_tpu.exec.stream import HostTable
        t = HostTable.load(dirpath, mmap=mmap)
        self.register(name, t)
        return t

    def export_parquet(self, select_text: str, path: str) -> None:
        from starrocks_tpu.io.parquet_io import write_parquet
        write_parquet(self.execute(select_text), path)

    def save_catalog(self, dirpath: str) -> None:
        """Persist the catalog: one parquet file per table + manifest.json
        (schemas, row counts, views) — the checkpoint/resume analog of the
        reference's FE image + per-load manifest (SURVEY §5; the catalog IS
        the manifest under immutable bulk loads)."""
        import json
        import os
        from starrocks_tpu.io.parquet_io import write_parquet

        from starrocks_tpu.exec.stream import HostTable

        os.makedirs(dirpath, exist_ok=True)
        manifest = {"version": 2, "tables": {}, "views": dict(self.views),
                    "mviews": {n: mv.sql for n, mv in self.mviews.items()},
                    # auth registries are catalog metadata too: an image
                    # must restore who may read what (the reference's FE
                    # image serializes AuthorizationMgr alongside the db)
                    "auth": {
                        "users": sorted(self._auth_users()),
                        "grants": {u: {t: sorted(ps)
                                       for t, ps in tbl.items()}
                                   for u, tbl in self._grants().items()},
                        "roles": {r: {t: sorted(ps)
                                      for t, ps in tbl.items()}
                                  for r, tbl in self._roles().items()},
                        "user_roles": {u: sorted(rs)
                                       for u, rs in self._user_roles().items()},
                    }}
        for name, t in self.tables.items():
            if isinstance(t, HostTable):
                # disk/host-tier tables checkpoint as columnar segments
                seg = f"{name}.seg"
                t.save(os.path.join(dirpath, seg))
                manifest["tables"][name] = {
                    "segment": seg, "rows": int(t.nrows),
                    "schema": {c: str(col.dtype)
                               for c, col in t.columns.items()},
                }
                continue
            f = f"{name}.parquet"
            write_parquet(t, os.path.join(dirpath, f))
            manifest["tables"][name] = {
                "file": f,
                "rows": int(t.nrows) if hasattr(t, "nrows") else None,
                "schema": {c: str(col.dtype)
                           for c, col in t.columns.items()},
            }
        with open(os.path.join(dirpath, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1)

    @classmethod
    def load_catalog(cls, dirpath: str, mesh=None, partitioning=None
                     ) -> "Session":
        """Resume a session from save_catalog output (re-runs ANALYZE at
        registration, re-places on the mesh when given)."""
        import json
        import os
        from starrocks_tpu.io.parquet_io import read_parquet

        from starrocks_tpu.exec.stream import HostTable

        with open(os.path.join(dirpath, "manifest.json")) as fh:
            manifest = json.load(fh)
        tables = {}
        for name, meta in manifest["tables"].items():
            if "segment" in meta:
                tables[name] = HostTable.load(
                    os.path.join(dirpath, meta["segment"]))
            else:
                tables[name] = read_parquet(os.path.join(dirpath,
                                                         meta["file"]))
        s = cls(tables, mesh=mesh, partitioning=partitioning)
        s.views = dict(manifest.get("views", {}))
        from starrocks_tpu.sql.mv import analyze_mv
        for n, sql in manifest.get("mviews", {}).items():
            stored = s.tables.get(f"__mv_{n}")
            if stored is not None:
                s.mviews[n] = analyze_mv(n, sql, list(stored.column_names()))
        auth = manifest.get("auth")
        if auth:
            s._auth_users().update(auth.get("users", ()))
            for u, tbl in auth.get("grants", {}).items():
                s._grants()[u] = {t: set(ps) for t, ps in tbl.items()}
            for r, tbl in auth.get("roles", {}).items():
                s._roles()[r] = {t: set(ps) for t, ps in tbl.items()}
            for u, rs in auth.get("user_roles", {}).items():
                s._user_roles()[u] = set(rs)
        return s

    # -- journal (edit log + image + checkpoint; exec/journal.py) ---------
    def _meta_fingerprint(self):
        """Cheap structural hash of every piece of durable catalog state a
        SQL statement can mutate; sql() journals a statement iff this
        changed across it."""
        def frz(d):
            return tuple(sorted(
                (k, frz(v) if isinstance(v, dict)
                 else tuple(sorted(v)) if isinstance(v, set) else v)
                for k, v in d.items()))
        return (self._catalog_version,
                tuple(sorted(self.views.items())),
                tuple(sorted(self.mviews)),
                tuple(sorted(self._auth_users())),
                frz(self._grants()), frz(self._roles()),
                frz(self._user_roles()),
                getattr(self, "_txn", None) is not None)

    def enable_journal(self, dirpath: str) -> None:
        """Start durable metadata logging: write a full image now, then
        append every catalog-mutating statement to the edit log."""
        from starrocks_tpu.exec.journal import CatalogJournal
        j = CatalogJournal(dirpath)
        self.save_catalog(j.image_dir)
        j.open(truncate=True)
        self._journal = j

    def checkpoint(self) -> None:
        """Fold the edit log into a fresh image and truncate it (the
        reference's checkpoint daemon)."""
        j = getattr(self, "_journal", None)
        if j is None:
            raise RuntimeError("journal not enabled")
        self.save_catalog(j.image_dir)
        j.open(truncate=True)

    @classmethod
    def recover(cls, dirpath: str, mesh=None, partitioning=None
                ) -> "Session":
        """Image + journal-replay recovery. Statements replay in LSN order
        under each entry's recorded user (so grant-gated DDL reproduces
        its original outcome); the recovered session keeps journaling."""
        from starrocks_tpu.exec.journal import CatalogJournal
        j = CatalogJournal(dirpath)
        s = cls.load_catalog(j.image_dir, mesh=mesh,
                             partitioning=partitioning)
        entries = list(j.read())
        for e in entries:
            prev = s.user
            s.user = e.get("user", prev)
            try:
                s.sql(e["stmt"])
            finally:
                s.user = prev
        # an open transaction at crash time was never committed: roll the
        # replayed prefix of it back (the reference aborts unfinished txns
        # on FE restart)
        if getattr(s, "_txn", None) is not None:
            s.sql("rollback")
        j.open(truncate=False)
        s._journal = j
        return s

    _DDL = None  # compiled lazily

    def _try_ddl(self, text: str):
        """Handle CREATE TABLE/VIEW ... AS, INSERT INTO ... SELECT, DROP.
        Returns a result DataFrame or None if `text` is a plain query."""
        import re
        import pandas as pd
        s = text.strip().rstrip(";")
        from starrocks_tpu.exec.workgroup import MANAGER as _WG
        from starrocks_tpu.exec.workgroup import match_ddl as _wg_ddl
        wgd = _wg_ddl(s)
        if wgd is not None:
            if wgd[0] == "create":
                self._require_admin("CREATE RESOURCE GROUP")
                _WG.create(wgd[1], if_not_exists=wgd[2])
                return pd.DataFrame()
            if wgd[0] == "drop":
                self._require_admin("DROP RESOURCE GROUP")
                _WG.drop(wgd[1])
                return pd.DataFrame()
            return pd.DataFrame(
                [{"name": g.name, "concurrency_limit": g.concurrency_limit,
                  "mem_limit_bytes": g.mem_limit_bytes,
                  "big_query_mem_bytes": g.big_query_mem_bytes,
                  "users": "|".join(g.users),
                  "query_types": "|".join(g.query_types)}
                 for g in _WG.list()])
        from starrocks_tpu.sql.mv import match_ddl as _mv_ddl
        mvd = _mv_ddl(s)
        if mvd is not None:
            if mvd[0] == "create":
                self._check_select_text(mvd[2])
                self.create_materialized_view(mvd[1], mvd[2])
            elif mvd[0] == "drop":
                self._check_table_priv(mvd[1], "drop")
                mv = self.mviews.pop(mvd[1], None)
                if mv is not None:
                    self.drop(mv.table_name)
            else:  # refresh
                self._refresh_mv(self.mviews[mvd[1]])
            return pd.DataFrame()
        m = re.match(r"(?is)^create\s+table\s+(\w+)\s+as\s+(.*)$", s)
        if m:
            name, sel = m.group(1), m.group(2)
            # the embedded SELECT runs with the CALLER's grants (the
            # reference checks CTAS sources against the requesting user,
            # not the table owner)
            self._check_select_text(sel)
            self.register(name, self.execute(sel))
            return pd.DataFrame()
        m = re.match(r"(?is)^create\s+view\s+(\w+)\s+as\s+(.*)$", s)
        if m:
            self.views[m.group(1)] = m.group(2)
            self._plan_cache.clear()
            self._result_cache.clear()
            return pd.DataFrame()
        m = re.match(r"(?is)^insert\s+into\s+(\w+)\s+(select.*)$", s)
        if m:
            name, sel = m.group(1), m.group(2)
            self._check_table_priv(name, "insert")
            self._check_select_text(sel)
            cols = ", ".join(self.tables[name].column_names())
            with self._wg_admit("insert"):
                merged = self._execute_base(
                    f"select {cols} from {name} union all {sel}")
                self.register(name, merged)
            return pd.DataFrame()
        m = re.match(r"(?is)^insert\s+into\s+(\w+)\s*"
                     r"(?:\(([\w\s,]*)\))?\s*values\s+(.*)$", s)
        if m:
            self._check_table_priv(m.group(1), "insert")
            with self._wg_admit("insert"):
                self._insert_values(m.group(1), m.group(2), m.group(3))
            return pd.DataFrame()
        m = re.match(r"(?is)^drop\s+(?:table|view)\s+(?:if\s+exists\s+)?(\w+)$", s)
        if m:
            self._check_table_priv(m.group(1), "drop")
            self.drop(m.group(1))
            return pd.DataFrame()
        # multi-statement transactions (the reference's txn manager guards
        # loads/publishes, fe/.../transaction/; with immutable device
        # tables a snapshot of the name->Table map IS a consistent point,
        # so BEGIN is a shallow copy and ROLLBACK a restore — single
        # session scope, no cross-session isolation to manage)
        if re.match(r"(?is)^(?:begin|start\s+transaction)$", s):
            if getattr(self, "_txn", None) is not None:
                raise RuntimeError("transaction already in progress")
            self._txn = (dict(self.tables), dict(self.views),
                         dict(self.mviews))
            return pd.DataFrame()
        if re.match(r"(?is)^commit$", s):
            if getattr(self, "_txn", None) is None:
                raise RuntimeError("COMMIT outside a transaction")
            self._txn = None
            return pd.DataFrame()
        if re.match(r"(?is)^rollback$", s):
            txn = getattr(self, "_txn", None)
            if txn is None:
                raise RuntimeError("ROLLBACK outside a transaction")
            with self._lock.write():
                self.tables, self.views, self.mviews = (dict(txn[0]),
                                                        dict(txn[1]),
                                                        dict(txn[2]))
                self._txn = None
                self.catalog = Catalog.from_tables(self.tables)
                self._plan_cache.clear()
                self._result_cache.clear()
                self._catalog_version += 1
                if self.mesh is not None:
                    # any register() inside the txn re-placed device shards;
                    # distributed reads must see the restored snapshot too
                    from starrocks_tpu.parallel import dist as D
                    self._dist_tables = D.place_tables(
                        self.tables, self.mesh,
                        self._partitioning or D.TPCH_PARTITIONING)
            return pd.DataFrame()
        # privileges (table-level grants; fe/.../privilege/
        # AuthorizationMgr.java reduced to the single-process surface:
        # users + SELECT/INSERT grants checked at the session front door)
        m = re.match(r"(?is)^create\s+user\s+(?:if\s+not\s+exists\s+)?'?(\w+)'?$", s)
        if m:
            self._require_admin("CREATE USER")
            self._auth_users().add(m.group(1))
            return pd.DataFrame()
        # roles (the RBAC core of the reference's AuthorizationMgr: grants
        # attach to roles, roles attach to users; a user's effective grants
        # are direct ∪ role-carried)
        m = re.match(r"(?is)^create\s+role\s+(?:if\s+not\s+exists\s+)?'?(\w+)'?$", s)
        if m:
            self._require_admin("CREATE ROLE")
            self._roles().setdefault(m.group(1), {})
            return pd.DataFrame()
        m = re.match(r"(?is)^drop\s+role\s+(?:if\s+exists\s+)?'?(\w+)'?$", s)
        if m:
            self._require_admin("DROP ROLE")
            self._roles().pop(m.group(1), None)
            for rs in self._user_roles().values():
                rs.discard(m.group(1))
            return pd.DataFrame()
        m = re.match(r"(?is)^grant\s+(\w+)\s+on\s+(\w+)\s+to\s+role\s+'?(\w+)'?$", s)
        if m:
            self._require_admin("GRANT")
            priv, tbl, role = (m.group(1).lower(), m.group(2), m.group(3))
            if role not in self._roles():
                raise ValueError(f"unknown role {role!r}")
            self._roles()[role].setdefault(tbl, set()).add(priv)
            return pd.DataFrame()
        m = re.match(r"(?is)^revoke\s+(\w+)\s+on\s+(\w+)\s+from\s+role\s+'?(\w+)'?$", s)
        if m:
            self._require_admin("REVOKE")
            priv, tbl, role = (m.group(1).lower(), m.group(2), m.group(3))
            self._roles().get(role, {}).get(tbl, set()).discard(priv)
            return pd.DataFrame()
        m = re.match(r"(?is)^grant\s+'?(\w+)'?\s+to\s+'?(\w+)'?$", s)
        if m and m.group(1) in self._roles():
            self._require_admin("GRANT ROLE")
            role, usr = m.group(1), m.group(2)
            if usr not in self._auth_users():
                raise ValueError(f"unknown user {usr!r}")
            self._user_roles().setdefault(usr, set()).add(role)
            return pd.DataFrame()
        m = re.match(r"(?is)^revoke\s+'?(\w+)'?\s+from\s+'?(\w+)'?$", s)
        if m and m.group(1) in self._roles():
            self._require_admin("REVOKE ROLE")
            self._user_roles().get(m.group(2), set()).discard(m.group(1))
            return pd.DataFrame()
        m = re.match(r"(?is)^grant\s+(\w+)\s+on\s+(\w+)\s+to\s+'?(\w+)'?$", s)
        if m:
            self._require_admin("GRANT")
            priv, tbl, usr = (m.group(1).lower(), m.group(2), m.group(3))
            if usr not in self._auth_users():
                raise ValueError(f"unknown user {usr!r}")
            self._grants().setdefault(usr, {}).setdefault(tbl, set()).add(priv)
            return pd.DataFrame()
        m = re.match(r"(?is)^revoke\s+(\w+)\s+on\s+(\w+)\s+from\s+'?(\w+)'?$", s)
        if m:
            self._require_admin("REVOKE")
            priv, tbl, usr = (m.group(1).lower(), m.group(2), m.group(3))
            self._grants().get(usr, {}).get(tbl, set()).discard(priv)
            return pd.DataFrame()
        # row mutations over immutable storage: DELETE/UPDATE rebuild the
        # table through a SELECT (the reference's primary-key delete/update
        # write a delete-vector + new rows, fe/.../DeleteStmt + partial
        # update; an immutable rebuild is the device-resident equivalent).
        # 3VL: DELETE removes rows where the predicate is TRUE; FALSE and
        # NULL rows survive, hence the CASE guard rather than NOT.
        m = re.match(r"(?is)^delete\s+from\s+(\w+)\s+where\s+(.*)$", s)
        if m:
            name, pred = m.group(1), m.group(2)
            self._check_table_priv(name, "insert")
            cols = ", ".join(self.tables[name].column_names())
            kept = self._execute_base(
                f"select {cols} from {name} "
                f"where case when {pred} then 0 else 1 end = 1")
            self.register(name, kept)
            return pd.DataFrame()
        m = re.match(r"(?is)^update\s+(\w+)\s+set\s+(.*?)(?:\s+where\s+(.*))?$",
                     s)
        if m:
            name, sets, pred = m.group(1), m.group(2), m.group(3)
            self._check_table_priv(name, "insert")
            assigns = {}
            for part in self._split_top(sets):
                col, _, expr = part.partition("=")
                assigns[col.strip()] = expr.strip()
            items = []
            for c in self.tables[name].column_names():
                if c in assigns:
                    new = assigns[c]
                    items.append(
                        f"case when {pred} then {new} else {c} end as {c}"
                        if pred else f"{new} as {c}")
                else:
                    items.append(c)
            self.register(name, self._execute_base(
                f"select {', '.join(items)} from {name}"))
            return pd.DataFrame()
        # metadata front-door statements (ShowExecutor.java analog)
        if re.match(r"(?is)^show\s+tables$", s):
            return pd.DataFrame(
                {"table_name": sorted(n for n in self.tables
                                      if not n.startswith("__mv_"))})
        if re.match(r"(?is)^show\s+(?:views)$", s):
            return pd.DataFrame({"view_name": sorted(self.views)})
        if re.match(r"(?is)^show\s+materialized\s+views?$", s):
            return pd.DataFrame(
                [{"name": n, "definition": mv.sql,
                  "rows": self.tables[mv.table_name].nrows
                  if mv.table_name in self.tables else 0}
                 for n, mv in sorted(self.mviews.items())])
        m = re.match(r"(?is)^(?:describe|desc)\s+(\w+)$", s)
        if m:
            name = m.group(1)
            if name in self.views:
                raise ValueError(f"DESC on logical view {name!r}: "
                                 "describe its base tables")
            t = self.tables[name]
            return pd.DataFrame(
                [{"field": c, "type": str(col.dtype),
                  "null": "YES" if col.valid is not None else "NO"}
                 for c, col in t.columns.items()])
        return None

    # auth registries are per-catalog (shared by every session constructed
    # over the same tables dict? no — per-Session, like the rest of the
    # catalog state; a deployment shares them via a shared Session or the
    # wire front doors, which hold ONE session per server)
    def _auth_users(self) -> set:
        if not hasattr(self, "_users"):
            self._users = set()
        return self._users

    def _grants(self) -> dict:
        if not hasattr(self, "_grant_map"):
            self._grant_map = {}
        return self._grant_map

    def _roles(self) -> dict:
        if not hasattr(self, "_role_map"):
            self._role_map = {}
        return self._role_map

    def _user_roles(self) -> dict:
        if not hasattr(self, "_user_role_map"):
            self._user_role_map = {}
        return self._user_role_map

    def _effective_grants(self) -> dict:
        """table -> priv set for this session's user: direct grants plus
        the grants of every held role (RBAC resolution)."""
        out = {t: set(ps)
               for t, ps in self._grants().get(self.user, {}).items()}
        for role in self._user_roles().get(self.user, ()):
            for t, ps in self._roles().get(role, {}).items():
                out.setdefault(t, set()).update(ps)
        return out

    def _wg_admit(self, query_type: str):
        """Resource-group admission for write-path statements (the select
        path charges its plan estimate in _sql_admitted; writes are
        admitted for concurrency only — their working set is the load
        itself, not a plan scan)."""
        from starrocks_tpu.config import CONFIG
        from starrocks_tpu.exec.workgroup import MANAGER
        gname = MANAGER.classify(self.user, query_type)
        if gname is None:
            return _NullCtx()
        return MANAGER.admit(gname, 0,
                             timeout_s=CONFIG.admission_timeout_s)

    def _governed(self) -> bool:
        """True when this session's user is subject to grant checks
        (registered, non-admin). `default` is the admin identity; unknown
        users are ungoverned (single-tenant compatibility mode)."""
        return self.user != "default" and self.user in self._auth_users()

    def _require_admin(self, what: str) -> None:
        if self._governed():
            raise PermissionError(
                f"user {self.user!r} may not run {what} (admin only)")

    def _check_table_priv(self, table: str, priv: str) -> None:
        """Grant gate for mutation/DDL statements against one table."""
        if not self._governed():
            return
        if priv not in self._effective_grants().get(table, ()):
            raise PermissionError(
                f"user {self.user!r} lacks {priv.upper()} on {table!r}")

    def _check_select_text(self, sel: str) -> None:
        """SELECT-grant check for a statement-embedded query (CTAS source,
        INSERT..SELECT source, MV definition): the embedded read runs with
        the CALLER's grants."""
        if not self._governed():
            return
        self._check_select_priv(self.plan(sel))

    def _check_select_priv(self, plan) -> None:
        """Enforce table-level SELECT grants for non-default users that
        exist in the user registry (default/admin sessions bypass).

        MV storage scans (`__mv_*`) — whether from the transparent rewrite
        or from naming the storage table directly — are checked against the
        MV's BASE tables: a grant on the base is what authorizes reading
        any materialization derived from it (the reference checks rewritten
        plans against the query's original tables)."""
        if not self._governed():
            return
        from starrocks_tpu.exec.plan import Scan
        mine = self._effective_grants()
        mv_bases = {mv.table_name: tuple(mv.base_tables)
                    for mv in self.mviews.values()}
        for node in plan.walk():
            if isinstance(node, Scan):
                for base in mv_bases.get(node.table, (node.table,)):
                    if "select" not in mine.get(base, ()):
                        raise PermissionError(
                            f"user {self.user!r} lacks SELECT on {base!r}")

    @staticmethod
    def _split_top(text: str) -> list:
        """Split on commas at paren/quote depth 0 (UPDATE SET lists can
        contain function calls and string literals)."""
        out, depth, q, start = [], 0, None, 0
        for i, ch in enumerate(text):
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append(text[start:i])
                start = i + 1
        out.append(text[start:])
        return [p for p in (x.strip() for x in out) if p]

    def _insert_values(self, name: str, colspec, values_text: str) -> None:
        """INSERT INTO t [(cols)] VALUES (...), (...) — the small-row append
        path (the reference's INSERT INTO VALUES through the txn/load stack,
        fe/.../qe/StmtExecutor; here an immutable-table rebuild, acceptable
        for small appends; bulk data uses the load paths)."""
        import numpy as np
        from starrocks_tpu.column import dtypes as dt
        from starrocks_tpu.column.column import Column, Table
        from starrocks_tpu.sql import ast as A
        from starrocks_tpu.sql.parser import Parser
        from starrocks_tpu.sql.planner import fold_const

        old = self.tables[name]
        all_names = old.column_names()
        names = ([c.strip() for c in colspec.split(",")] if colspec
                 else list(all_names))
        p = Parser(values_text)
        rows = []
        while True:
            p.expect("SYMBOL", "(")
            row = [p.parse_expr()]
            while p.accept("SYMBOL", ","):
                row.append(p.parse_expr())
            p.expect("SYMBOL", ")")
            if len(row) != len(names):
                raise ValueError(
                    f"INSERT row has {len(row)} values, expected {len(names)}")
            rows.append(row)
            if not p.accept("SYMBOL", ","):
                break

        def conv(lit, d):
            """literal -> (storage value, is_valid) for column dtype d."""
            if not isinstance(lit, A.Lit):
                raise ValueError("INSERT VALUES must be constant expressions")
            if lit.kind == "null":
                return 0 if not d.is_string else "", False
            if d.is_string:
                return str(lit.value), True
            if d.is_decimal:
                if lit.kind == "int":
                    return lit.value * 10 ** d.scale, True
                if lit.kind == "decimal":
                    if d.scale >= lit.scale:
                        return lit.value * 10 ** (d.scale - lit.scale), True
                    return int(round(lit.value / 10 ** (lit.scale - d.scale))), True
            if d.kind is dt.TypeKind.DATE:
                if lit.kind == "date":
                    return lit.value, True
                if lit.kind == "string":
                    return int((np.datetime64(lit.value)
                                - np.datetime64("1970-01-01")).astype(int)), True
            if d.kind is dt.TypeKind.FLOAT64:
                return float(lit.value) / (10 ** lit.scale
                                           if lit.kind == "decimal" else 1), True
            if lit.kind in ("int", "bool"):
                return int(lit.value), True
            raise ValueError(f"cannot insert {lit.kind} literal into {d}")

        live = None if old.live is None else np.asarray(old.live)
        cols = {}
        for cname in all_names:
            c = old[cname]
            data = np.asarray(c.data)
            valid = None if c.valid is None else np.asarray(c.valid)
            if live is not None:
                data = data[live]
                valid = None if valid is None else valid[live]
            if cname in names:
                j = names.index(cname)
                conved = [conv(fold_const(r[j]), c.dtype) for r in rows]
            else:
                conved = [(0 if not c.dtype.is_string else "", False)
                          for _ in rows]
            new_vals = [v for v, _ in conved]
            new_ok = np.asarray([ok for _, ok in conved], bool)
            if c.dtype.is_string:
                olds = dt.dict_values(c.dict_id)[data].astype(object)
                arr = np.concatenate([olds, np.asarray(new_vals, object)])
            else:
                arr = np.concatenate([data,
                                      np.asarray(new_vals).astype(data.dtype)])
            ok = np.concatenate([np.ones(len(data), bool)
                                 if valid is None else valid, new_ok])
            cols[cname] = Column.from_numpy(arr, c.dtype,
                                            valid=None if ok.all() else ok)
        self.register(name, Table(columns=cols))

    # process-wide admission gate (SlotManager analog): bounds concurrent
    # query execution across every Session in the process; waiters queue
    _admission = None

    @classmethod
    def _admit(cls):
        import threading
        from starrocks_tpu.config import CONFIG
        if cls._admission is None or \
                cls._admission._initial_value != CONFIG.max_concurrent_queries:
            sem = threading.BoundedSemaphore(CONFIG.max_concurrent_queries)
            sem._initial_value = CONFIG.max_concurrent_queries
            cls._admission = sem
        return cls._admission

    def sql(self, text: str):
        """Run a query, return a pandas DataFrame of the result rows."""
        import time
        from starrocks_tpu.config import CONFIG
        from starrocks_tpu.utils.metrics import AUDIT, REGISTRY, AuditRecord

        j = getattr(self, "_journal", None)
        fp = self._meta_fingerprint() if j is not None else None
        self._in_stmt = True
        try:
            ddl = self._try_ddl(text)
        finally:
            self._in_stmt = False
        if ddl is not None:
            # journal the statement iff it mutated durable catalog state
            # (SHOW/DESC and failed statements change nothing and replay
            # would be noise); append is fsync'd before returning, so an
            # acknowledged DDL survives a crash
            if j is not None and self._meta_fingerprint() != fp:
                j.append(self.user, text)
            return ddl
        gate = self._admit()
        if not gate.acquire(timeout=CONFIG.admission_timeout_s):
            REGISTRY.inc("queries_rejected_total")
            raise RuntimeError(
                f"admission timeout: >{CONFIG.max_concurrent_queries} "
                f"queries in flight for {CONFIG.admission_timeout_s}s")
        try:
            return self._sql_admitted(text)
        finally:
            gate.release()

    def _sql_admitted(self, text: str):
        with self._lock.read():
            return self._sql_locked(text)

    def _sql_locked(self, text: str):
        import time
        from starrocks_tpu.utils.metrics import AUDIT, REGISTRY, AuditRecord
        from starrocks_tpu.config import CONFIG
        # privilege check BEFORE the result cache: a revoked grant must
        # also revoke access to previously-cached results. Parse/plan/
        # privilege failures are audited like execution failures (the
        # reference's audit log records every statement outcome).
        try:
            self._check_select_priv(self.plan(text))
        except Exception as e:
            REGISTRY.inc("queries_failed_total")
            AUDIT.record(AuditRecord(time.time(), text.strip()[:500], 0.0, 0,
                                     ok=False, error=str(e)[:200]))
            raise
        if CONFIG.enable_result_cache:
            hit = self._result_cache.get(text)
            if hit is not None:
                REGISTRY.inc("result_cache_hits_total")
                return hit.copy()
        # resource-group admission: classify by user, charge the group's
        # quota with the plan's static scan estimate (exec/workgroup.py)
        from starrocks_tpu.exec.workgroup import MANAGER as _WG
        from starrocks_tpu.exec.workgroup import plan_mem_estimate
        gname = _WG.classify(self.user, "select")
        adm = None
        if gname is not None:
            est = plan_mem_estimate(self.plan(text), self.tables)
            adm = _WG.admit(gname, est,
                            timeout_s=CONFIG.admission_timeout_s)
        t0 = time.perf_counter()
        try:
            with (adm if adm is not None else _NullCtx()):
                df = self._execute_df(text)
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
        from starrocks_tpu.utils.metrics import device_memory_gauges
        device_memory_gauges()
        if CONFIG.enable_result_cache:
            if len(self._result_cache) >= CONFIG.result_cache_max_entries:
                self._result_cache.pop(next(iter(self._result_cache)))
            self._result_cache[text] = df.copy()
        return df

    def explain(self, text: str) -> str:
        from starrocks_tpu.utils.profile import explain
        return explain(self.plan(text))

    def explain_analyze(self, text: str):
        """Run with per-operator timing; returns (DataFrame, profile text)."""
        from starrocks_tpu.utils.profile import explain_analyze
        result, prof = explain_analyze(self.plan(text), self.tables)
        return result.to_pandas(), prof.render()
