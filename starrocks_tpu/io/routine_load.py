"""Routine load: continuous file ingest into a registered table.

Analog of the reference's routine load / pipe jobs
(fe/fe-core/src/main/java/com/starrocks/load/routineload/
RoutineLoadJob.java consuming a Kafka offset stream; the zero-egress
environment substitutes a growing directory of files for the topic, the
reference's FILES()/pipe pattern). Each poll ingests every file matching
the glob that has not been consumed yet, appends the rows to the target
table in ONE register (one catalog version bump, one re-ANALYZE, one MV
refresh), and records the consumed names — the offset-tracking analog, so
a job can stop/resume without double-loading.

Polling runs either manually (`poll_once`, what tests use) or on a daemon
thread (`start`), mirroring the job scheduler. Files must be complete when
they match the glob (the convention of every file-watching loader; writers
should write temp names and rename into place).
"""

from __future__ import annotations

import glob
import threading
from typing import Optional


class RoutineLoadJob:
    def __init__(self, session, name: str, table: str, pattern: str,
                 fmt: str = "csv", interval_s: float = 5.0, **load_kwargs):
        if fmt not in ("csv", "parquet", "json", "orc"):
            raise ValueError(f"routine load: unsupported format {fmt!r}")
        self.session = session
        self.name = name
        self.table = table
        self.pattern = pattern
        self.fmt = fmt
        self.interval_s = interval_s
        self.load_kwargs = load_kwargs
        self.consumed: set = set()      # offset analog: file names already in
        self.rows_loaded = 0
        self.state = "RUNNING"          # RUNNING | PAUSED | STOPPED
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    def _read(self, path: str):
        if self.fmt == "csv":
            from starrocks_tpu.io.csv_io import read_csv
            return read_csv(path, **self.load_kwargs)
        if self.fmt == "parquet":
            from starrocks_tpu.io.parquet_io import read_parquet
            return read_parquet(path)
        if self.fmt == "orc":
            from starrocks_tpu.io.parquet_io import read_orc
            return read_orc(path)
        if self.fmt == "avro":
            from starrocks_tpu.io.avro_io import read_avro
            return read_avro(path)
        from starrocks_tpu.io.json_io import read_json
        return read_json(path, **self.load_kwargs)

    def poll_once(self) -> int:
        """Ingest all new matching files; returns rows appended.

        The read-modify-write (snapshot base table -> merge -> register)
        runs under the session's WRITE lock: the daemon-thread variant
        races foreground queries/mutations otherwise (a query planned
        between the tables swap and the catalog/placement rebuild would
        mix catalog generations — r4 advisor finding)."""
        if self.state != "RUNNING":
            return 0
        fresh = sorted(set(glob.glob(self.pattern)) - self.consumed)
        if not fresh:
            return 0
        parts = [self._read(p) for p in fresh]   # file IO outside the lock
        with self.session._lock.write():
            return self._merge_locked(fresh, parts)

    def _merge_locked(self, fresh, parts) -> int:
        import numpy as np
        from starrocks_tpu.column import dtypes as dt
        from starrocks_tpu.column.column import Column, Table

        base = self.session.tables.get(self.table)
        tables = ([base] if base is not None else []) + parts
        names = tables[0].column_names()
        new_rows = sum(
            int(np.sum(np.asarray(t.live))) if t.live is not None
            else t.nrows for t in parts)
        cols = {}
        for cname in names:
            datas, valids = [], []
            d0 = tables[0][cname].dtype
            for t in tables:
                c = t[cname]
                data = np.asarray(c.data)
                valid = (np.ones(len(data), bool) if c.valid is None
                         else np.asarray(c.valid))
                live = None if t.live is None else np.asarray(t.live)
                if live is not None:
                    data, valid = data[live], valid[live]
                if d0.is_string:
                    data = dt.dict_values(c.dict_id)[data]
                datas.append(data)
                valids.append(valid)
            arr = np.concatenate(datas)
            ok = np.concatenate(valids)
            cols[cname] = Column.from_numpy(
                arr, d0, valid=None if ok.all() else ok)
        self.session.register(self.table, Table(columns=cols))
        self.consumed.update(fresh)
        self.rows_loaded += new_rows
        from starrocks_tpu.utils.metrics import REGISTRY
        REGISTRY.inc("routine_load_rows_total", new_rows)
        return new_rows

    def start(self) -> None:
        """Background polling (the job-scheduler analog)."""
        if self._thread is not None:
            return

        def loop():
            while not self._stop.wait(self.interval_s):
                if self.state == "STOPPED":
                    return
                try:
                    self.poll_once()
                except Exception:               # noqa: BLE001 — job survives
                    from starrocks_tpu.utils.metrics import REGISTRY
                    REGISTRY.inc("routine_load_errors_total")

        self._thread = threading.Thread(target=loop, daemon=True,
                                        name=f"routine-load-{self.name}")
        self._thread.start()

    def pause(self) -> None:
        self.state = "PAUSED"

    def resume(self) -> None:
        if self.state != "STOPPED":
            self.state = "RUNNING"

    def stop(self) -> None:
        self.state = "STOPPED"
        self._stop.set()
