"""Reader-writer lock for catalog mutation vs. query execution.

The reference serializes FE catalog mutation against readers with a global
metastore lock (fe/fe-core/.../server/LocalMetastore.java holds its own
read/write lock around create/drop/alter while query planning takes the
read side). Here the analog race is a background `register()` (routine
load, MV refresh) swapping `Session.tables` / catalog / mesh placements
while a foreground query plans or executes against them: without a fence a
query can plan against the new catalog and execute against old placements.

Writer-preferring: a waiting writer blocks new readers so continuous query
streams cannot starve an ingest. Write acquisition is reentrant in the same
thread (register() -> MV auto-refresh -> register()), and a writer thread
may take the read side (counts as nested write).
"""

from __future__ import annotations

import contextlib
import threading


class RWLock:
    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer: int | None = None
        self._depth = 0
        self._waiting_writers = 0

    def acquire_read(self) -> None:
        me = threading.get_ident()
        with self._cond:
            if self._writer == me:
                self._depth += 1
                return
            while self._writer is not None or self._waiting_writers:
                self._cond.wait()
            self._readers += 1

    def release_read(self) -> None:
        with self._cond:
            if self._writer == threading.get_ident():
                self._depth -= 1
                return
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def acquire_write(self) -> None:
        me = threading.get_ident()
        with self._cond:
            if self._writer == me:
                self._depth += 1
                return
            self._waiting_writers += 1
            while self._writer is not None or self._readers:
                self._cond.wait()
            self._waiting_writers -= 1
            self._writer = me
            self._depth = 1

    def release_write(self) -> None:
        with self._cond:
            self._depth -= 1
            if self._depth == 0:
                self._writer = None
                self._cond.notify_all()

    @contextlib.contextmanager
    def read(self):
        self.acquire_read()
        try:
            yield self
        finally:
            self.release_read()

    @contextlib.contextmanager
    def write(self):
        self.acquire_write()
        try:
            yield self
        finally:
            self.release_write()
