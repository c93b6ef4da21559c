"""Catalog edit-log journal: durable metadata mutation + replay recovery.

The reference FE persists every metadata mutation to a replicated bdbje
journal (fe/fe-core/.../journal/JournalEntity.java, EditLog.java) and
periodically folds it into an image via the checkpoint daemon
(fe/.../master/Checkpoint.java); recovery = newest image + replay of the
journal suffix. The TPU engine's durable metadata is exactly the catalog
(tables are immutable bulk loads, so the image IS the data checkpoint):

  image      = Session.save_catalog (parquet per table + manifest.json,
               now including the auth registries)
  edit log   = one fsync'd JSON line per catalog-mutating SQL statement
               (DDL, grants, row mutations, txn boundaries)
  recovery   = Session.recover(dir): load image, replay journal lines in
               LSN order under each statement's recorded user
  checkpoint = Session.checkpoint(): fold — rewrite image, truncate log

Statements are the journal unit (the reference journals typed entities;
here every mutation is a deterministic SQL statement over immutable
inputs, so replaying text reproduces state bit-for-bit). Programmatic
bulk loads (`Session.register` from host arrays) carry data the log
cannot reproduce, so they trigger an immediate checkpoint instead.

A torn final line (crash mid-append) is detected by JSON parse failure
and dropped — the statement was not acknowledged as durable.
"""

import json
import os


class CatalogJournal:
    def __init__(self, dirpath: str):
        self.dir = dirpath
        self.image_dir = os.path.join(dirpath, "image")
        self.log_path = os.path.join(dirpath, "journal.jsonl")
        self._fh = None
        self.lsn = 0

    # -- edit log --------------------------------------------------------
    def open(self, truncate: bool = False) -> None:
        os.makedirs(self.dir, exist_ok=True)
        mode = "w" if truncate else "a"
        if self._fh is not None:
            self._fh.close()
        self._fh = open(self.log_path, mode)
        if not truncate and os.path.exists(self.log_path):
            self.lsn = sum(1 for _ in self.read())

    def append(self, user: str, stmt: str) -> int:
        """Durably record one catalog-mutating statement; returns its LSN.
        fsync before acknowledging — the reference's journal write is
        synchronous for the same reason (an acked DDL must survive a
        crash)."""
        self.lsn += 1
        self._fh.write(json.dumps({"lsn": self.lsn, "user": user,
                                   "stmt": stmt}) + "\n")
        self._fh.flush()
        os.fsync(self._fh.fileno())
        return self.lsn

    def read(self):
        """Yield journal entries in order; a torn trailing line is dropped
        (it was never acknowledged)."""
        try:
            with open(self.log_path) as fh:
                lines = fh.readlines()
        except OSError:
            return
        for i, line in enumerate(lines):
            try:
                yield json.loads(line)
            except ValueError:
                if i == len(lines) - 1:
                    return          # torn tail from a mid-append crash
                raise

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
