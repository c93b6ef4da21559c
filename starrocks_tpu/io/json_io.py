"""JSON-lines (ndjson) ingest.

Analog of the reference's JSON load path (be/src/exec/json_scanner.cpp,
be/src/formats/json/): one JSON object per line, schema inferred from a
sample or supplied. Missing keys / explicit nulls become NULL. Nested
objects/arrays are stored as their JSON text (the reference similarly
returns unexpanded JSON as strings unless paths are given).

This is the convenience tier: CSV (native C++ kernel) and parquet are the
bulk-load fast paths; ndjson parses with the stdlib json module.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table


def _scan_rows(path: str, limit: Optional[int] = None):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rows.append(json.loads(line))
            if limit is not None and len(rows) >= limit:
                break
    return rows


def infer_schema(rows: list[dict]) -> dict[str, dt.DataType]:
    keys: list[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    schema = {}
    for k in keys:
        vals = [r[k] for r in rows if r.get(k) is not None]
        if vals and all(isinstance(v, bool) for v in vals):
            schema[k] = dt.INT64
        elif vals and all(isinstance(v, int) and not isinstance(v, bool)
                          for v in vals):
            schema[k] = dt.INT64
        elif vals and all(isinstance(v, (int, float))
                          and not isinstance(v, bool) for v in vals):
            schema[k] = dt.FLOAT64
        else:
            schema[k] = dt.STRING
    return schema


def read_json(path: str,
              schema: Optional[dict[str, dt.DataType]] = None) -> Table:
    """Load an ndjson file into an engine Table."""
    rows = _scan_rows(path)
    if schema is None:
        schema = infer_schema(rows[:1000])
    n = len(rows)
    cols = {}
    for name, d in schema.items():
        ok = np.asarray([r.get(name) is not None for r in rows], bool)
        if d.is_string:
            vals = np.empty(n, object)
            for i, r in enumerate(rows):
                v = r.get(name)
                if v is None:
                    vals[i] = ""
                elif isinstance(v, str):
                    vals[i] = v
                else:           # nested object/array -> JSON text
                    vals[i] = json.dumps(v)
        elif d.kind is dt.TypeKind.FLOAT64:
            vals = np.asarray([float(r.get(name) or 0.0) for r in rows])
        elif d.kind is dt.TypeKind.DATE:
            vals = np.asarray(
                [int((np.datetime64(r[name]) - np.datetime64("1970-01-01"))
                     .astype(int)) if r.get(name) is not None else 0
                 for r in rows], np.int64)
        elif d.is_decimal:
            s = 10 ** d.scale
            vals = np.asarray(
                [int(round(float(r.get(name) or 0) * s)) for r in rows],
                np.int64)
        else:
            vals = np.asarray([int(r.get(name) or 0) for r in rows], np.int64)
        cols[name] = Column.from_numpy(vals, d,
                                       valid=None if ok.all() else ok)
    return Table(columns=cols)
