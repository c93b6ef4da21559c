"""CSV ingest with a native C++ fast path and schema inference.

Analog of the reference's CSV load path (be/src/formats/csv/csv_reader.cpp,
be/src/exec/csv_scanner.cpp; FE stream/broker load front ends). The parse
kernel lives in native/csv_parser.cpp (built on demand with g++, cached next
to the source): RFC-4180 quoting, configurable delimiter, optional header,
empty-unquoted-field NULLs. Python orchestrates schema handling, string
dictionary encoding, and Table construction; a pure-Python csv-module
fallback covers compiler-less environments.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None

_COL_INT64, _COL_DECIMAL, _COL_DATE, _COL_STRING, _COL_FLOAT64 = 0, 1, 2, 3, 4


def _type_code(d: dt.DataType) -> tuple[int, int]:
    if d.is_string:
        return _COL_STRING, 0
    if d.is_decimal:
        return _COL_DECIMAL, d.scale
    if d.kind is dt.TypeKind.DATE:
        return _COL_DATE, 0
    if d.kind is dt.TypeKind.FLOAT64:
        return _COL_FLOAT64, 0
    return _COL_INT64, 0


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    from starrocks_tpu.utils.native_build import build_shared
    lib = ctypes.CDLL(str(build_shared(_NATIVE_DIR / "csv_parser.cpp",
                                       "libcsvparse")))
    lib.csv_read.restype = ctypes.c_void_p
    lib.csv_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.csv_free.argtypes = [ctypes.c_void_p]
    lib.csv_count_rows.restype = ctypes.c_int64
    lib.csv_count_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int32]
    lib.csv_parse.restype = ctypes.c_int64
    lib.csv_parse.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_char, ctypes.c_int32]
    _LIB = lib
    return lib


def _header_names(path: str, delimiter: str) -> list[str]:
    import csv as _csv
    with open(path, newline="") as f:
        return next(_csv.reader(f, delimiter=delimiter))


_DATE_SHAPE = None


def _looks_date(s: str) -> bool:
    return (len(s) == 10 and s[4] == "-" and s[7] == "-"
            and s[:4].isdigit() and s[5:7].isdigit() and s[8:10].isdigit())


def _looks_int(s: str) -> bool:
    t = s[1:] if s[:1] in "+-" else s
    return t.isdigit() and len(t) > 0


def _looks_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def infer_schema(path: str, delimiter: str = ",", header: bool = True,
                 sample_rows: int = 1000) -> dict[str, dt.DataType]:
    """Type inference from a sample: INT64 -> FLOAT64 -> DATE -> STRING
    (the narrowest type every sampled non-empty value fits)."""
    import csv as _csv
    with open(path, newline="") as f:
        r = _csv.reader(f, delimiter=delimiter)
        first = next(r)
        names = first if header else [f"c{i}" for i in range(len(first))]
        rows = []
        if not header:
            rows.append(first)
        for row in r:
            rows.append(row)
            if len(rows) >= sample_rows:
                break
    schema = {}
    for i, name in enumerate(names):
        vals = [row[i] for row in rows if i < len(row) and row[i] != ""]
        if vals and all(_looks_int(v) for v in vals):
            schema[name] = dt.INT64
        elif vals and all(_looks_date(v) for v in vals):
            schema[name] = dt.DATE
        elif vals and all(_looks_float(v) for v in vals):
            schema[name] = dt.FLOAT64
        else:
            schema[name] = dt.STRING
    return schema


def parse_csv(path: str, schema: dict[str, dt.DataType],
              delimiter: str = ",", header: bool = True):
    """Parse into (numpy columns, validity arrays) via the native kernel."""
    lib = _load_native()
    size = ctypes.c_int64()
    buf = lib.csv_read(path.encode(), ctypes.byref(size))
    if not buf:
        raise IOError(f"cannot read {path}")
    try:
        nrows = lib.csv_count_rows(buf, size.value, 1 if header else 0)
        ncols = len(schema)
        types = (ctypes.c_int32 * ncols)()
        scales = (ctypes.c_int32 * ncols)()
        outs = (ctypes.c_void_p * ncols)()
        lens = (ctypes.c_void_p * ncols)()
        vals = (ctypes.c_void_p * ncols)()
        arrays, len_arrays, val_arrays = {}, {}, {}
        for i, (name, d) in enumerate(schema.items()):
            tc, sc = _type_code(d)
            types[i], scales[i] = tc, sc
            if tc == _COL_DATE:
                a = np.empty(nrows, np.int32)
            elif tc == _COL_FLOAT64:
                a = np.empty(nrows, np.float64)
            else:
                a = np.empty(nrows, np.int64)
            arrays[name] = a
            outs[i] = a.ctypes.data_as(ctypes.c_void_p)
            if tc == _COL_STRING:
                la = np.empty(nrows, np.int64)
                len_arrays[name] = la
                lens[i] = la.ctypes.data_as(ctypes.c_void_p)
            va = np.empty(nrows, np.uint8)
            val_arrays[name] = va
            vals[i] = va.ctypes.data_as(ctypes.c_void_p)
        parsed = lib.csv_parse(buf, size.value, ncols, types, scales,
                               outs, lens, vals,
                               delimiter.encode()[0:1], 1 if header else 0)
        if parsed != nrows:
            raise ValueError(f"{path}: parsed {parsed} rows, expected {nrows}")
        raw = ctypes.string_at(buf, size.value)
        cols, valids = {}, {}
        for name, d in schema.items():
            if d.is_string:
                offs, ls = arrays[name], len_arrays[name]
                vv = np.empty(nrows, object)
                for r in range(nrows):
                    s = raw[offs[r]:offs[r] + ls[r]].decode()
                    vv[r] = s.replace('""', '"') if '""' in s else s
                cols[name] = vv
            else:
                cols[name] = arrays[name]
            valids[name] = val_arrays[name].astype(bool)
        return cols, valids
    finally:
        lib.csv_free(buf)


def _parse_csv_python(path, schema, delimiter, header):
    """Pure-Python fallback (csv module) with identical semantics."""
    import csv as _csv
    with open(path, newline="") as f:
        r = _csv.reader(f, delimiter=delimiter)
        if header:
            next(r)
        rows = [row for row in r if row]
    n = len(rows)
    cols, valids = {}, {}
    for i, (name, d) in enumerate(schema.items()):
        raw = [row[i] if i < len(row) else "" for row in rows]
        ok = np.asarray([v != "" for v in raw], bool)
        if d.is_string:
            cols[name] = np.asarray(raw, object)
        elif d.kind is dt.TypeKind.DATE:
            a = np.zeros(n, np.int32)
            for j, v in enumerate(raw):
                if v:
                    a[j] = (np.datetime64(v) - np.datetime64("1970-01-01")
                            ).astype(int)
            cols[name] = a
        elif d.kind is dt.TypeKind.FLOAT64:
            cols[name] = np.asarray([float(v) if v else 0.0 for v in raw])
        elif d.is_decimal:
            s = 10 ** d.scale
            cols[name] = np.asarray(
                [int(round(float(v) * s)) if v else 0 for v in raw], np.int64)
        else:
            cols[name] = np.asarray([int(v) if v else 0 for v in raw],
                                    np.int64)
        valids[name] = ok
    return cols, valids


def read_csv(path: str, schema: Optional[dict[str, dt.DataType]] = None,
             delimiter: str = ",", header: bool = True,
             nullable: bool = True) -> Table:
    """Load a CSV file into an engine Table. schema=None infers types from
    a sample (header names become column names)."""
    if schema is None:
        schema = infer_schema(path, delimiter, header)
    try:
        cols, valids = parse_csv(path, schema, delimiter, header)
    except (OSError, subprocess.CalledProcessError):
        cols, valids = _parse_csv_python(path, schema, delimiter, header)
    out = {}
    for name, d in schema.items():
        v = valids[name]
        valid = None if (not nullable or v.all()) else v
        out[name] = Column.from_numpy(cols[name], d, valid=valid)
    return Table(columns=out)
