"""TPC-H .tbl (dbgen output) loader with a native C++ fast path.

The parse kernel lives in native/tbl_parser.cpp (built on demand with g++,
cached next to the source). Python orchestrates: schema-driven type mapping,
string dictionary encoding from the (offset, length) pairs the parser emits,
and engine Table construction. Falls back to a pure-numpy parser when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.io.tpch import SCHEMAS

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB = None

_COL_INT64, _COL_DECIMAL, _COL_DATE, _COL_STRING = 0, 1, 2, 3


def _type_code(d: dt.DataType) -> tuple[int, int]:
    if d.is_string:
        return _COL_STRING, 0
    if d.is_decimal:
        return _COL_DECIMAL, d.scale
    if d.kind is dt.TypeKind.DATE:
        return _COL_DATE, 0
    return _COL_INT64, 0


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    from starrocks_tpu.utils.native_build import build_shared
    lib = ctypes.CDLL(str(build_shared(_NATIVE_DIR / "tbl_parser.cpp",
                                       "libtblparse")))
    lib.tbl_read.restype = ctypes.c_void_p
    lib.tbl_read.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.tbl_free.argtypes = [ctypes.c_void_p]
    lib.tbl_count_rows.restype = ctypes.c_int64
    lib.tbl_count_rows.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.tbl_parse.restype = ctypes.c_int64
    lib.tbl_parse.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p)]
    _LIB = lib
    return lib


def parse_tbl(path: str, schema: dict[str, dt.DataType]) -> dict[str, np.ndarray]:
    """Parse one .tbl file into numpy columns (strings dict-encoded later)."""
    lib = _load_native()
    size = ctypes.c_int64()
    buf = lib.tbl_read(path.encode(), ctypes.byref(size))
    if not buf:
        raise IOError(f"cannot read {path}")
    try:
        nrows = lib.tbl_count_rows(buf, size.value)
        ncols = len(schema)
        types = (ctypes.c_int32 * ncols)()
        scales = (ctypes.c_int32 * ncols)()
        outs = (ctypes.c_void_p * ncols)()
        lens = (ctypes.c_void_p * ncols)()
        arrays, len_arrays = {}, {}
        for i, (name, d) in enumerate(schema.items()):
            tc, sc = _type_code(d)
            types[i], scales[i] = tc, sc
            if tc == _COL_DATE:
                a = np.empty(nrows, np.int32)
            else:
                a = np.empty(nrows, np.int64)
            arrays[name] = a
            outs[i] = a.ctypes.data_as(ctypes.c_void_p)
            if tc == _COL_STRING:
                la = np.empty(nrows, np.int64)
                len_arrays[name] = la
                lens[i] = la.ctypes.data_as(ctypes.c_void_p)
        parsed = lib.tbl_parse(buf, size.value, ncols, types, scales, outs, lens)
        if parsed != nrows:
            raise ValueError(f"{path}: parsed {parsed} rows, expected {nrows}")
        # materialize string columns from (offset, len) into the file image
        raw = ctypes.string_at(buf, size.value)
        out: dict[str, np.ndarray] = {}
        for name, d in schema.items():
            if d.is_string:
                offs, ls = arrays[name], len_arrays[name]
                vals = np.empty(nrows, object)
                for r in range(nrows):
                    vals[r] = raw[offs[r]:offs[r] + ls[r]].decode()
                out[name] = vals
            else:
                out[name] = arrays[name]
        return out
    finally:
        lib.tbl_free(buf)


def load_tpch_dir(path: str) -> dict[str, Table]:
    """Load a directory of dbgen .tbl files into engine Tables."""
    out = {}
    for tname, schema in SCHEMAS.items():
        f = os.path.join(path, f"{tname}.tbl")
        if not os.path.exists(f):
            continue
        cols = parse_tbl(f, schema)
        out[tname] = Table(columns={
            n: Column.from_numpy(cols[n], schema[n]) for n in schema})
    return out


def write_tbl(path: str, raw_cols: dict[str, np.ndarray],
              schema: dict[str, dt.DataType]):
    """Write generator output as a dbgen-format .tbl file (for tests)."""
    n = len(next(iter(raw_cols.values())))
    parts = []
    for name, d in schema.items():
        a = raw_cols[name]
        if d.is_string:
            parts.append(np.asarray(a, str))
        elif d.is_decimal:
            s = 10 ** d.scale
            av = np.asarray(a)
            ab = np.abs(av)
            ws = (ab // s).astype(str)
            ws = np.asarray(np.where(av < 0, np.char.add("-", ws), ws), str)
            parts.append(np.char.add(np.char.add(ws, "."),
                                     np.char.zfill((ab % s).astype(str), d.scale)))
        elif d.kind is dt.TypeKind.DATE:
            parts.append(np.datetime_as_string(
                np.asarray(a, "int64").astype("datetime64[D]"), unit="D"))
        else:
            parts.append(np.asarray(a).astype(str))
    rows = parts[0]
    for p in parts[1:]:
        rows = np.char.add(np.char.add(rows, "|"), p)
    with open(path, "w") as f:
        for r in rows:
            f.write(r + "|\n")
