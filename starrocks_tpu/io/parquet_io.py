"""Parquet ingest / export via pyarrow.

Analog of the reference's parquet reader/writer (be/src/formats/parquet/,
group_reader + column_chunk_reader; file sink be/src/connector/
file_chunk_sink.h). TPU redesign: pyarrow does the page decoding on the
host; columns land as fixed-width numpy and upload as device arrays —
strings dictionary-encode at ingest (the global-dict trick), decimals map to
scaled int64, dates to int32 day numbers. Nulls become validity masks.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table


def read_parquet(path: str, columns: Optional[list[str]] = None) -> Table:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=columns)
    cols: dict[str, Column] = {}
    for name, chunked in zip(t.column_names, t.columns):
        arr = chunked.combine_chunks()
        cols[name] = _from_arrow(arr)
    return Table(columns=cols)


def _from_arrow(arr) -> Column:
    import pyarrow as pa
    import pyarrow.types as pt

    ty = arr.type
    nulls = arr.null_count > 0
    valid = None
    if nulls:
        valid = ~np.asarray(arr.is_null())
    if pt.is_dictionary(ty):
        arr = arr.cast(ty.value_type)
        ty = arr.type
    if pt.is_string(ty) or pt.is_large_string(ty):
        vals = arr.to_pandas().to_numpy(dtype=object)
        if nulls:
            vals = np.where(valid, vals, "")
        return Column.from_numpy(vals.astype(str), dt.STRING, valid=valid)
    if pt.is_decimal(ty):
        scale = ty.scale
        ints = np.array([int(v.scaleb(scale)) if v is not None else 0
                         for v in arr.to_pylist()], np.int64)
        return Column.from_numpy(ints, dt.DECIMAL(scale), valid=valid)
    if pt.is_date(ty):
        days = arr.cast(pa.date32()).to_pandas().to_numpy()
        days = days.astype("datetime64[D]").astype(np.int32)
        if nulls:
            days = np.where(valid, days, 0)
        return Column.from_numpy(days, dt.DATE, valid=valid)
    if pt.is_timestamp(ty):
        days = arr.to_pandas().to_numpy().astype("datetime64[D]").astype(np.int32)
        if nulls:
            days = np.where(valid, days, 0)
        return Column.from_numpy(days, dt.DATE, valid=valid)
    if pt.is_floating(ty):
        vals = arr.to_pandas().to_numpy(np.float64, na_value=0.0)
        return Column.from_numpy(vals, dt.FLOAT64, valid=valid)
    if pt.is_boolean(ty):
        vals = arr.to_pandas().to_numpy(np.bool_, na_value=False)
        return Column.from_numpy(vals, dt.BOOL, valid=valid)
    if pt.is_integer(ty):
        vals = arr.to_pandas().to_numpy(np.int64, na_value=0)
        out = dt.INT32 if ty.bit_width <= 32 else dt.INT64
        return Column.from_numpy(vals.astype(out.np_dtype), out, valid=valid)
    raise NotImplementedError(f"parquet type {ty}")


def write_parquet(table: Table, path: str) -> None:
    """Export a result Table (live rows, decoded) to a parquet file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = table.to_pandas()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
