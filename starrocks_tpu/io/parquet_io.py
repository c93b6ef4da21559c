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


def read_orc(path: str, columns: Optional[list[str]] = None) -> Table:
    """ORC ingest (be/src/formats/orc/ analog): pyarrow's ORC reader does
    stripe decoding host-side; conversion shares the parquet arrow→Table
    path (dict-encoded strings, scaled decimals, validity masks)."""
    from pyarrow import orc

    t = orc.ORCFile(path).read(columns=columns)
    cols: dict[str, Column] = {}
    for name, chunked in zip(t.column_names, t.columns):
        arr = chunked.combine_chunks()
        cols[name] = _from_arrow(arr)
    return Table(columns=cols)


def read_parquet_pipelined(path: str,
                           columns: Optional[list[str]] = None) -> Table:
    """Row-group-pipelined ingest: decode group i+1 on a worker thread while
    group i's arrays upload (JAX transfers are async — dispatching the
    device_put costs microseconds; the copy rides the relay/PCIe in the
    background). The IO/compute-overlap analog of the reference's async scan
    framework (P11, scan_operator.cpp:418 _trigger_next_scan + separate
    scan-IO executor).

    Strings buffer host-side (the global dictionary needs every value) and
    encode once at the end; numeric/date/decimal columns stream.
    """
    import concurrent.futures as cf

    import jax.numpy as jnp
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    ngroups = pf.num_row_groups
    if ngroups <= 1:
        return read_parquet(path, columns)

    def decode(i):
        t = pf.read_row_group(i, columns=columns)
        out = {}
        for name, chunked in zip(t.column_names, t.columns):
            arr = chunked.combine_chunks()
            c = _from_arrow_host(arr)
            out[name] = c
        return out

    chunks = []       # per group: {name: ("dev", jnp data, jnp valid, dtype)
    #                               or ("str", np obj, np valid)}
    with cf.ThreadPoolExecutor(max_workers=1) as ex:
        nxt = ex.submit(decode, 0)
        for i in range(ngroups):
            cur = nxt.result()
            if i + 1 < ngroups:
                nxt = ex.submit(decode, i + 1)     # overlap: decode ahead
            dev = {}
            for name, (kind, data, valid, dtype) in cur.items():
                if kind == "str":
                    dev[name] = (kind, data, valid, dtype)
                else:
                    dev[name] = (kind, jnp.asarray(data),
                                 None if valid is None else jnp.asarray(valid),
                                 dtype)            # async upload
            chunks.append(dev)

    cols: dict[str, Column] = {}
    for name in chunks[0]:
        kind = chunks[0][name][0]
        if kind == "str":
            vals = np.concatenate([c[name][1] for c in chunks])
            valids = [c[name][2] for c in chunks]
            valid = (None if all(v is None for v in valids) else
                     np.concatenate([np.ones(len(c[name][1]), bool)
                                     if v is None else v
                                     for c, v in zip(chunks, valids)]))
            cols[name] = Column.from_numpy(vals.astype(str), dt.STRING,
                                           valid=valid)
        else:
            data = jnp.concatenate([c[name][1] for c in chunks])
            valids = [c[name][2] for c in chunks]
            valid = (None if all(v is None for v in valids) else
                     jnp.concatenate([jnp.ones(c[name][1].shape[0], bool)
                                      if v is None else v
                                      for c, v in zip(chunks, valids)]))
            cols[name] = Column(data, valid, chunks[0][name][3])
    return Table(columns=cols)


def _from_arrow_host(arr):
    """Decode an arrow array to host parts: ("str", obj_array, valid, None)
    or ("num", np_array, valid, engine_dtype)."""
    c = _from_arrow(arr)
    if c.dtype.is_string:
        vals = np.asarray(dt.dict_values(c.dict_id))[np.asarray(c.data)]
        valid = None if c.valid is None else np.asarray(c.valid)
        return ("str", vals.astype(object), valid, None)
    return ("num", np.asarray(c.data),
            None if c.valid is None else np.asarray(c.valid), c.dtype)


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
