"""Avro object-container-file ingest (and export, for round-trip tests).

The reference ships a C++ Avro scanner + JNI reader for routine/broker
loads (be/src/exec/avro_scanner.cpp, be/src/formats/avro/); this engine's
analog decodes the Avro binary format directly into the columnar model:
strings dictionary-encode to int32 codes, decimals become fixed-point
int64, dates become int32 days — so downstream kernels see exactly the
same fixed-width device arrays as every other ingest path.

Supported schema surface (what the benchmark/lakehouse data actually
uses): a top-level record of primitive fields — null/boolean/int/long/
float/double/string/bytes, nullable via ["null", T] unions, and the
date(int) / decimal(bytes) logical types. Codecs: null and deflate
(stdlib zlib; snappy is not in this environment and raises a clear
error). Container layout per the public Avro 1.11 spec: magic Obj\\x01,
metadata map, 16-byte sync marker, then (count, byte-size, payload,
sync) blocks with zigzag-varint longs.
"""

import json
import struct
import zlib

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table

_MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- decode --
class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def long(self) -> int:
        """Zigzag varint (Avro int and long share the encoding)."""
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def double(self) -> float:
        (v,) = struct.unpack_from("<d", self.buf, self.pos)
        self.pos += 8
        return v

    def float_(self) -> float:
        (v,) = struct.unpack_from("<f", self.buf, self.pos)
        self.pos += 4
        return v

    def bool_(self) -> bool:
        v = self.buf[self.pos] == 1
        self.pos += 1
        return v


def _field_plan(ftype):
    """Normalize one field's schema to (kind, nullable, engine_dtype).
    kind is the Avro primitive driving the decoder."""
    nullable = False
    if isinstance(ftype, list):                   # union
        branches = [t for t in ftype if t != "null"]
        if len(branches) != 1 or len(branches) == len(ftype):
            raise NotImplementedError(f"avro union {ftype}")
        nullable = True
        ftype = branches[0]
    logical = None
    if isinstance(ftype, dict):
        logical = ftype.get("logicalType")
        scale = ftype.get("scale", 0)
        ftype_name = ftype["type"]
    else:
        ftype_name = ftype
        scale = 0
    if logical == "date" and ftype_name == "int":
        return ("int", nullable, dt.DATE)
    if logical == "decimal" and ftype_name in ("bytes", "fixed"):
        return ("decimal", nullable, dt.DECIMAL(scale))
    prim = {"int": dt.INT32, "long": dt.INT64, "double": dt.FLOAT64,
            "float": dt.FLOAT64, "string": dt.STRING, "boolean": dt.BOOL,
            "bytes": dt.STRING}
    if ftype_name in prim:
        return (ftype_name, nullable, prim[ftype_name])
    raise NotImplementedError(f"avro type {ftype!r}")


def read_avro(path: str) -> Table:
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    r = _Reader(data)
    r.pos = 4
    meta = {}
    while True:                                   # metadata map blocks
        n = r.long()
        if n == 0:
            break
        if n < 0:                                 # block with byte size
            r.long()
            n = -n
        for _ in range(n):
            k = r.bytes_().decode()
            meta[k] = r.bytes_()
    sync = data[r.pos:r.pos + 16]
    r.pos += 16

    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise NotImplementedError(
            f"avro codec {codec!r} (null/deflate supported)")
    if schema.get("type") != "record":
        raise NotImplementedError("top-level avro schema must be a record")
    fields = [(f["name"], *_field_plan(f["type"])) for f in schema["fields"]]

    vals = {name: [] for name, *_ in fields}
    valid = {name: [] for name, *_ in fields}
    while r.pos < len(data):
        count = r.long()
        size = r.long()
        payload = data[r.pos:r.pos + size]
        r.pos += size
        if data[r.pos:r.pos + 16] != sync:
            raise ValueError(f"{path}: bad sync marker (corrupt block)")
        r.pos += 16
        br = _Reader(zlib.decompress(payload, -15) if codec == "deflate"
                     else payload)
        for _ in range(count):
            for name, kind, nullable, d in fields:
                if nullable:
                    branch = br.long()            # 0 = null per ["null",T]
                    if branch == 0:
                        valid[name].append(False)
                        vals[name].append(None)
                        continue
                    valid[name].append(True)
                elif valid[name] is not None:
                    valid[name].append(True)
                if kind in ("int", "long"):
                    vals[name].append(br.long())
                elif kind == "double":
                    vals[name].append(br.double())
                elif kind == "float":
                    vals[name].append(br.float_())
                elif kind == "boolean":
                    vals[name].append(br.bool_())
                elif kind in ("string", "bytes"):
                    vals[name].append(br.bytes_().decode())
                elif kind == "decimal":
                    raw = br.bytes_()
                    vals[name].append(
                        int.from_bytes(raw, "big", signed=True))

    cols = {}
    for name, kind, nullable, d in fields:
        ok = np.asarray(valid[name], bool) if valid[name] else \
            np.ones(0, bool)
        v = vals[name]
        if d.is_string:
            arr = np.asarray([x if x is not None else "" for x in v],
                             dtype=object).astype(str)
        elif d is dt.FLOAT64:
            arr = np.asarray([x if x is not None else 0.0 for x in v],
                             np.float64)
        elif d is dt.BOOL:
            arr = np.asarray([bool(x) for x in v], np.bool_)
        else:
            arr = np.asarray([x if x is not None else 0 for x in v],
                             np.int64).astype(d.np_dtype)
        cols[name] = Column.from_numpy(
            arr, d, valid=None if ok.all() else ok)
    return Table(columns=cols)


# ---------------------------------------------------------------- encode --
def _zigzag(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_field(name: str, col: Column):
    d = col.dtype
    if d.is_string:
        t = "string"
    elif d is dt.FLOAT64:
        t = "double"
    elif d is dt.BOOL:
        t = "boolean"
    elif d is dt.DATE:
        t = {"type": "int", "logicalType": "date"}
    elif getattr(d, "scale", None):
        t = {"type": "bytes", "logicalType": "decimal",
             "precision": 38, "scale": d.scale}
    else:
        t = "long"
    if col.valid is not None:
        t = ["null", t]
    return {"name": name, "type": t}


def write_avro(table: Table, path: str, codec: str = "deflate") -> None:
    """Export a result Table as a single-block Avro container file."""
    import os

    live = None if table.live is None else np.asarray(table.live)
    host = {}
    for name, col in table.columns.items():
        data = np.asarray(col.data)
        ok = (np.ones(len(data), bool) if col.valid is None
              else np.asarray(col.valid))
        if live is not None:
            data, ok = data[live], ok[live]
        if col.dtype.is_string:
            data = np.asarray(dt.dict_values(col.dict_id))[data]
        host[name] = (col, data, ok)

    schema = {"type": "record", "name": "row",
              "fields": [_avro_field(n, c) for n, (c, _, _) in host.items()]}
    n = len(next(iter(host.values()))[1]) if host else 0
    body = bytearray()
    for i in range(n):
        for name, (col, data, ok) in host.items():
            if col.valid is not None:
                if not ok[i]:
                    body += _zigzag(0)
                    continue
                body += _zigzag(1)
            d = col.dtype
            if d.is_string:
                raw = str(data[i]).encode()
                body += _zigzag(len(raw)) + raw
            elif d is dt.FLOAT64:
                body += struct.pack("<d", float(data[i]))
            elif d is dt.BOOL:
                body += b"\x01" if data[i] else b"\x00"
            elif getattr(d, "scale", None):
                v = int(data[i])
                raw = v.to_bytes((v.bit_length() + 8) // 8 or 1, "big",
                                 signed=True)
                body += _zigzag(len(raw)) + raw
            else:
                body += _zigzag(int(data[i]))
    payload = (zlib.compress(bytes(body), 6)[2:-4] if codec == "deflate"
               else bytes(body))
    sync = os.urandom(16)
    out = bytearray(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    out += _zigzag(len(meta))
    for k, v in meta.items():
        out += _zigzag(len(k)) + k.encode() + _zigzag(len(v)) + v
    out += _zigzag(0) + sync
    out += _zigzag(n) + _zigzag(len(payload)) + payload + sync
    with open(path, "wb") as fh:
        fh.write(out)
