"""Column / Table: the engine's columnar batch, as JAX pytrees.

Analog of StarRocks' `Column` (be/src/column/column.h:41) and `Chunk`
(be/src/column/chunk.h:50), redesigned for XLA:

- A Column is a flat device array + optional validity mask. Nullability is a
  mask, not a wrapper class (StarRocks NullableColumn,
  be/src/column/nullable_column.h) — XLA fuses mask ops for free.
- A Table is an ordered dict of named Columns plus an optional `live` row
  mask. Filters *mark* rows dead instead of compacting
  (StarRocks' `Column::filter_range`, column.h:352, compacts; on TPU static
  shapes win, so we keep selection masks and compact only at result
  extraction or before a shuffle).
- Both are registered pytrees so whole tables flow through jit / shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from starrocks_tpu.column import dtypes
from starrocks_tpu.column.dtypes import DataType, TypeKind


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Column:
    data: jax.Array                  # (N,) storage-typed
    valid: Optional[jax.Array]       # (N,) bool, None => all valid
    dtype: DataType                  # static
    dict_id: int = 0                 # static; >0 for STRING columns
    vrange: Optional[tuple] = None   # static (lo, hi) value bounds if known
                                     # (zone-map analog: drives dense group-by
                                     # and narrow-int kernel specialization)

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.data, self.valid), (self.dtype, self.dict_id, self.vrange)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, valid = children
        dtype, dict_id, vrange = aux
        return cls(data=data, valid=valid, dtype=dtype, dict_id=dict_id,
                   vrange=vrange)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_numpy(
        cls,
        arr: np.ndarray,
        dtype: DataType,
        valid: Optional[np.ndarray] = None,
        dict_id: int = 0,
    ) -> "Column":
        if dtype.is_string and dict_id == 0:
            codes, dict_id = dtypes.dict_encode(arr)
            arr = codes
        np_arr = np.asarray(arr, dtype.np_dtype)
        vrange = None
        if dtype.is_string:
            vrange = (0, max(len(dtypes.dict_values(dict_id)) - 1, 0))
        elif np_arr.dtype.kind in "iu" and np_arr.size:
            vrange = (int(np_arr.min()), int(np_arr.max()))
        data = jnp.asarray(np_arr)
        v = None if valid is None else jnp.asarray(valid, jnp.bool_)
        return cls(data=data, valid=v, dtype=dtype, dict_id=dict_id, vrange=vrange)

    # -- accessors ---------------------------------------------------------
    @property
    def nrows(self) -> int:
        return self.data.shape[0]

    def validity(self) -> jax.Array:
        """Always-materialized validity mask."""
        if self.valid is None:
            return jnp.ones(self.data.shape, jnp.bool_)
        return self.valid

    def with_data(self, data, valid="keep") -> "Column":
        v = self.valid if valid == "keep" else valid
        return Column(data=data, valid=v, dtype=self.dtype, dict_id=self.dict_id)

    def gather(self, idx: jax.Array, idx_valid: Optional[jax.Array] = None) -> "Column":
        """Row gather (StarRocks Column::append_selective, column.h:210).

        idx may contain arbitrary in-range ints; rows where idx_valid is
        False become NULL.
        """
        safe = jnp.clip(idx, 0, self.nrows - 1)
        data = self.data[safe]
        valid = None if self.valid is None else self.valid[safe]
        if idx_valid is not None:
            valid = idx_valid if valid is None else (valid & idx_valid)
        return Column(data=data, valid=valid, dtype=self.dtype,
                      dict_id=self.dict_id, vrange=self.vrange)

    # -- host conversion ---------------------------------------------------
    def to_numpy(self, mask: Optional[np.ndarray] = None):
        """Decode to a host numpy array (strings decoded, decimals -> float)."""
        data = np.asarray(self.data)
        valid = None if self.valid is None else np.asarray(self.valid)
        if mask is not None:
            data = data[mask]
            valid = None if valid is None else valid[mask]
        if self.dtype.is_string:
            out = dtypes.dict_decode(data, self.dict_id).astype(object)
        elif self.dtype.is_decimal:
            out = data.astype(np.float64) / (10 ** self.dtype.scale)
        elif self.dtype.kind is TypeKind.DATE:
            out = data.astype("datetime64[D]")
        else:
            out = data
        if valid is not None and not valid.all():
            out = np.asarray(out, dtype=object)
            out[~valid] = None
        return out


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Table:
    columns: dict[str, Column]
    live: Optional[jax.Array] = None   # (N,) bool selection mask; None => all

    def tree_flatten(self):
        names = tuple(self.columns.keys())
        return (tuple(self.columns.values()), self.live), names

    @classmethod
    def tree_unflatten(cls, names, children):
        cols, live = children
        return cls(columns=dict(zip(names, cols)), live=live)

    # ----------------------------------------------------------------------
    @property
    def nrows(self) -> int:
        return next(iter(self.columns.values())).nrows

    def __getitem__(self, name: str) -> Column:
        return self.columns[name]

    def __contains__(self, name: str) -> bool:
        return name in self.columns

    def column_names(self):
        return list(self.columns.keys())

    def live_mask(self) -> jax.Array:
        if self.live is None:
            return jnp.ones((self.nrows,), jnp.bool_)
        return self.live

    def num_live(self) -> jax.Array:
        if self.live is None:
            return jnp.asarray(self.nrows, jnp.int32)
        return jnp.sum(self.live.astype(jnp.int32))

    def with_live(self, live: Optional[jax.Array]) -> "Table":
        return Table(columns=self.columns, live=live)

    def filter(self, mask: jax.Array) -> "Table":
        """AND a predicate mask into the selection (no compaction)."""
        live = mask if self.live is None else (self.live & mask)
        return Table(columns=self.columns, live=live)

    def select(self, names: list[str]) -> "Table":
        return Table(columns={n: self.columns[n] for n in names}, live=self.live)

    def with_column(self, name: str, col: Column) -> "Table":
        cols = dict(self.columns)
        cols[name] = col
        return Table(columns=cols, live=self.live)

    def rename(self, mapping: dict[str, str]) -> "Table":
        cols = {mapping.get(n, n): c for n, c in self.columns.items()}
        return Table(columns=cols, live=self.live)

    def gather(self, idx: jax.Array, idx_valid: Optional[jax.Array] = None) -> "Table":
        """Row gather of the WHOLE table as ONE stacked (N, lanes) uint64
        gather. Measured on v5e: XLA lowers each 1-D gather to ~15ns/index
        regardless of table size (~125ms for 8M rows), and k separate
        column gathers cost k times that — while a (N, k) row gather costs
        one index walk with ~27ms per added lane. Every column's data is
        packed to a u64 lane (ints sign-wrap; floats via ops/float_bits so
        no 64-bit float bitcast is needed); all validity bits and the live
        mask share bit-packed flag lanes. This is the engine's single
        data-movement primitive — compaction, sort payload application and
        join carries all funnel through it."""
        safe = jnp.clip(idx, 0, self.nrows - 1)
        from starrocks_tpu.ops import float_bits

        lanes: list = []
        decode: list = []          # (name, kind, src Column)
        f64_bitcast = None
        for n, c in self.columns.items():
            d = c.data
            if d.dtype == jnp.float64:
                if f64_bitcast is None:
                    f64_bitcast = float_bits.f64_bitcast_ok()
                if f64_bitcast:
                    lanes.append(jax.lax.bitcast_convert_type(d, jnp.uint64))
                    decode.append((n, "f64b", c))
                else:
                    hi, lo = float_bits.split_pair(d)
                    u = (jax.lax.bitcast_convert_type(hi, jnp.uint32)
                         .astype(jnp.uint64) << jnp.uint64(32)) \
                        | jax.lax.bitcast_convert_type(lo, jnp.uint32
                                                       ).astype(jnp.uint64)
                    lanes.append(u)
                    decode.append((n, "f64p", c))
            elif d.dtype == jnp.float32:
                lanes.append(jax.lax.bitcast_convert_type(d, jnp.uint32)
                             .astype(jnp.uint64))
                decode.append((n, "f32", c))
            else:                   # ints / bools / dates / decimals
                lanes.append(d.astype(jnp.int64).astype(jnp.uint64))
                decode.append((n, "int", c))
        # flag lanes: every column's validity + the live mask, 64 bits each
        flags: list = [c.valid for c in self.columns.values()
                       if c.valid is not None]
        nvalid = len(flags)
        if self.live is not None:
            flags.append(self.live)
        for base in range(0, len(flags), 64):
            lane = jnp.zeros(self.nrows, jnp.uint64)
            for i, f in enumerate(flags[base:base + 64]):
                lane = lane | (f.astype(jnp.uint64) << jnp.uint64(i))
            lanes.append(lane)
        g = _gather_lanes_stacked(lanes, safe, self.nrows)

        def fbit(i):
            lane = g[:, len(decode) + i // 64]
            return ((lane >> jnp.uint64(i % 64)) & jnp.uint64(1)) != 0

        cols = {}
        vi = 0
        for j, (n, kind, c) in enumerate(decode):
            u = g[:, j]
            if kind == "f64b":
                data = jax.lax.bitcast_convert_type(u, jnp.float64)
            elif kind == "f64p":
                hi = jax.lax.bitcast_convert_type(
                    (u >> jnp.uint64(32)).astype(jnp.uint32), jnp.float32)
                lo = jax.lax.bitcast_convert_type(
                    u.astype(jnp.uint32), jnp.float32)
                data = hi.astype(jnp.float64) + lo.astype(jnp.float64)
            elif kind == "f32":
                data = jax.lax.bitcast_convert_type(
                    u.astype(jnp.uint32), jnp.float32)
            else:
                data = u.astype(jnp.int64).astype(c.data.dtype)
            valid = None
            if c.valid is not None:
                valid = fbit(vi)
                vi += 1
            if idx_valid is not None:
                valid = idx_valid if valid is None else (valid & idx_valid)
            cols[n] = Column(data, valid, c.dtype, c.dict_id, c.vrange)
        live = None
        if self.live is not None:
            live = fbit(nvalid)
            if idx_valid is not None:
                live = live & idx_valid
        elif idx_valid is not None:
            live = idx_valid
        return Table(columns=cols, live=live)

    # -- host conversion ---------------------------------------------------
    @classmethod
    def from_pydict(cls, data: dict[str, tuple[np.ndarray, DataType]]) -> "Table":
        return cls(
            columns={n: Column.from_numpy(arr, dt) for n, (arr, dt) in data.items()}
        )

    def to_pandas(self, limit: Optional[int] = None):
        """Compact live rows to host and decode (result extraction).

        Compaction happens ON DEVICE (stable partition of live rows to the
        front via the packed sort), so only the live rows cross the
        device->host link — the analog of the result sink sending only real
        rows (be/src/runtime/buffer_control_block.h). All columns and
        validity masks then pack into ONE uint8 buffer on device and cross
        the link in ONE transfer: each device->host pull through the axon
        relay costs a ~25ms round trip, so per-array pulls dominated query
        wall time for wide results.
        """
        import pandas as pd
        from starrocks_tpu.utils.dispatch import EXEC_LOCK

        with EXEC_LOCK:
            return self._to_pandas_locked(limit, pd)

    def _to_pandas_locked(self, limit, pd):
        if self.live is None:
            compacted, k = self, self.nrows
        else:
            compacted, count = _compact_live(self)
            k = int(count)
        if limit is not None:
            k = min(k, limit)
        if k == 0:
            return pd.DataFrame({
                n: Column(c.data[:0], None, c.dtype, c.dict_id).to_numpy(None)
                for n, c in compacted.columns.items()})
        m = min(compacted.nrows, max(1, 1 << (k - 1).bit_length()))
        if _pack_supported():
            buf = np.asarray(_pack_to_bytes(compacted, m))
            return _decode_packed(buf, result_spec(compacted), m, k)
        out = {}
        for n, c in compacted.columns.items():
            head = Column(c.data[:k],
                          None if c.valid is None else c.valid[:k],
                          c.dtype, c.dict_id, c.vrange)
            out[n] = head.to_numpy(None)
        return pd.DataFrame(out)


from functools import partial

_MXU_GATHER = False     # set by starrocks_tpu/__init__ after probing


def _gather_lanes_stacked(lanes, safe, nrows):
    """(N_out, L) u64 row gather of the stacked lanes. Small source tables
    on MXU-capable backends route through the one-hot matmul kernel
    (ops/mxu_gather.py — measured ~3-25x the XLA gather for dimension-table
    sized sources); everything else is the plain stacked gather."""
    from starrocks_tpu.config import CONFIG
    stacked = jnp.stack(lanes, axis=1)
    if (_MXU_GATHER and CONFIG.enable_mxu_gather
            and nrows <= 8192 and safe.shape[0] >= (1 << 17)):
        from starrocks_tpu.ops import mxu_gather
        L = stacked.shape[1]
        k = mxu_gather.LANES_PER_CALL
        parts = [mxu_gather.gather_lanes(stacked[:, i:i + k],
                                         safe.astype(jnp.int32))
                 for i in range(0, L, k)]
        return jnp.concatenate(parts, axis=1)
    return stacked[safe, :]


@partial(jax.jit, static_argnums=1)
def _pack_to_bytes(table: Table, m: int) -> jax.Array:
    """Concatenate every column's first m rows (data bitcast to bytes +
    validity as bytes) into one uint8 buffer — result extraction then costs
    ONE device->host transfer (the result-batch serialization analog,
    mysql_result_writer.cpp, except the 'serialization' is a bitcast).

    float64 columns on backends whose AOT compiler rejects 64-bit float
    bitcasts (ops/float_bits.py) pack as their (hi, lo) float32 pair —
    same byte count, so the host-side offsets are layout-independent."""
    from starrocks_tpu.ops import float_bits
    parts = []
    for c in table.columns.values():
        d = c.data[:m]
        if d.dtype == jnp.bool_:
            parts.append(d.astype(jnp.uint8))
        elif d.dtype == jnp.float64 and not float_bits.f64_bitcast_ok():
            hi, lo = float_bits.split_pair(d)
            parts.append(
                jax.lax.bitcast_convert_type(hi, jnp.uint8).reshape(-1))
            parts.append(
                jax.lax.bitcast_convert_type(lo, jnp.uint8).reshape(-1))
        else:
            parts.append(
                jax.lax.bitcast_convert_type(d, jnp.uint8).reshape(-1))
        if c.valid is not None:
            parts.append(c.valid[:m].astype(jnp.uint8))
    return jnp.concatenate(parts)


def result_spec(table: Table):
    """Host-side result schema: everything `_decode_packed` needs to turn a
    packed byte buffer back into a DataFrame. Shapes/dtypes/dictionaries
    are static, so this can be captured at TRACE time — which is what lets
    a whole-query frozen module return only a byte buffer (exec/plan.py
    execute_df) with no device-side Table surviving to the host."""
    return [(n, np.dtype(c.data.dtype), c.valid is not None, c.dtype,
             c.dict_id, c.vrange) for n, c in table.columns.items()]


def _decode_packed(buf: np.ndarray, spec, m: int, k: int):
    """Decode a `_pack_to_bytes` buffer of m packed rows into a DataFrame
    of the first k rows (k = live count; m = pow2-padded transfer rows).

    The frame is built with an explicit object-dtype column Index: pandas
    3's default arrow-backed string Index construction
    (ArrowStringArray._from_sequence) segfaults under multi-threaded use in
    this environment, and result decode runs on server threads."""
    import pandas as pd
    from starrocks_tpu.ops import float_bits
    pair_f64 = not float_bits.f64_bitcast_ok()
    out = {}
    off = 0
    for n, ndt, has_valid, dtype, dict_id, vrange in spec:
        nb = m * ndt.itemsize
        raw = buf[off:off + nb].tobytes()
        if ndt == np.float64 and pair_f64:
            hi = np.frombuffer(raw[:m * 4], np.float32)
            lo = np.frombuffer(raw[m * 4:], np.float32)
            data = float_bits.merge_pair_np(hi, lo)[:k]
        else:
            data = np.frombuffer(raw, dtype=ndt)[:k]
        off += nb
        valid = None
        if has_valid:
            valid = buf[off:off + m][:k].astype(bool)
            off += m
        out[n] = Column(data, valid, dtype, dict_id, vrange).to_numpy(None)
    return pd.DataFrame(out, columns=pd.Index(list(out), dtype=object))


def empty_frame(spec):
    """Zero-row DataFrame with the spec's decoded column dtypes."""
    import pandas as pd
    return pd.DataFrame({
        n: Column(np.empty(0, ndt), None, dtype, dict_id).to_numpy(None)
        for n, ndt, _hv, dtype, dict_id, _vr in spec})


_PACK_OK = None


def _pack_supported() -> bool:
    """One-time self-check that the backend's bitcast byte order matches
    numpy's on this host (guards against a backend where bitcast_convert
    lays bytes out big-endian); mismatch falls back to per-array pulls.
    Also exercises the float64 path (pair-packed on backends without f64
    bitcasts, ops/float_bits.py) against the stored device values."""
    global _PACK_OK
    if _PACK_OK is None:
        try:
            from starrocks_tpu.ops import float_bits
            pair = not float_bits.f64_bitcast_ok()
            ivals = np.asarray([0x0102030405060708, -42], np.int64)
            fdev = jnp.asarray(np.asarray([1.5, -3.25e10], np.float64))
            fvals = np.asarray(fdev)      # as stored (may be pair-rounded)
            t = Table(columns={
                "x": Column(jnp.asarray(ivals), None, dtypes.INT64),
                "f": Column(fdev, None, dtypes.FLOAT64)})
            buf = np.asarray(_pack_to_bytes(t, 2))
            back = np.frombuffer(buf[:16].tobytes(), np.int64)
            if pair:
                hi = np.frombuffer(buf[16:24].tobytes(), np.float32)
                lo = np.frombuffer(buf[24:32].tobytes(), np.float32)
                fback = float_bits.merge_pair_np(hi, lo)
            else:
                fback = np.frombuffer(buf[16:32].tobytes(), np.float64)
            _PACK_OK = bool((back == ivals).all() and (fback == fvals).all())
        except Exception:
            _PACK_OK = False
    return _PACK_OK


@jax.jit
def _compact_live(table: Table):
    """Stable-partition live rows to the front; returns (Table, live count)."""
    from starrocks_tpu.ops import fast_sort as fs

    live = table.live_mask()
    perm = fs.argsort_packed(
        jnp.where(live, jnp.uint64(0), jnp.uint64(1)), 1)
    out = table.with_live(None).gather(perm)
    return out, jnp.sum(live.astype(jnp.int32))


def compact_table(table: Table, m: int) -> Table:
    """Stable-partition live rows to the front and truncate to `m` rows
    (caller guarantees live count <= m). The engine's mask-based filters
    never shrink arrays; this is the explicit shrink point the eager
    executor inserts between operators when a filter proved selective —
    the analog of StarRocks compacting chunks at operator boundaries
    (Column::filter_range, be/src/column/column.h:352), paid only when
    the downstream shape reduction is worth one device pass."""
    from starrocks_tpu.ops import fast_sort as fs

    live = table.live_mask()
    perm = fs.argsort_packed(
        jnp.where(live, jnp.uint64(0), jnp.uint64(1)), 1)
    return table.gather(perm[:m])


def concat_tables(a: Table, b: Table) -> Table:
    """Row-concatenate two tables with identical column names (positional
    dtype coercion to the left side, like SetOp's UNION ALL kernel)."""
    cols = {}
    for name in a.column_names():
        ca, cb = a[name], b[name]
        data = jnp.concatenate([ca.data, cb.data.astype(ca.data.dtype)])
        valid = (None if ca.valid is None and cb.valid is None else
                 jnp.concatenate([ca.validity(), cb.validity()]))
        cols[name] = Column(data, valid, ca.dtype, ca.dict_id)
    live = jnp.concatenate([a.live_mask(), b.live_mask()])
    return Table(columns=cols, live=live)
