"""Distributed shuffle primitives (run inside shard_map).

Analog of StarRocks' exchange layer:
- `shuffle_by_key`  = HASH_PARTITIONED exchange (exchange_sink_operator.cpp:569-636):
  counting-sort rows into per-destination buckets (same structure as the
  reference's channel bucketing :595-610), then ONE lax.all_to_all over ICI —
  the bRPC transmit_chunk + SinkBuffer machinery collapses into a collective.
- `gather_rows`     = UNPARTITIONED/broadcast exchange (:508) via all_gather.
- Static shapes: each destination bucket has a fixed row capacity; the live
  mask is the `ChunkPB` row-count sideband (data.proto:84) and an overflow
  flag triggers a host retry with bigger buckets (backpressure analog).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.ops import hashing


def partition_ids(key_cols: Sequence[Column], ndev: int) -> jnp.ndarray:
    """Destination device per row (hash-partitioned, fnv/crc analog)."""
    h = hashing.hash_columns(key_cols, seed=0x5151)
    return (h % jnp.uint64(ndev)).astype(jnp.int32)


def shuffle_by_key(
    table: Table,
    key_names: Sequence[str],
    axis: str,
    bucket_cap: int,
):
    """Repartition rows so equal keys land on the same device.

    Returns (Table with ndev*bucket_cap rows + live mask, overflow flag).
    """
    ndev = lax.axis_size(axis)
    n = table.nrows
    live = table.live_mask()
    dest = partition_ids([table[k] for k in key_names], ndev)
    dest = jnp.where(live, dest, ndev)  # dead rows to an out-of-band bucket

    # counting-sort row ids by destination (stable): position within bucket
    from starrocks_tpu.ops import fast_sort as fs
    order = fs.argsort_packed(dest.astype(jnp.uint64), fs._bl(ndev))
    sorted_dest = dest[order]
    # rank within each destination bucket
    pos_in_sorted = jnp.arange(n, dtype=jnp.int32)
    bucket_start = jnp.searchsorted(sorted_dest, jnp.arange(ndev + 1, dtype=jnp.int32),
                                    side="left").astype(jnp.int32)
    rank = pos_in_sorted - bucket_start[jnp.clip(sorted_dest, 0, ndev)]
    overflow = jnp.any((rank >= bucket_cap) & (sorted_dest < ndev))

    # scatter each row into out[dest, rank]; overflowing/dead rows dropped
    ok = (sorted_dest < ndev) & (rank < bucket_cap)
    flat_idx = jnp.where(ok, sorted_dest * bucket_cap + rank, ndev * bucket_cap)

    def place(data):
        out = jnp.zeros((ndev * bucket_cap,) + data.shape[1:], data.dtype)
        return out.at[flat_idx].set(data[order], mode="drop")

    sent_live = jnp.zeros((ndev * bucket_cap,), jnp.bool_).at[flat_idx].set(
        ok, mode="drop")

    cols = {}
    for name, c in table.columns.items():
        data = place(c.data)
        valid = None if c.valid is None else place(c.valid)
        cols[name] = Column(data, valid, c.dtype, c.dict_id)

    # the collective: rows for device d sit in [d*cap, (d+1)*cap)
    def exchange(x):
        y = x.reshape((ndev, bucket_cap) + x.shape[1:])
        y = lax.all_to_all(y, axis, split_axis=0, concat_axis=0, tiled=False)
        return y.reshape((ndev * bucket_cap,) + x.shape[1:])

    out_cols = {}
    for name, c in cols.items():
        data = exchange(c.data)
        valid = None if c.valid is None else exchange(c.valid)
        out_cols[name] = Column(data, valid, c.dtype, c.dict_id)
    out_live = exchange(sent_live)
    overflow = lax.psum(overflow.astype(jnp.int32), axis) > 0
    return Table(columns=out_cols, live=out_live), overflow


def gather_rows(table: Table, axis: str) -> Table:
    """Broadcast exchange: concatenate every device's rows (replicated out)."""
    def ag(x):
        return lax.all_gather(x, axis, axis=0, tiled=True)

    cols = {}
    for name, c in table.columns.items():
        cols[name] = Column(ag(c.data), None if c.valid is None else ag(c.valid),
                            c.dtype, c.dict_id)
    live = ag(table.live_mask())
    return Table(columns=cols, live=live)
