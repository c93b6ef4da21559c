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
    dest = partition_ids([table[k] for k in key_names], ndev)
    return _scatter_exchange(table, dest, axis, bucket_cap)


def shuffle_salted(
    probe: Table,
    build: Table,
    probe_keys: Sequence[str],
    build_keys: Sequence[str],
    axis: str,
    probe_cap: int,
    build_cap: int,
    salt: int,
):
    """Skew-safe repartition for a join (P13; the reference's skew-join
    hint + AdaptivePassthroughExchanger, hash_joiner.h:75 is_skew_join).

    A hot key floods one device under plain hash partitioning. Salting
    spreads it: probe row i goes to device (hash(key)*salt + i%salt) % ndev,
    build rows are replicated to ALL `salt` candidate devices, so every
    probe fragment of the hot key finds its matches locally. salt=1 is the
    plain shuffle; salt=ndev replicates the build everywhere.

    Returns ((probe', build'), overflow). Join locally afterwards.
    """
    ndev = lax.axis_size(axis)
    salt = max(1, min(salt, ndev))

    def dests(t: Table, keys, row_salt):
        h = hashing.hash_columns([t[k] for k in keys], seed=0x5151)
        return ((h * jnp.uint64(salt) + row_salt.astype(jnp.uint64))
                % jnp.uint64(ndev)).astype(jnp.int32)

    n = probe.nrows
    prow = jnp.arange(n, dtype=jnp.int32) % salt
    p_out, p_ovf = _scatter_exchange(
        probe, dests(probe, probe_keys, prow), axis, probe_cap)

    # build side: one copy per salt bucket (replicate-matching-rows, the
    # salted-join build fan-out)
    m = build.nrows
    reps = []
    for s in range(salt):
        srow = jnp.full((m,), s, jnp.int32)
        reps.append((build, dests(build, build_keys, srow)))
    bt = Table(
        columns={
            name: Column(
                jnp.concatenate([b[name].data for b, _ in reps]),
                None if build[name].valid is None else jnp.concatenate(
                    [b[name].validity() for b, _ in reps]),
                build[name].dtype, build[name].dict_id)
            for name in build.column_names()},
        live=jnp.concatenate([b.live_mask() for b, _ in reps]))
    bdest = jnp.concatenate([d for _, d in reps])
    b_out, b_ovf = _scatter_exchange(bt, bdest, axis, build_cap)
    return (p_out, b_out), (p_ovf | b_ovf)


def _scatter_exchange(table: Table, dest: jnp.ndarray, axis: str, cap: int):
    """Bucket rows by explicit destination and run one all_to_all (the
    shared tail of shuffle_by_key, exposed for salted/custom partitioners)."""
    ndev = lax.axis_size(axis)
    n = table.nrows
    live = table.live_mask()
    dest = jnp.where(live, dest, ndev)
    from starrocks_tpu.ops import fast_sort as fs
    order = fs.argsort_packed(dest.astype(jnp.uint64), fs._bl(ndev))
    sorted_dest = dest[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_dest,
                             jnp.arange(ndev + 1, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    rank = pos - start[jnp.clip(sorted_dest, 0, ndev)]
    overflow = jnp.any((rank >= cap) & (sorted_dest < ndev))
    ok = (sorted_dest < ndev) & (rank < cap)
    flat = jnp.where(ok, sorted_dest * cap + rank, ndev * cap)

    def place(data):
        out = jnp.zeros((ndev * cap,) + data.shape[1:], data.dtype)
        return out.at[flat].set(data[order], mode="drop")

    sent_live = jnp.zeros((ndev * cap,), jnp.bool_).at[flat].set(ok,
                                                                 mode="drop")

    def exchange(x):
        y = x.reshape((ndev, cap) + x.shape[1:])
        y = lax.all_to_all(y, axis, split_axis=0, concat_axis=0, tiled=False)
        return y.reshape((ndev * cap,) + x.shape[1:])

    out_cols = {}
    for name, c in table.columns.items():
        data = exchange(place(c.data))
        valid = None if c.valid is None else exchange(place(c.valid))
        out_cols[name] = Column(data, valid, c.dtype, c.dict_id)
    out_live = exchange(sent_live)
    overflow = lax.psum(overflow.astype(jnp.int32), axis) > 0
    return Table(columns=out_cols, live=out_live), overflow


def ring_shuffle_reduce(
    table: Table,
    key_names: Sequence[str],
    axis: str,
    bucket_cap: int,
    init_fn,
    step_fn,
):
    """Shuffle decomposed into ndev-1 ppermute steps with per-step compute
    (P12, exchange/compute overlap — the SinkBuffer in-flight-RPC analog,
    sink_buffer.h:82; same idea as collective-matmul pipelining).

    Rather than one all_to_all followed by a monolithic consume, each
    device's buckets travel the ring one hop per step; at every step the
    arriving buffer's bucket for THIS device merges into a local
    accumulator via `step_fn(acc, chunk_table)`. XLA overlaps the next
    ppermute's communication with the current step's compute (async
    collective permute).

    init_fn(own_chunk) -> acc; step_fn(acc, chunk) -> acc; returns acc.
    """
    ndev = lax.axis_size(axis)
    me = lax.axis_index(axis)
    n = table.nrows
    live = table.live_mask()
    dest = partition_ids([table[k] for k in key_names], ndev)
    dest = jnp.where(live, dest, ndev)

    from starrocks_tpu.ops import fast_sort as fs
    order = fs.argsort_packed(dest.astype(jnp.uint64), fs._bl(ndev))
    sorted_dest = dest[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    start = jnp.searchsorted(sorted_dest,
                             jnp.arange(ndev + 1, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    rank = pos - start[jnp.clip(sorted_dest, 0, ndev)]
    ok = (sorted_dest < ndev) & (rank < bucket_cap)
    overflow = jnp.any((rank >= bucket_cap) & (sorted_dest < ndev))
    flat = jnp.where(ok, sorted_dest * bucket_cap + rank, ndev * bucket_cap)

    def place(data):
        out = jnp.zeros((ndev * bucket_cap,) + data.shape[1:], data.dtype)
        return out.at[flat].set(data[order], mode="drop")

    bufs = {name: place(c.data).reshape((ndev, bucket_cap) + c.data.shape[1:])
            for name, c in table.columns.items()}
    valids = {name: (None if c.valid is None else
                     place(c.valid).reshape(ndev, bucket_cap))
              for name, c in table.columns.items()}
    blive = (jnp.zeros((ndev * bucket_cap,), jnp.bool_)
             .at[flat].set(ok, mode="drop").reshape(ndev, bucket_cap))

    def chunk_at(bufs, valids, blive, idx):
        cols = {}
        for name, c in table.columns.items():
            cols[name] = Column(bufs[name][idx],
                                None if valids[name] is None
                                else valids[name][idx],
                                c.dtype, c.dict_id)
        return Table(columns=cols, live=blive[idx])

    # step 0: own bucket
    acc = init_fn(chunk_at(bufs, valids, blive, me))
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]
    for s in range(1, ndev):
        bufs = {k: lax.ppermute(v, axis, perm) for k, v in bufs.items()}
        valids = {k: (None if v is None else lax.ppermute(v, axis, perm))
                  for k, v in valids.items()}
        blive = lax.ppermute(blive, axis, perm)
        # after s hops, the buffer now holding device (me-s)'s buckets; its
        # bucket [me] is data destined for us
        acc = step_fn(acc, chunk_at(bufs, valids, blive, me))
    overflow = lax.psum(overflow.astype(jnp.int32), axis) > 0
    return acc, overflow


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
