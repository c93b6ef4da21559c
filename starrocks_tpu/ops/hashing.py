"""Column hashing for group-by / join / shuffle.

Analog of StarRocks' ColumnHash / JoinKeyHash (be/src/column/column_hash.h,
be/src/exec/join_hash_map.h:322-350): multiplicative (Fibonacci) hashing on
64-bit lanes, combined across key columns. All ops are VPU elementwise.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp

from starrocks_tpu.column.column import Column

# golden-ratio multiplicative constants (splitmix64 finalizer style)
_MUL1 = jnp.uint64(0xBF58476D1CE4E5B9)
_MUL2 = jnp.uint64(0x94D049BB133111EB)
_GOLD = jnp.uint64(0x9E3779B97F4A7C15)


def _mix64(x: jnp.ndarray) -> jnp.ndarray:
    x = (x ^ (x >> jnp.uint64(30))) * _MUL1
    x = (x ^ (x >> jnp.uint64(27))) * _MUL2
    return x ^ (x >> jnp.uint64(31))


def hash_columns(cols: Sequence[Column], seed: int = 0) -> jnp.ndarray:
    """Combined 64-bit hash of key columns. NULLs hash as a distinct value."""
    n = cols[0].data.shape[0]
    h = jnp.full((n,), jnp.uint64(seed) ^ _GOLD, jnp.uint64)
    for c in cols:
        v = c.data.astype(jnp.int64).astype(jnp.uint64)
        if c.valid is not None:
            # NULLs hash to a fixed sentinel; valid values keep their plain
            # hash so nullable and non-nullable sides hash identically.
            v = jnp.where(c.valid, v, jnp.uint64(0x517CC1B727220A95))
        h = _mix64(h ^ (v + _GOLD + (h << jnp.uint64(6)) + (h >> jnp.uint64(2))))
    return h


def key_equal_at(cols: Sequence[Column], idx: jnp.ndarray) -> jnp.ndarray:
    """rowwise: does key tuple at `idx` equal own key tuple? (idx pre-clipped)"""
    eq = None
    for c in cols:
        a = c.data
        b = c.data[idx]
        e = a == b
        if c.valid is not None:
            av, bv = c.valid, c.valid[idx]
            e = (av == bv) & (e | ~av)  # NULL == NULL for grouping
        eq = e if eq is None else (eq & e)
    return eq


def hash_columns_np(datas, valids, seed: int = 0) -> "np.ndarray":
    """numpy twin of hash_columns for HOST-side partitioning (out-of-core
    radix partitioning in exec/stream.py). Bit-identical to the device
    version so host-chosen partitions agree with device-side hashes when
    both sides of a join are partitioned by the same implementation."""
    import numpy as np
    n = len(datas[0])
    with np.errstate(over="ignore"):
        h = np.full(n, np.uint64(seed) ^ np.uint64(0x9E3779B97F4A7C15),
                    np.uint64)
        gold = np.uint64(0x9E3779B97F4A7C15)
        m1 = np.uint64(0xBF58476D1CE4E5B9)
        m2 = np.uint64(0x94D049BB133111EB)
        for d, v in zip(datas, valids):
            x = d.astype(np.int64).astype(np.uint64)
            if v is not None:
                x = np.where(v, x, np.uint64(0x517CC1B727220A95))
            h = h ^ (x + gold + (h << np.uint64(6)) + (h >> np.uint64(2)))
            h = (h ^ (h >> np.uint64(30))) * m1
            h = (h ^ (h >> np.uint64(27))) * m2
            h = h ^ (h >> np.uint64(31))
    return h
