"""Vectorized sort / top-N.

Analog of StarRocks' sorting engine (be/src/exec/sorting/sorting.h:43
sort_and_tie_columns, chunks_sorter_topn.h), redesigned for XLA:

- Keys are bit-normalized to unsigned sortable form (the same trick as the
  storage key coder, be/src/storage/key_coder.h): sign-flip ints, complement
  for DESC, validity bit prepended for NULLS FIRST/LAST.
- Multi-key ordering = sequence of *stable* argsorts from least- to
  most-significant key (the column-wise sort-and-tie structure without the
  explicit tie vector — stability carries ties).
- Dead rows always sort last (live mask is the most significant key), so
  LIMIT is a mask over the leading positions.

XLA lowers jnp.argsort to a bitonic sort network on TPU — an O(n log^2 n)
fully-parallel sort, which is the TPU-native replacement for pdqsort +
merge-path (be/src/exec/sorting/merge_path.h:371).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

from starrocks_tpu.column.column import Column, Table


@dataclasses.dataclass(frozen=True)
class SortKey:
    name: str
    asc: bool = True
    nulls_first: bool = False  # SQL default: NULLS LAST for ASC


def _normalize(col: Column, asc: bool, nulls_first: bool) -> jnp.ndarray:
    """Bit-normalize a column to int64 whose ascending order == key order."""
    d = col.data
    if jnp.issubdtype(d.dtype, jnp.floating):
        # IEEE754 total order -> signed int64 order: negatives flip all bits
        # then sign bit; positives keep bits (already ascending as signed).
        import jax
        bu = jax.lax.bitcast_convert_type(d.astype(jnp.float64), jnp.uint64)
        msb = jnp.uint64(0x8000000000000000)
        neg = (bu & msb) != 0
        ku = jnp.where(neg, ~bu, bu ^ msb) ^ msb
        key = jax.lax.bitcast_convert_type(ku, jnp.int64)
    elif d.dtype == jnp.bool_:
        key = d.astype(jnp.int64)
    else:
        key = d.astype(jnp.int64)
    if not asc:
        key = -1 - key  # safe: int64 domain of int32/dict codes; floats biased
    if col.valid is not None:
        big = jnp.int64(jnp.iinfo(jnp.int64).max)
        small = jnp.int64(jnp.iinfo(jnp.int64).min)
        null_key = small if nulls_first else big
        key = jnp.where(col.valid, key, null_key)
    return key


def sort_permutation(table: Table, keys: Sequence[SortKey]) -> jnp.ndarray:
    """Stable permutation ordering live rows by keys, dead rows last."""
    n = table.nrows
    perm = jnp.arange(n, dtype=jnp.int32)
    for k in reversed(list(keys)):
        col = table[k.name]
        keyvals = _normalize(col, k.asc, k.nulls_first)
        perm = perm[jnp.argsort(keyvals[perm], stable=True)]
    if table.live is not None:
        # most-significant: live first (stable keeps key order within each)
        perm = perm[jnp.argsort(~table.live[perm], stable=True)]
    return perm


def sort_table(table: Table, keys: Sequence[SortKey], limit: Optional[int] = None) -> Table:
    """ORDER BY [LIMIT]: returns a row-reordered table; with limit, rows
    beyond the first `limit` live rows are marked dead (shape is static)."""
    perm = sort_permutation(table, keys)
    out = table.gather(perm)
    if limit is not None:
        n = table.nrows
        keep = jnp.arange(n) < limit
        live = keep if out.live is None else (out.live & keep)
        out = out.with_live(live)
    return out
