"""Vectorized sort / top-N.

Analog of StarRocks' sorting engine (be/src/exec/sorting/sorting.h:43
sort_and_tie_columns, chunks_sorter_topn.h), redesigned for XLA:

- Keys are bit-normalized to unsigned sortable form (the same trick as the
  storage key coder, be/src/storage/key_coder.h): sign-flip ints, complement
  for DESC, validity bit prepended for NULLS FIRST/LAST — see
  ops/fast_sort.normalize_keys.
- Multi-key ordering = ops/fast_sort.stable_argsort: keys bit-pack (with the
  row id as implicit tiebreak) into as few single-operand tiled sort passes
  as fit (the column-wise sort-and-tie structure collapsed into packed
  words; a 1-D variadic lax.sort would cost minutes of XLA compile time per
  instance on TPU — see fast_sort's module docstring).
- Dead rows always sort last (live mask is the most significant key), so
  LIMIT is a mask over the leading positions.
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
    # None = engine default (MySQL/StarRocks semantics: NULLs sort lowest —
    # first for ASC, last for DESC); True/False forces placement
    nulls_first: Optional[bool] = None

    def resolve_nulls_first(self) -> bool:
        return self.asc if self.nulls_first is None else self.nulls_first


def sort_permutation(table: Table, keys: Sequence[SortKey]) -> jnp.ndarray:
    """Stable permutation ordering live rows by keys, dead rows last."""
    from starrocks_tpu.ops import fast_sort as fs

    n = table.nrows
    norm: list = []
    if table.live is not None:
        # most-significant: live first
        norm.append((jnp.where(table.live, jnp.uint64(0), jnp.uint64(1)), 1))
    for k in keys:
        norm.extend(fs.normalize_keys(table[k.name], k.asc,
                                      k.resolve_nulls_first()))
    return fs.stable_argsort(norm, n)


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
