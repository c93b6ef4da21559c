"""TPU-native large-array sort: bit-packed keys through ONE single-operand
padded lax.sort.

Why not lax.sort directly: XLA's TPU lowering of a 1-D variadic sort compiles
the full comparator network per instance — measured on v5e, a 4-operand
2-key sort costs 86-157 s of COMPILE time at any size >= 64k rows (and
compile memory grows with operand count until the compiler OOMs), while a
single-operand (B, 8192) batched sort compiles in ~4 s. Runtime was never
the problem (2-3 ms for 6M rows).

So this module reduces every engine sort to the one cheap shape:

1. All sort keys are bit-packed into ONE uint64 per row, least-significant
   bits carrying the row id — stability and the output permutation for free
   (the same key-normalization trick as the reference's storage key coder,
   be/src/storage/key_coder.h, taken to its packed conclusion).
2. `sort_packed`: pad to the next power of two with unique +inf-class
   sentinels and run ONE single-operand 1-D lax.sort. (Earlier tiled
   bitonic/merge-path designs were measured and dropped — see the
   sort_packed docstring for the numbers; the pow2-padded native sort is
   the only variant that is fast to run AND amortizable to compile.)
3. Keys wider than the packing budget (floats, unbounded ints, many keys)
   run as LSD passes of <=`width` bit chunks, each pass a `sort_packed` of
   (chunk | position) — stable, so passes compose.

Payloads are NOT sort operands: the caller gathers by the returned
permutation (measured: a 6M random gather is ~0.1 ms — cheaper than one
extra sort operand's compile time by 5 orders of magnitude).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from starrocks_tpu.column.column import Column

TILE = 8192
_U = jnp.uint64


def _bl(x: int) -> int:
    """bit length of the value range [0, x] (>=1)."""
    return max(int(x).bit_length(), 1)


def sort_packed(x: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of a (n,) uint64 array; all values must be < 2^63.

    One single-operand 1-D lax.sort, padded to the next power of two with
    unique +inf-class sentinels. The pow2 padding collapses every engine
    sort onto ~24 possible shapes, so the expensive per-shape TPU sort
    compile (~16-40 s) happens once per shape per machine and then comes
    from the persistent compilation cache. (Alternatives measured on v5e:
    variadic 1-D sorts compile 86-157 s PER INSTANCE; gather/scatter
    merge-path rounds run ~200x slower than the native sort; unrolled
    reshape/minmax bitonic stages compile ~100 s. The native single-operand
    sort is the only variant that is fast to run AND amortizable to
    compile.) Values should be unique (embed a row id in the low bits) —
    ties break arbitrarily otherwise.
    """
    n = x.shape[0]
    x = x.astype(_U)
    N = 1 << max(n - 1, 1).bit_length()
    if N > n:
        # unique sentinels above every real value (top bit set)
        pads = jnp.uint64(1 << 63) | jnp.arange(N - n, dtype=_U)
        x = jnp.concatenate([x, pads])
    (s,) = jax.lax.sort((x,), num_keys=1)
    return s[:n]


def _rowid_bits(n: int) -> int:
    return _bl(max(n - 1, 1))


def argsort_packed(codes: jnp.ndarray, nbits: int) -> jnp.ndarray:
    """Stable ascending argsort of (n,) uint64 codes occupying `nbits` low
    bits. Requires nbits + rowid bits <= 63 (caller checks via `pack_budget`).
    Returns an int32 permutation."""
    n = codes.shape[0]
    rb = _rowid_bits(n)
    packed = (codes.astype(_U) << _U(rb)) | jnp.arange(n, dtype=_U)
    s = sort_packed(packed)
    return (s & _U((1 << rb) - 1)).astype(jnp.int32)


def pack_budget(n: int) -> int:
    """How many key bits one sort pass can carry for n rows."""
    return 63 - _rowid_bits(n)


def stable_argsort_with_codes(
    keys: Sequence[tuple[jnp.ndarray, int]], n: int
) -> tuple[jnp.ndarray, Optional[jnp.ndarray], int]:
    """stable_argsort that ALSO returns the sorted key codes when the whole
    key fits one pass: (perm, sorted_codes | None, key_nbits). Consumers
    like the sort-merge join derive segment boundaries by adjacent
    comparison of sorted_codes — which would otherwise cost one full
    gather (d[perm]) per key column, the single most expensive op class on
    this hardware (~15ns/element on v5e vs ~2ns for a sort lane)."""
    budget = pack_budget(n)
    total = sum(nb for _, nb in keys)
    if total <= budget:
        packed = jnp.zeros((n,), _U)
        for codes, nbits in keys:        # most-significant first
            packed = (packed << _U(nbits)) | codes.astype(_U)
        rb = _rowid_bits(n)
        s = sort_packed((packed << _U(rb)) | jnp.arange(n, dtype=_U))
        perm = (s & _U((1 << rb) - 1)).astype(jnp.int32)
        return perm, s >> _U(rb), total
    return stable_argsort(keys, n), None, total


def stable_argsort(keys: Sequence[tuple[jnp.ndarray, int]], n: int) -> jnp.ndarray:
    """Stable argsort by (codes, nbits) keys, most-significant first.

    Each codes array is (n,) uint64 with values < 2^nbits, ascending order =
    desired order (normalize first: `normalize_column`). Runs as few
    `sort_packed` passes as the packing budget allows (usually one).
    """
    budget = pack_budget(n)
    # slice every key into <=budget-bit chunks; `chunks` ends up ordered
    # most-significant chunk first, so reversed() yields LSD order
    chunks: list[tuple[jnp.ndarray, int]] = []
    for codes, nbits in keys:
        codes = codes.astype(_U)
        per_key: list[tuple[jnp.ndarray, int]] = []
        while nbits > budget:
            per_key.append(((codes & _U((1 << budget) - 1)), budget))
            codes = codes >> _U(budget)
            nbits -= budget
        per_key.append((codes, nbits))
        chunks.extend(reversed(per_key))
    passes: list[tuple[jnp.ndarray, int]] = []   # built least-significant first
    cur, cur_bits = None, 0
    for codes, nbits in reversed(chunks):        # LSD
        if cur is None:
            cur, cur_bits = codes, nbits
        elif cur_bits + nbits <= budget:
            cur = (codes << _U(cur_bits)) | cur
            cur_bits += nbits
        else:
            passes.append((cur, cur_bits))
            cur, cur_bits = codes, nbits
    if cur is not None:
        passes.append((cur, cur_bits))

    perm = None
    for codes, nbits in passes:                  # LSD passes: stable compose
        c = codes if perm is None else codes[perm]
        p = argsort_packed(c, nbits)
        perm = p if perm is None else perm[p]
    if perm is None:
        perm = jnp.arange(n, dtype=jnp.int32)
    return perm


# ---------------------------------------------------------------------------
# column key normalization: Column -> (uint64 codes ascending in key order,
# nbits) — the key_coder analog
# ---------------------------------------------------------------------------

def normalize_keys(
    col: Column,
    asc: bool = True,
    nulls_first: bool = False,
) -> list[tuple[jnp.ndarray, int]]:
    """One Column -> [(codes, nbits), ...] keys, most-significant first.

    Nullable columns contribute a leading 1-bit null-placement key (NULL
    rows' value codes are zeroed so they're deterministic). NULL placement
    is absolute — not flipped by DESC — matching the previous engine
    normalization (ops/sort._normalize)."""
    d = col.data
    if jnp.issubdtype(d.dtype, jnp.floating):
        from starrocks_tpu.ops import float_bits
        codes = float_bits.order_u64(d.astype(jnp.float64))
        nbits = 64
    elif col.vrange is not None:
        lo, hi = col.vrange
        codes = (d.astype(jnp.int64) - lo).astype(_U)
        nbits = _bl(hi - lo)
    else:
        u = jax.lax.bitcast_convert_type(d.astype(jnp.int64), _U)
        codes = u ^ _U(1 << 63)                  # sign flip: signed order
        nbits = 64
    if nbits < 64:
        # mask stray bits: rows outside vrange (dead/padding garbage) must
        # not bleed into a neighboring key's bit range when packed
        codes = codes & _U((1 << nbits) - 1)
    if not asc:
        codes = (_U((1 << nbits) - 1) if nbits < 64
                 else _U(0xFFFFFFFFFFFFFFFF)) - codes
    if col.valid is None:
        return [(codes, nbits)]
    flag = jnp.where(col.valid, _U(1), _U(0)) if nulls_first \
        else jnp.where(col.valid, _U(0), _U(1))
    codes = jnp.where(col.valid, codes, _U(0))
    return [(flag, 1), (codes, nbits)]
