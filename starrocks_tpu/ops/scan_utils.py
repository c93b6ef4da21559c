"""Blocked prefix-scan utilities.

XLA lowers jnp.cumsum / associative_scan over multi-million-element arrays to
a single reduce-window that overflows v5e's 16MB VMEM (scoped-vmem OOM at
~4M int64 elements). These helpers run the scan two-level: an in-block scan
over (nblocks, block) plus a tiny cross-block carry scan — compiles at any
length and runs at HBM bandwidth (~2B rows/s for int64 prefix sums on v5e).

They are the engine's segmented-execution workhorses: segmented sums/min/max
for sort-based aggregation, and flag-propagation for merge joins.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 4096


def _pad_blocks(x, block, fill):
    n = x.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(nb, block), n


def prefix_sum(x, block: int = _BLOCK):
    """Inclusive prefix sum, any length/dtype."""
    y, n = _pad_blocks(x, block, 0)
    within = jnp.cumsum(y, axis=1)
    tot = within[:, -1]
    offs = jnp.cumsum(tot) - tot
    return (within + offs[:, None]).reshape(-1)[:n]


def seg_propagate_last(flag, value, fill):
    """value at the most recent flagged row (inclusive); `fill` before any.

    The segmented-broadcast primitive: flag marks segment starts carrying a
    value; every row receives its segment's value. No gathers.
    """
    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, av)

    return _seg_scan_pairs(combine, flag, value, fill)


def seg_scan(op, flag, value, identity):
    """Inclusive segmented scan: scans `op` over value, restarting at rows
    where flag is True (the flagged row starts a fresh segment with its own
    value)."""
    def combine(a, b):
        af, av = a
        bf, bv = b
        return af | bf, jnp.where(bf, bv, op(av, bv))

    return _seg_scan_pairs(combine, flag, value, identity)


def _seg_scan_pairs(combine, flag, value, fill):
    """Flat segmented Hillis-Steele: log2(n) shift+combine steps.

    The earlier two-level formulation (reshape to (nblocks, block) +
    lax.associative_scan over pairs) compiled in SECONDS for each piece in
    isolation but took the TPU compiler >15 MINUTES fused at engine sizes
    (measured at 6M rows; the reshape feeding the pair scan is implicated —
    optimization_barrier did not help). The flat doubling form is log(n)
    unrolled slices + elementwise combines: ~2s to compile at 6M and
    HBM-bound to run. n·log(n) traffic instead of 2n is the right trade —
    a few ms of extra bandwidth vs minutes of compile.
    """
    n = value.shape[0]
    f = flag.astype(jnp.bool_)
    o = value
    d = 1
    while d < n:
        # shifted-in head rows carry (flag=True, identity): they never
        # contribute across the array boundary
        f_s = jnp.concatenate([jnp.ones((d,), jnp.bool_), f[:-d]])
        o_s = jnp.concatenate([jnp.full((d,), fill, o.dtype), o[:-d]])
        f, o = combine((f_s, o_s), (f, o))
        d *= 2
    return o


def seg_sum(flag, value):
    """Inclusive running sum within segments (flag marks segment starts)."""
    ps = prefix_sum(value)
    excl = ps - value
    base = seg_propagate_last(flag, excl, jnp.zeros((), value.dtype))
    return ps - base


def running_reduce(op, x, identity):
    """Blocked inclusive scan of `op` over the whole array (VMEM-safe
    replacement for lax.associative_scan / jnp.cumsum at engine sizes)."""
    flag = jnp.zeros((x.shape[0],), jnp.bool_).at[0].set(True)
    return seg_scan(op, flag, x, identity)


def seg_broadcast_from_end(is_end, value, fill):
    """Every row receives its segment's value at the segment END row
    (reverse of seg_propagate_last; used to broadcast segment totals —
    e.g. per-group valid counts for percentile rank targets)."""
    rev = seg_propagate_last(jnp.flip(is_end), jnp.flip(value), fill)
    return jnp.flip(rev)


def segment_starts_from_neq(*pairs):
    """Start flags: row differs from previous in any (data, valid) pair."""
    n = pairs[0][0].shape[0]
    start = jnp.zeros((n,), jnp.bool_).at[0].set(True)
    for data, valid in pairs:
        start = start | (data != jnp.roll(data, 1))
        if valid is not None:
            start = start | (valid != jnp.roll(valid, 1))
    return start.at[0].set(True)
