"""Catalog: table schemas + statistics.

Analog of StarRocks' FE catalog + statistics storage
(fe/.../catalog/, fe/.../statistic/ CachedStatisticStorage) at the scope the
planner needs: schemas, unique keys (for build-side selection), row counts
and per-column NDV (for join order / capacity estimates).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from starrocks_tpu.column.column import Table
from starrocks_tpu.column.dtypes import DataType


@dataclasses.dataclass
class ColumnStats:
    ndv: int
    min: Optional[float] = None
    max: Optional[float] = None
    # fraction of (sampled) rows holding the most common value — the
    # heavy-hitter signal driving automatic skew-join salting (P13)
    top_freq: float = 0.0
    # equi-height histogram: sorted bucket upper bounds over the sample
    # (the reference stores histograms in an internal stats table,
    # fe/.../sql/optimizer/statistics/Histogram via StatisticsCalculator;
    # here they feed range-predicate selectivity for join ordering)
    histogram: Optional[np.ndarray] = None
    # fraction of NULL rows (sampled)
    null_frac: float = 0.0


HISTOGRAM_BUCKETS = 64


def _histogram(d: np.ndarray) -> Optional[np.ndarray]:
    """Equi-height bucket bounds from a (non-null) sample; None for
    non-numeric/empty data. selectivity(col <= v) ~= searchsorted(h, v)/len."""
    if d.dtype.kind not in "iuf" or len(d) == 0:
        return None
    qs = np.linspace(0.0, 1.0, HISTOGRAM_BUCKETS + 1)
    return np.quantile(d.astype(np.float64), qs)


@dataclasses.dataclass
class TableMeta:
    name: str
    schema: dict[str, DataType]
    unique_keys: list[tuple[str, ...]]
    size: int
    stats: dict[str, ColumnStats] = dataclasses.field(default_factory=dict)
    # per-block [min, max] per column (zone maps, the reference's
    # zonemap index be/src/storage/rowset/zone_map_index.h) — host numpy
    # in storage units; pays off on cluster-sorted columns
    zone_maps: dict[str, tuple] = dataclasses.field(default_factory=dict)
    block_rows: int = 0


ZONE_BLOCK_ROWS = 1 << 16
ZONE_MIN_BLOCKS = 8


TPCH_UNIQUE_KEYS = {
    "region": [("r_regionkey",)],
    "nation": [("n_nationkey",)],
    "supplier": [("s_suppkey",)],
    "part": [("p_partkey",)],
    "partsupp": [("ps_partkey", "ps_suppkey")],
    "customer": [("c_custkey",)],
    "orders": [("o_orderkey",)],
    "lineitem": [("l_orderkey", "l_linenumber")],
}


class Catalog:
    def __init__(self):
        self.tables: dict[str, TableMeta] = {}

    def add(self, meta: TableMeta):
        self.tables[meta.name] = meta

    def get(self, name: str) -> TableMeta:
        if name not in self.tables:
            raise KeyError(f"unknown table {name!r}")
        return self.tables[name]

    @classmethod
    def from_tables(
        cls,
        tables: dict[str, Table],
        unique_keys: Optional[dict[str, list[tuple[str, ...]]]] = None,
        collect_stats: bool = True,
        sample: int = 65_536,
    ) -> "Catalog":
        """ANALYZE-equivalent: collect sizes + sampled NDV at registration
        (the analog of statistic/StatisticExecutor.java collect jobs)."""
        cat = cls()
        uk = unique_keys or TPCH_UNIQUE_KEYS
        for name, t in tables.items():
            from starrocks_tpu.exec.stream import HostTable
            if isinstance(t, HostTable):
                # host-resident (out-of-core) table: ANALYZE on a host
                # sample; no device uploads at registration
                stats = {}
                if collect_stats:
                    n = t.nrows
                    if n > sample:
                        idx = np.random.default_rng(0).integers(0, n, sample)
                        ht = t.gather(idx)
                    else:
                        ht = t
                    for cname, col in ht.columns.items():
                        d = col.data
                        _, counts = np.unique(d, return_counts=True)
                        ndv = len(counts)
                        top_freq = float(counts.max() / max(len(d), 1)) \
                            if len(counts) else 0.0
                        if n > sample and ndv > sample // 2:
                            ndv = min(n, int(ndv * max(1.0, n / sample) ** 0.5))
                        full = t.columns[cname]
                        if full.vrange is not None:
                            mn, mx = float(full.vrange[0]), float(full.vrange[1])
                        elif len(d) and d.dtype.kind in "if":
                            mn, mx = float(d.min()), float(d.max())
                        else:
                            mn = mx = None
                        nf = (float((~col.valid).mean())
                              if col.valid is not None else 0.0)
                        stats[cname] = ColumnStats(ndv=max(int(ndv), 1),
                                                   min=mn, max=mx,
                                                   top_freq=top_freq,
                                                   histogram=_histogram(d),
                                                   null_frac=nf)
                zone_maps, block_rows = {}, 0
                pre = getattr(t, "zmaps", None)
                if pre:
                    # segment-manifest zone maps (HostTable.load): skip the
                    # registration-time full scan — for a memmapped disk
                    # tier that scan would page the whole table in
                    zone_maps, block_rows = pre, t.zone_block_rows
                elif collect_stats and t.nrows >= ZONE_MIN_BLOCKS * ZONE_BLOCK_ROWS:
                    zone_maps, block_rows = _collect_host_zone_maps(t)
                cat.add(TableMeta(
                    name=name,
                    schema={c: col.dtype for c, col in t.columns.items()},
                    unique_keys=uk.get(name, []),
                    size=t.nrows,
                    stats=stats,
                    zone_maps=zone_maps,
                    block_rows=block_rows,
                ))
                continue
            stats = {}
            if collect_stats:
                n = t.nrows
                idx = None
                if n > sample:
                    # sample ON DEVICE: only `sample` rows cross device->host
                    # (a full-column readback through the axon relay costs
                    # minutes per table at SF1)
                    import jax
                    import jax.numpy as jnp
                    idx_dev = jnp.asarray(
                        np.random.default_rng(0).integers(0, n, sample))
                    gathered = jax.jit(
                        lambda tt: {c: (col.data[idx_dev],
                                        None if col.valid is None
                                        else col.valid[idx_dev])
                                    for c, col in tt.columns.items()})(t)
                    host = {c: np.asarray(v) for c, (v, _) in gathered.items()}
                    hvalid = {c: None if vv is None else np.asarray(vv)
                              for c, (_, vv) in gathered.items()}
                else:
                    host = {c: np.asarray(col.data)
                            for c, col in t.columns.items()}
                    hvalid = {c: None if col.valid is None
                              else np.asarray(col.valid)
                              for c, col in t.columns.items()}
                    idx = None
                for cname, col in t.columns.items():
                    d = host[cname]
                    _, counts = np.unique(d, return_counts=True)
                    ndv = len(counts)
                    top_freq = float(counts.max() / max(len(d), 1)) \
                        if len(counts) else 0.0
                    if n > sample:
                        # first-order extrapolation for sampled NDV
                        ndv = min(n, int(ndv * max(1.0, n / sample) ** 0.5)) if ndv > sample // 2 else ndv
                    if col.vrange is not None:
                        mn, mx = float(col.vrange[0]), float(col.vrange[1])
                    elif len(d) and d.dtype.kind in "if":
                        mn, mx = float(d.min()), float(d.max())
                    else:
                        mn = mx = None
                    v = hvalid.get(cname)
                    nf = float((~v).mean()) if v is not None else 0.0
                    stats[cname] = ColumnStats(ndv=max(int(ndv), 1),
                                               min=mn, max=mx,
                                               top_freq=top_freq,
                                               histogram=_histogram(d),
                                               null_frac=nf)
            zone_maps, block_rows = {}, 0
            if collect_stats and t.nrows >= ZONE_MIN_BLOCKS * ZONE_BLOCK_ROWS:
                zone_maps, block_rows = _collect_zone_maps(t)
            cat.add(TableMeta(
                name=name,
                schema={c: col.dtype for c, col in t.columns.items()},
                unique_keys=uk.get(name, []),
                size=t.nrows,
                stats=stats,
                zone_maps=zone_maps,
                block_rows=block_rows,
            ))
        return cat


def _collect_zone_maps(t: Table):
    """Per-block min/max on device; only the tiny (nblocks,) summaries cross
    to host. Strings participate via dict codes (sorted dictionaries keep
    code order == lexicographic order)."""
    import jax
    import jax.numpy as jnp

    B = ZONE_BLOCK_ROWS
    n = t.nrows
    nb = (n + B - 1) // B
    pad = nb * B - n

    def reduce_all(tt):
        out = {}
        for cname, col in tt.columns.items():
            d = col.data
            if d.dtype.kind not in "iu" and not jnp.issubdtype(
                    d.dtype, jnp.integer):
                continue
            lo_sent = jnp.iinfo(d.dtype).max
            hi_sent = jnp.iinfo(d.dtype).min
            dead = jnp.zeros((n,), jnp.bool_) if col.valid is None \
                else ~col.valid
            if tt.live is not None:
                dead = dead | ~tt.live
            dpad = jnp.concatenate(
                [jnp.where(dead, lo_sent, d), jnp.full((pad,), lo_sent, d.dtype)])
            mins = dpad.reshape(nb, B).min(axis=1)
            dpad = jnp.concatenate(
                [jnp.where(dead, hi_sent, d), jnp.full((pad,), hi_sent, d.dtype)])
            maxs = dpad.reshape(nb, B).max(axis=1)
            out[cname] = (mins, maxs)
        return out

    dev = jax.jit(reduce_all)(t)
    import numpy as np
    return ({c: (np.asarray(mn), np.asarray(mx)) for c, (mn, mx) in dev.items()},
            B)


def _collect_host_zone_maps(t):
    """Host-table zone maps: per-block min/max computed in numpy (the table
    already lives in host RAM; no device round trip)."""
    B = ZONE_BLOCK_ROWS
    n = t.nrows
    nb = (n + B - 1) // B
    pad = nb * B - n
    out = {}
    for cname, col in t.columns.items():
        d = col.data
        if d.dtype.kind not in "iu":
            continue
        lo_sent = np.iinfo(d.dtype).max
        hi_sent = np.iinfo(d.dtype).min
        dead = np.zeros((n,), bool) if col.valid is None else ~col.valid
        dpad = np.concatenate(
            [np.where(dead, lo_sent, d), np.full((pad,), lo_sent, d.dtype)])
        mins = dpad.reshape(nb, B).min(axis=1)
        dpad = np.concatenate(
            [np.where(dead, hi_sent, d), np.full((pad,), hi_sent, d.dtype)])
        maxs = dpad.reshape(nb, B).max(axis=1)
        out[cname] = (mins, maxs)
    return out, B
