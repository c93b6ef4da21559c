"""Out-of-core execution: HOST-RAM tables streamed through the chip in
HBM-sized blocks.

Analog of the reference's morsel-driven scan framework + spill tier
(be/src/exec/pipeline/scan/scan_operator.cpp:418 async chunk sources,
be/src/exec/spill/spiller.h:144 operator state spill), redesigned for the
TPU memory hierarchy: a table too big for HBM lives in host RAM as numpy
arrays (`HostTable`) and is processed block-at-a-time through the SAME
operator kernels the resident path uses.

Key properties:
- Every block has the same static shape -> each operator compiles ONCE and
  is reused for all blocks (per-node jit caches on ExecContext).
- Host->device uploads are dispatched asynchronously (JAX dispatch is
  async): block k+1's transfer overlaps block k's compute — the P11
  IO/compute-overlap analog of the reference's separate scan-IO executor.
- Aggregates stream with MERGEABLE partial states (count->sum, var/stddev
  via moment decomposition — exactly the two-phase distributed shapes of
  parallel/dist.py, applied across time instead of across chips).
- Joins stream the PROBE side; the build side is materialized resident
  (dimension tables / filtered subplans). Probe-filtering join types
  (inner/left/semi/anti/null-aware-anti) are blockwise-exact by
  construction. Right-family joins materialize the probe first (their
  output carries global build-side match state).
- Top-N sorts stream (per-block top-N + running merge); full sorts, windows
  and distinct set-ops materialize their (post-filter/agg, usually small)
  inputs.

`materialize` compacts each block's live rows on device and concatenates —
the spill-restore analog; if a "materialized" intermediate exceeds HBM the
query legitimately needs a bigger mesh (the same boundary the reference's
spill-to-disk moves, here host RAM plays the disk tier).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table, concat_tables
from starrocks_tpu.exec import plan as plan_mod
from starrocks_tpu.exec.plan import (
    AddColumns, Aggregate, BlockScan, BroadcastScalar, CrossJoin, ExecContext,
    Filter, HashJoin, Limit, PlanNode, Project, Scan, SetOp, Sort, Window,
)
from starrocks_tpu.ops import hash_agg
from starrocks_tpu.ops.hash_agg import AggSpec
from starrocks_tpu.ops.sort import sort_table


@dataclasses.dataclass
class HostCol:
    data: np.ndarray
    valid: Optional[np.ndarray]
    dtype: dt.DataType
    dict_id: int = 0
    vrange: Optional[tuple] = None


class HostTable:
    """Columnar table resident in host RAM (the beyond-HBM storage tier)."""

    def __init__(self, columns: dict[str, HostCol]):
        self.columns = columns

    @classmethod
    def from_numpy(cls, raw: dict[str, np.ndarray],
                   schema: dict[str, dt.DataType],
                   valids: Optional[dict[str, np.ndarray]] = None) -> "HostTable":
        cols = {}
        for name, a_dt in schema.items():
            arr = raw[name]
            dict_id = 0
            if a_dt.is_string:
                codes, dict_id = dt.dict_encode(arr)
                arr = codes
            np_arr = np.ascontiguousarray(np.asarray(arr, a_dt.np_dtype))
            vrange = None
            if a_dt.is_string:
                vrange = (0, max(len(dt.dict_values(dict_id)) - 1, 0))
            elif np_arr.dtype.kind in "iu" and np_arr.size:
                vrange = (int(np_arr.min()), int(np_arr.max()))
            v = None if valids is None or valids.get(name) is None \
                else np.asarray(valids[name], bool)
            cols[name] = HostCol(np_arr, v, a_dt, dict_id, vrange)
        return cls(cols)

    @classmethod
    def from_table(cls, t: Table) -> "HostTable":
        """Pull a device Table to host (keeps encodings; applies live mask)."""
        live = None if t.live is None else np.asarray(t.live)
        cols = {}
        for name, c in t.columns.items():
            data = np.asarray(c.data)
            valid = None if c.valid is None else np.asarray(c.valid)
            if live is not None:
                data = data[live]
                valid = None if valid is None else valid[live]
            cols[name] = HostCol(data, valid, c.dtype, c.dict_id, c.vrange)
        return cls(cols)

    # -- disk tier: persistent columnar segments ---------------------------
    def save(self, dirpath: str) -> None:
        """Persist as a columnar SEGMENT directory — the engine's persistent
        storage format (the reference's segment file + zonemap index,
        be/src/storage/rowset/segment_writer.cpp,
        be/src/storage/rowset/zone_map_index.h, reduced to what a
        memory-hierarchy design needs): one raw little-endian file per
        column, validity bitmaps as bytes, string dictionaries as .npy, and
        a JSON manifest carrying schema + per-block zone maps. The column
        files are np.memmap-able, so `HostTable.load(dir, mmap=True)` gives
        a DISK-tier table: blocks page in on demand and host RAM acts as a
        cache, not a bound — the third level of the HBM -> host RAM -> disk
        hierarchy the stream executor walks."""
        import json
        import os
        from starrocks_tpu.sql.catalog import _collect_host_zone_maps

        os.makedirs(dirpath, exist_ok=True)
        zmaps, zblock = _collect_host_zone_maps(self)
        man = {"version": 1, "nrows": self.nrows,
               "zone_block_rows": zblock, "columns": {}}
        for name, c in self.columns.items():
            np.ascontiguousarray(c.data).tofile(
                os.path.join(dirpath, f"{name}.bin"))
            entry = {"kind": c.dtype.kind.value, "scale": c.dtype.scale,
                     "np": str(c.data.dtype), "vrange": c.vrange}
            if c.valid is not None:
                c.valid.astype(np.uint8).tofile(
                    os.path.join(dirpath, f"{name}.valid.bin"))
                entry["valid"] = True
            if c.dtype.is_string:
                # dictionaries live as fixed-width unicode (object arrays
                # would need pickle)
                np.save(os.path.join(dirpath, f"{name}.dict.npy"),
                        np.asarray(dt.dict_values(c.dict_id), dtype=np.str_),
                        allow_pickle=False)
                entry["dict"] = True
            if name in zmaps:
                mins, maxs = zmaps[name]
                entry["zmap"] = [mins.tolist(), maxs.tolist()]
            man["columns"][name] = entry
        with open(os.path.join(dirpath, "segment.json"), "w") as f:
            json.dump(man, f)

    @classmethod
    def load(cls, dirpath: str, mmap: bool = True) -> "HostTable":
        """Open a saved segment directory. mmap=True maps column files
        read-only (disk tier: the OS pages blocks in as the stream executor
        touches them); mmap=False reads them into host RAM. Precomputed
        zone maps from the manifest skip the registration-time full scan
        (`Catalog._collect_host_zone_maps` consumes `self.zmaps`)."""
        import json
        import os

        with open(os.path.join(dirpath, "segment.json")) as f:
            man = json.load(f)
        cols = {}
        zmaps = {}
        for name, e in man["columns"].items():
            a_dt = dt.DataType(dt.TypeKind(e["kind"]), e.get("scale", 0))
            npdt = np.dtype(e["np"])
            path = os.path.join(dirpath, f"{name}.bin")
            data = (np.memmap(path, dtype=npdt, mode="r") if mmap
                    else np.fromfile(path, dtype=npdt))
            valid = None
            if e.get("valid"):
                vpath = os.path.join(dirpath, f"{name}.valid.bin")
                v8 = (np.memmap(vpath, dtype=np.uint8, mode="r") if mmap
                      else np.fromfile(vpath, dtype=np.uint8))
                valid = v8.view(bool)
            dict_id = 0
            if e.get("dict"):
                values = np.load(os.path.join(dirpath, f"{name}.dict.npy"),
                                 allow_pickle=False)
                dict_id = dt.register_dict(values)
            vrange = tuple(e["vrange"]) if e.get("vrange") else None
            cols[name] = HostCol(data, valid, a_dt, dict_id, vrange)
            if e.get("zmap"):
                zmaps[name] = (np.asarray(e["zmap"][0], npdt),
                               np.asarray(e["zmap"][1], npdt))
        t = cls(cols)
        if zmaps:
            t.zmaps = zmaps
            t.zone_block_rows = man["zone_block_rows"]
        return t

    @property
    def nrows(self) -> int:
        return len(next(iter(self.columns.values())).data)

    def column_names(self):
        return list(self.columns.keys())

    def select(self, names) -> "HostTable":
        return HostTable({n: self.columns[n] for n in names})

    def gather(self, idx: np.ndarray) -> "HostTable":
        cols = {}
        for n, c in self.columns.items():
            cols[n] = HostCol(c.data[idx],
                              None if c.valid is None else c.valid[idx],
                              c.dtype, c.dict_id, c.vrange)
        return HostTable(cols)

    def block(self, i: int, block_rows: int) -> Table:
        """Device Table for block i; the tail block pads with dead rows so
        every block shares one static shape (one compiled module/op)."""
        n = self.nrows
        lo = i * block_rows
        hi = min(lo + block_rows, n)
        k = hi - lo
        cols = {}
        for name, c in self.columns.items():
            data = c.data[lo:hi]
            valid = None if c.valid is None else c.valid[lo:hi]
            if k < block_rows:
                pad = block_rows - k
                data = np.concatenate(
                    [data, np.zeros((pad,), data.dtype)])
                if valid is not None:
                    valid = np.concatenate([valid, np.zeros((pad,), bool)])
            cols[name] = Column(jnp.asarray(data),
                                None if valid is None else jnp.asarray(valid),
                                c.dtype, c.dict_id, c.vrange)
        live = None
        if k < block_rows:
            live = jnp.asarray(
                np.arange(block_rows) < k)
        return Table(columns=cols, live=live)

    def sample_table(self, k: int, seed: int = 0) -> Table:
        """Small device Table of sampled rows (ANALYZE input)."""
        n = self.nrows
        if n <= k:
            idx = np.arange(n)
        else:
            idx = np.random.default_rng(seed).integers(0, n, k)
        ht = self.gather(idx)
        cols = {n2: Column(jnp.asarray(c.data),
                           None if c.valid is None else jnp.asarray(c.valid),
                           c.dtype, c.dict_id, c.vrange)
                for n2, c in ht.columns.items()}
        return Table(columns=cols)


@dataclasses.dataclass
class _Stream:
    """Lazy, re-iterable block stream: block(i) -> same-shaped device Table."""
    nblocks: int
    fn: object                  # callable i -> Table

    def blocks(self):
        for i in range(self.nblocks):
            yield self.fn(i)


_RIGHT_FAMILY = ("right_semi", "right_anti", "right_outer", "full_outer")


class StreamExecutor:
    def __init__(self, ctx: ExecContext, tables: dict, block_rows: int):
        self.ctx = ctx
        self.tables = tables
        self.block_rows = block_rows
        self._memo: dict[int, object] = {}

    # -- dispatch ----------------------------------------------------------
    def eval(self, node: PlanNode):
        r = self._memo.get(node.node_id)
        if r is not None:
            return r
        m = getattr(self, f"_run_{type(node).__name__}", None)
        if m is None:
            raise NotImplementedError(type(node).__name__)
        r = m(node)
        self._memo[node.node_id] = r
        return r

    def table(self, node: PlanNode) -> Table:
        """Evaluate and force to a resident device Table."""
        r = self.eval(node)
        if isinstance(r, _Stream):
            r = self.materialize(r)
            self._memo[node.node_id] = r
        return r

    def materialize(self, s: _Stream) -> Table:
        """Compact each block's live rows on device and concatenate — the
        spill-restore analog (restored state must fit HBM)."""
        from starrocks_tpu.column.column import _compact_live
        parts = []
        for b in s.blocks():
            compacted, cnt = _compact_live(b)
            k = int(cnt)
            if k == 0:
                continue
            cols = {n: Column(c.data[:k],
                              None if c.valid is None else c.valid[:k],
                              c.dtype, c.dict_id, c.vrange)
                    for n, c in compacted.columns.items()}
            parts.append(Table(columns=cols))
        if not parts:
            # empty result with the right schema: one dead-padded block
            first = s.fn(0)
            return first.with_live(jnp.zeros((first.nrows,), jnp.bool_))
        out = parts[0]
        for p in parts[1:]:
            out = concat_tables(out, p)
        return out

    def _map(self, child, node, kernel, tag="") -> object:
        """Apply a per-block kernel over a stream (or once, resident)."""
        src = self.eval(child)
        if isinstance(src, _Stream):
            return _Stream(src.nblocks,
                           lambda i: self.ctx.op(node, kernel, src.fn(i),
                                                 key=("blk", tag)))
        return self.ctx.op(node, kernel, src, key=("res", tag))

    # -- leaves ------------------------------------------------------------
    def _run_Scan(self, node: Scan):
        t = self.tables[node.table]
        if isinstance(t, HostTable):
            if node.columns is not None:
                t = t.select(list(node.columns))
            nb = max(1, math.ceil(t.nrows / self.block_rows))
            return _Stream(nb, lambda i, _t=t: _t.block(i, self.block_rows))
        if node.columns is not None:
            t = t.select(list(node.columns))
        return t

    def _run_BlockScan(self, node: BlockScan):
        t = self.tables[node.table]
        if isinstance(t, HostTable):
            if node.columns is not None:
                t = t.select(list(node.columns))
            # zone-map pruning happens at HOST level: gather the surviving
            # blocks' rows (cheap numpy slice-concat), then stream them
            B = node.block_rows
            n = t.nrows
            idx = np.concatenate([
                np.arange(b * B, min((b + 1) * B, n))
                for b in node.blocks if b * B < n]) if node.blocks else \
                np.zeros((0,), np.int64)
            t = t.gather(idx)
            nb = max(1, math.ceil(t.nrows / self.block_rows))
            return _Stream(nb, lambda i, _t=t: _t.block(i, self.block_rows))
        return node.run(self.ctx_with(node))

    def ctx_with(self, node):
        """Resident fallback: run a whole subtree with the plan executor
        (only valid when no HostTable scan lives below `node`)."""
        ctx = self.ctx
        if not ctx.tables:
            ctx.tables = {k: v for k, v in self.tables.items()
                          if not isinstance(v, HostTable)}
        return ctx

    # -- streaming row operators -------------------------------------------
    def _run_Filter(self, node: Filter):
        def kernel(t):
            p = node.predicate.eval(t)
            mask = p.data if p.valid is None else (p.data & p.valid)
            return t.filter(mask)
        return self._map(node.child, node, kernel, "f")

    def _run_Project(self, node: Project):
        def kernel(t):
            cols = {}
            for name, e in node.outputs.items():
                cols[name] = t[e] if isinstance(e, str) else e.eval(t)
            return Table(columns=cols, live=t.live)
        return self._map(node.child, node, kernel, "p")

    def _run_AddColumns(self, node: AddColumns):
        def kernel(t):
            for name, e in node.outputs.items():
                t = t.with_column(name, e.eval(t))
            return t
        return self._map(node.child, node, kernel, "a")

    def _run_HashJoin(self, node: HashJoin):
        from starrocks_tpu.config import CONFIG
        bsrc = self.eval(node.build)
        psrc = self.eval(node.probe)
        if (isinstance(bsrc, _Stream)
                and node.join_type != "null_aware_anti"
                and bsrc.nblocks * self.block_rows
                    > CONFIG.ooc_partition_build_rows):
            # P10: the build side itself exceeds the resident budget —
            # radix-partition BOTH sides host-side and join partition at a
            # time (null_aware_anti is excluded: its build-has-NULL /
            # build-empty decisions are global, not per-partition)
            return self._partitioned_join(node, psrc, bsrc)
        b = self.table(node.build)
        src = psrc
        if isinstance(src, _Stream):
            if node.join_type in _RIGHT_FAMILY:
                # output rows carry global build-match state: needs the
                # whole probe side at once
                p = self.materialize(src)
                self._memo[node.probe.node_id] = p
                return node.run_local(self.ctx, p, b)
            return _Stream(src.nblocks,
                           lambda i: node.run_local(self.ctx, src.fn(i), b))
        return node.run_local(self.ctx, src, b)

    # -- radix-partitioned out-of-core join (P10) --------------------------
    def _to_host(self, src) -> HostTable:
        """Force a stream (or resident table) down to host RAM — the spill
        tier (spiller.h:144); each block compacts on device first so only
        live rows cross PCIe."""
        if isinstance(src, _Stream):
            parts = [HostTable.from_table(b) for b in src.blocks()]
            cols = {}
            for name, c0 in parts[0].columns.items():
                datas = [p.columns[name].data for p in parts]
                valids = [p.columns[name].valid for p in parts]
                data = np.concatenate(datas)
                valid = None if all(v is None for v in valids) else \
                    np.concatenate([np.ones(len(d), bool) if v is None else v
                                    for d, v in zip(datas, valids)])
                cols[name] = HostCol(data, valid, c0.dtype, c0.dict_id,
                                     c0.vrange)
            return HostTable(cols)
        return HostTable.from_table(src)

    def _partitioned_join(self, node: HashJoin, psrc, bsrc):
        """Grace-style partitioned hash join across the host/HBM boundary:
        hash-partition both sides on the join keys in host RAM, then run the
        ordinary join kernels partition at a time. All partitions pad to one
        shared pow2 shape, so ONE compiled module serves every partition.
        Correct per-partition for every join type whose matches are confined
        to equal-key rows (all equi-joins): unmatched-probe emission
        (left/full outer) and build-match flags (right family) are complete
        within a partition. The reference's partitioned spill analog
        (be/src/exec/spill/partition.h, aggregate/distinct spill)."""
        from starrocks_tpu.ops import hashing
        bh = self._to_host(bsrc)
        ph = self._to_host(psrc)
        # equal string keys must hash equally: unify dictionaries first
        for pk, bk in zip(node.left_keys, node.right_keys):
            pc, bc = ph.columns[pk], bh.columns[bk]
            if (pc.dtype.is_string and bc.dtype.is_string
                    and pc.dict_id != bc.dict_id):
                va, vb = dt.dict_values(pc.dict_id), dt.dict_values(bc.dict_id)
                union = np.unique(np.concatenate([va, vb]))
                did = dt.register_dict(union)
                vr = (0, max(len(union) - 1, 0))
                la = np.searchsorted(union, va).astype(pc.data.dtype)
                lb = np.searchsorted(union, vb).astype(bc.data.dtype)
                ph.columns[pk] = HostCol(la[pc.data], pc.valid, pc.dtype,
                                         did, vr)
                bh.columns[bk] = HostCol(lb[bc.data], bc.valid, bc.dtype,
                                         did, vr)

        def dests(ht: HostTable, keys, nparts):
            datas = [ht.columns[k].data for k in keys]
            valids = [ht.columns[k].valid for k in keys]
            h = hashing.hash_columns_np(datas, valids, seed=0x9A27)
            return (h % np.uint64(nparts)).astype(np.int64)

        from starrocks_tpu.config import CONFIG
        target = max(1 << 16, CONFIG.ooc_partition_build_rows // 2)
        nparts = 1 << max(0, (bh.nrows // target).bit_length())
        bdest = dests(bh, node.right_keys, nparts)
        pdest = dests(ph, node.left_keys, nparts)
        bidx = [np.nonzero(bdest == p)[0] for p in range(nparts)]
        pidx = [np.nonzero(pdest == p)[0] for p in range(nparts)]
        # one static shape across partitions -> one compiled join module
        bcap = 1 << max(max(len(ix) for ix in bidx) - 1, 0).bit_length()
        pcap = 1 << max(max(len(ix) for ix in pidx) - 1, 0).bit_length()

        def slice_pad(ht: HostTable, idx, cap) -> Table:
            k = len(idx)
            cols = {}
            for name, c in ht.columns.items():
                data = c.data[idx]
                valid = None if c.valid is None else c.valid[idx]
                if k < cap:
                    data = np.concatenate(
                        [data, np.zeros((cap - k,), data.dtype)])
                    if valid is not None:
                        valid = np.concatenate(
                            [valid, np.zeros((cap - k,), bool)])
                cols[name] = Column(jnp.asarray(data),
                                    None if valid is None
                                    else jnp.asarray(valid),
                                    c.dtype, c.dict_id, c.vrange)
            live = jnp.asarray(np.arange(cap) < k)
            return Table(columns=cols, live=live)

        def part(i):
            p = slice_pad(ph, pidx[i], pcap)
            b = slice_pad(bh, bidx[i], bcap)
            return node.run_local(self.ctx, p, b)

        return _Stream(nparts, part)

    def _run_CrossJoin(self, node: CrossJoin):
        bt = self.table(node.right)
        bt = self.ctx.maybe_compact(node, bt, tag="cr")

        def kernel(t, b):
            n, m = t.nrows, b.nrows
            li = jnp.repeat(jnp.arange(n, dtype=jnp.int32), m)
            ri = jnp.tile(jnp.arange(m, dtype=jnp.int32), n)
            cols = {}
            for name, c in t.columns.items():
                cols[name] = Column(c.data[li],
                                    None if c.valid is None else c.valid[li],
                                    c.dtype, c.dict_id)
            for name in node.right_cols:
                c = b[name]
                cols[name] = Column(c.data[ri],
                                    None if c.valid is None else c.valid[ri],
                                    c.dtype, c.dict_id)
            live = t.live_mask()[li] & b.live_mask()[ri]
            return Table(columns=cols, live=live)

        src = self.eval(node.left)
        if isinstance(src, _Stream):
            return _Stream(src.nblocks,
                           lambda i: self.ctx.op(node, kernel, src.fn(i), bt,
                                                 key="xblk"))
        src = self.ctx.maybe_compact(node, src, tag="cl")
        return self.ctx.op(node, kernel, src, bt, key="xres")

    def _run_BroadcastScalar(self, node: BroadcastScalar):
        s = self.table(node.source)

        def kernel(t, s):
            n = t.nrows
            src_row = jnp.argmax(s.live_mask())
            for name in node.columns:
                c = s[name]
                data = jnp.broadcast_to(c.data[src_row], (n,))
                valid = None if c.valid is None else jnp.broadcast_to(
                    c.valid[src_row], (n,))
                t = t.with_column(name, Column(data, valid, c.dtype, c.dict_id))
            return t

        src = self.eval(node.child)
        if isinstance(src, _Stream):
            return _Stream(src.nblocks,
                           lambda i: self.ctx.op(node, kernel, src.fn(i), s,
                                                 key="bsblk"))
        return self.ctx.op(node, kernel, src, s, key="bsres")

    # -- streaming aggregation ---------------------------------------------
    def _run_Aggregate(self, node: Aggregate):
        src = self.eval(node.child)
        if not isinstance(src, _Stream):
            src = self.ctx.maybe_compact(node, src)
            if not node.keys:
                return self.ctx.op(
                    node, lambda t: plan_mod._global_agg(t, node.aggs), src)
            return self.ctx.op(
                node, lambda t: hash_agg.groupby(t, node.keys, node.aggs),
                src)
        mergeable = not any(a.fn in hash_agg.PCTL_FNS
                            or a.fn in hash_agg.HLL_FNS for a in node.aggs)
        if not mergeable:
            t = self.materialize(src)
            if not node.keys:
                return self.ctx.op(
                    node, lambda t: plan_mod._global_agg(t, node.aggs), t,
                    key="m")
            return self.ctx.op(
                node, lambda t: hash_agg.groupby(t, node.keys, node.aggs), t,
                key="m")
        # blockwise pre-agg -> running merge of partial states (the P8
        # two-phase decomposition applied across blocks; aggregator.cpp:858
        # state-merge analog)
        _, _, merge_specs, var_posts = _decompose(None, node)

        if not node.keys:
            # global: 1-row partial per block, trivial 2-row merges — a pure
            # reduction, no sort anywhere
            def pre(t):
                t2, pre_specs, _, _ = _decompose(t, node)
                return plan_mod._global_agg(t2, tuple(pre_specs))

            def merge(acc, part):
                return plan_mod._global_agg(concat_tables(acc, part),
                                            tuple(merge_specs))

            acc = None
            for blk in src.blocks():
                part = self.ctx.op(node, pre, blk, key="gpre")
                acc = part if acc is None else self.ctx.op(
                    node, merge, acc, part, key="gmrg")
            return _finalize(acc, var_posts, node)

        def pre(t):
            t2, pre_specs, _, _ = _decompose(t, node)
            return hash_agg.groupby(t2, node.keys, tuple(pre_specs))

        def merge(acc, part):
            return hash_agg.groupby(concat_tables(acc, part), node.keys,
                                    tuple(merge_specs))

        from starrocks_tpu.column.column import compact_table
        acc = None
        acc_cap = 0
        for blk in src.blocks():
            part = self.ctx.op(node, pre, blk, key="pre")
            if acc is None:
                acc = part
            else:
                acc = self.ctx.op(node, merge, acc, part,
                                  key=("mrg", acc.nrows, part.nrows))
            # bound the accumulator: compact to a pow2 of the live group
            # count so the merge shape stabilizes (compile count is
            # O(log G), not O(blocks))
            k = int(acc.num_live())
            cap = 1 << max(k, 16).bit_length()
            if cap < acc.nrows:
                acc_cap = max(acc_cap, cap)
                acc = self.ctx.op(
                    node, lambda t, m=acc_cap: compact_table(t, m), acc,
                    key=("acap", acc_cap, acc.nrows))
        res = _finalize(acc, var_posts, node)
        return res

    # -- order/limit/window/setop ------------------------------------------
    def _run_Sort(self, node: Sort):
        src = self.eval(node.child)
        if isinstance(src, _Stream):
            if node.limit is not None:
                # streaming top-N: per-block top-N sliced to `limit` rows,
                # constant-shape running merge (the ChunksSorterTopN analog,
                # chunks_sorter_topn.h:25)
                m = node.limit

                def slice_top(t):
                    t = sort_table(t, node.keys, m)
                    k = min(m, t.nrows)
                    cols = {n: Column(c.data[:k],
                                      None if c.valid is None
                                      else c.valid[:k],
                                      c.dtype, c.dict_id)
                            for n, c in t.columns.items()}
                    live = None if t.live is None else t.live[:k]
                    return Table(columns=cols, live=live)

                acc = None
                for blk in src.blocks():
                    top = self.ctx.op(node, slice_top, blk, key="topn")
                    acc = top if acc is None else self.ctx.op(
                        node,
                        lambda a, b: slice_top(concat_tables(a, b)),
                        acc, top, key="mergetop")
                return self.ctx.op(
                    node, lambda t: sort_table(t, node.keys, m), acc,
                    key="fintop")
            src = self.materialize(src)
        src = self.ctx.maybe_compact(node, src)
        return self.ctx.op(
            node, lambda t: sort_table(t, node.keys, node.limit), src)

    def _run_Limit(self, node: Limit):
        from starrocks_tpu.ops import scan_utils as su
        src = self.eval(node.child)

        def kernel(t):
            live = t.live_mask()
            rank = su.prefix_sum(live.astype(jnp.int32)) - 1
            return t.with_live(live & (rank < node.n))

        if isinstance(src, _Stream):
            # early-exit block loop: stop pulling once n live rows are seen
            taken = []
            have = 0
            for blk in src.blocks():
                cut = self.ctx.op(node, kernel, blk, key="lim")
                taken.append(cut)
                have += int(cut.num_live())
                if have >= node.n:
                    break
            out = taken[0]
            for t2 in taken[1:]:
                out = concat_tables(out, t2)
            return self.ctx.op(node, kernel, out, key=("lim2", out.nrows))
        return self.ctx.op(node, kernel, src, key="limres")

    def _run_GroupConcat(self, node):
        return node.finalize(self.table(node.child))

    def _run_Window(self, node: Window):
        from starrocks_tpu.ops.window import window as _window
        t = self.ctx.maybe_compact(node, self.table(node.child))
        return self.ctx.op(
            node,
            lambda t: _window(t, node.partition_by, node.order_by, node.specs),
            t)

    def _run_SetOp(self, node: SetOp):
        ls, rs = self.eval(node.left), self.eval(node.right)
        if node.kind == "union_all" and (isinstance(ls, _Stream)
                                         or isinstance(rs, _Stream)):
            lt = ls if isinstance(ls, _Stream) else _Stream(1, lambda i: ls)
            rt = rs if isinstance(rs, _Stream) else _Stream(1, lambda i: rs)
            lb, rb = lt.fn(0), rt.fn(0)
            lnames, rnames = lb.column_names(), rb.column_names()
            aligned = len(lnames) == len(rnames) and all(
                lb[a].dtype == rb[b].dtype and lb[a].dict_id == rb[b].dict_id
                for a, b in zip(lnames, rnames))
            if aligned:
                # stream concatenation: chain the two block sequences,
                # renaming right blocks positionally to the left schema
                def right_block(i):
                    t = rt.fn(i)
                    return t.rename(dict(zip(rnames, lnames)))
                return _Stream(lt.nblocks + rt.nblocks,
                               lambda i: lt.fn(i) if i < lt.nblocks
                               else right_block(i - lt.nblocks))
            # schema coercion needed (dict unify / dtype cast): materialize
        lt = self.table(node.left)
        rt = self.table(node.right)
        return node.run_local(self.ctx, lt, rt)


def _decompose(t: Optional[Table], node: Aggregate):
    """Split aggs into blockwise pre-agg specs + mergeable merge specs (the
    same var/stddev moment decomposition parallel/dist.py uses for P8)."""
    _PARTIAL = {"sum": "sum", "count": "sum", "count_star": "sum",
                "min": "min", "max": "max", "any": "any"}
    pre_specs, merge_specs, var_posts = [], [], []
    for a in node.aggs:
        if a.fn in hash_agg.VAR_FNS:
            base = f"_smom{node.node_id}_{a.out}"
            if t is not None:
                c = t[a.col]
                vf = hash_agg._as_float(c.data, c.dtype)
                t = t.with_column(base + "v", Column(vf, c.valid, dt.FLOAT64))
                t = t.with_column(base + "v2",
                                  Column(vf * vf, c.valid, dt.FLOAT64))
            pre_specs += [AggSpec("sum", base + "v", base + "s1"),
                          AggSpec("sum", base + "v2", base + "s2"),
                          AggSpec("count", a.col, base + "n")]
            merge_specs += [AggSpec("sum", base + "s1", base + "s1"),
                            AggSpec("sum", base + "s2", base + "s2"),
                            AggSpec("sum", base + "n", base + "n")]
            var_posts.append((a, base + "s1", base + "s2", base + "n"))
        else:
            pre_specs.append(a)
            merge_specs.append(AggSpec(_PARTIAL[a.fn], a.out, a.out))
    return t, pre_specs, merge_specs, var_posts


def _finalize(res: Table, var_posts, node) -> Table:
    if not var_posts:
        return res
    cols = dict(res.columns)
    for a, s1n, s2n, nnn in var_posts:
        s1, s2 = cols.pop(s1n), cols.pop(s2n)
        nn = cols.pop(nnn)
        m1 = jnp.where(s1.validity(), s1.data, 0.0) \
            if s1.valid is not None else s1.data
        m2 = jnp.where(s2.validity(), s2.data, 0.0) \
            if s2.valid is not None else s2.data
        data, ok = hash_agg._variance_from_moments(a.fn, m1, m2, nn.data)
        cols[a.out] = Column(data, ok, dt.FLOAT64)
    return Table(columns=cols, live=res.live)


def stream_execute(plan: PlanNode, tables: dict,
                   block_rows: int = 1 << 21,
                   max_retries: Optional[int] = None) -> Table:
    """Execute a plan where some base tables are HostTables, streaming them
    in `block_rows` blocks. Same capacity-retry protocol as plan.execute."""
    from starrocks_tpu.config import CONFIG
    if max_retries is None:
        max_retries = CONFIG.max_capacity_retries
    caps = dict(getattr(plan, "_stream_caps", {}))
    device_tables = {k: v for k, v in tables.items()
                     if not isinstance(v, HostTable)}
    for _ in range(max_retries):
        ctx = ExecContext(dict(device_tables), caps, eager=True)
        ex = StreamExecutor(ctx, tables, block_rows)
        out = ex.table(plan)
        if not ctx.deferred:
            break
        flags = jax.device_get(jnp.stack([f for _, f in ctx.deferred]))
        bad = [k for (k, _), f in zip(ctx.deferred, flags) if bool(f)]
        if not bad:
            break
        for k in bad:
            ctx.capacities.pop(k, None)
        caps = ctx.capacities
    plan._stream_caps = dict(ctx.capacities)
    return out
