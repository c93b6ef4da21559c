"""Query profiling + EXPLAIN.

Analog of StarRocks' RuntimeProfile (be/src/util/runtime_profile.h:132 —
hierarchical per-operator counter/timer tree rendered by EXPLAIN ANALYZE,
fe/.../sql/ExplainAnalyzer.java).

Two modes:
- explain(plan): render the physical plan tree (operator, keys, capacities).
- explain_analyze(plan, tables): run the plan once with per-node wall timing
  and input/output row counters. Nodes are executed eagerly (outside jit) so
  the boundaries are observable — production runs fuse the whole plan into
  one XLA program, so per-node times here are a *diagnostic* view (the same
  caveat applies to the reference's operator timers vs actual pipelining).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import numpy as np

from starrocks_tpu.exec import plan as plan_mod
from starrocks_tpu.exec.plan import ExecContext, PlanNode


@dataclasses.dataclass
class NodeProfile:
    name: str
    detail: str
    wall_ms: float = 0.0
    rows_out: int = 0
    mem_bytes: int = 0          # output footprint (MemTracker-consumption analog)
    children: list = dataclasses.field(default_factory=list)

    def render(self, indent: int = 0) -> str:
        pad = "  " * indent
        mem = (f"  mem={self.mem_bytes / 1e6:.2f}MB" if self.mem_bytes
               else "")
        line = (f"{pad}{self.name} [{self.detail}]  "
                f"rows={self.rows_out}  time={self.wall_ms:.2f}ms{mem}")
        return "\n".join([line] + [c.render(indent + 1) for c in self.children])


def _describe(node: PlanNode) -> str:
    t = type(node).__name__
    if t == "Scan":
        return f"table={node.table}"
    if t == "Filter":
        return "predicate"
    if t in ("Project", "AddColumns"):
        return f"exprs={list(node.outputs)[:4]}"
    if t == "HashJoin":
        return (f"{node.join_type} {node.left_keys}={node.right_keys} "
                f"cap={node.capacity} unique={node.unique}")
    if t == "Aggregate":
        return f"keys={node.keys} aggs={[a.fn for a in node.aggs]} est={node.est_groups}"
    if t == "Sort":
        return f"keys={[(k.name, 'asc' if k.asc else 'desc') for k in node.keys]} limit={node.limit}"
    if t == "Limit":
        return f"n={node.n}"
    if t == "BroadcastScalar":
        return f"cols={node.columns}"
    return ""


def explain(plan: PlanNode) -> str:
    """Physical plan tree (EXPLAIN)."""
    def render(node, indent):
        pad = "  " * indent
        lines = [f"{pad}{type(node).__name__} [{_describe(node)}]"]
        for c in node.children():
            lines.extend(render(c, indent + 1))
        return lines
    return "\n".join(render(plan, 0))


def explain_analyze(plan: PlanNode, tables, capacities: Optional[dict] = None):
    """Run eagerly with per-node timing. Returns (result Table, NodeProfile)."""
    caps = dict(capacities or getattr(plan, "_converged_caps", {}))
    ctx = ExecContext(tables, caps, eager=True)
    ctx.profile = True
    profiles: dict[int, NodeProfile] = {}

    def run(node: PlanNode) -> object:
        prof = NodeProfile(type(node).__name__, _describe(node))
        profiles[id(node)] = prof
        # time this node exclusive of children: run children first
        child_tables = {}
        originals = {}
        for c in node.children():
            out = run(c)
            prof.children.append(profiles[id(c)])
            child_tables[id(c)] = out
        # substitute child results so node.run doesn't recurse
        class _Const:
            def __init__(self, t):
                self.t = t
            def run(self, ctx):
                return self.t
        saved = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, PlanNode):
                saved[f.name] = v
                object.__setattr__(node, f.name, _Const(child_tables[id(v)]))
        try:
            t0 = time.perf_counter()
            out = node.run(ctx)
            n = int(np.asarray(out.num_live()))  # forces completion
            prof.wall_ms = (time.perf_counter() - t0) * 1e3
            prof.rows_out = n
            rf = ctx.counters.get((node.node_id, "rf_rows_dropped"))
            if rf is not None:
                prof.detail += f" rf_rows_dropped={rf}"
            mem = 0
            for c in out.columns.values():
                mem += c.data.nbytes
                if c.valid is not None:
                    mem += c.valid.nbytes
            if out.live is not None:
                mem += out.live.nbytes
            prof.mem_bytes = mem
        finally:
            for name, v in saved.items():
                object.__setattr__(node, name, v)
        return out

    result = run(plan)
    root = profiles[id(plan)]
    # per-operator eager execution dispatches one (or a few) jitted modules
    # per node; the production warm path fuses the converged plan into ONE
    # module (exec.plan.execute frozen path), so report both numbers
    root.detail += (f" dispatches={getattr(ctx, 'dispatches', 0)}"
                    " (warm frozen path: 1)")
    return result, root


def capture_trace(fn, trace_dir: str):
    """Run `fn()` under the XLA/TPU profiler (xprof) and dump the trace to
    `trace_dir` (viewable in xprof/TensorBoard: per-HLO device timelines,
    fusion boundaries, HBM traffic). The device-truth complement of
    explain_analyze's eager per-operator wall timing — the RuntimeProfile
    text tree vs the reference's pipeline-driver trace events
    (be/src/util/runtime_profile.h:132 vs query trace spans).
    """
    import jax

    with jax.profiler.trace(trace_dir):
        out = fn()
        jax.block_until_ready(
            [x for x in jax.tree_util.tree_leaves(out)
             if hasattr(x, "block_until_ready")] or [jax.numpy.zeros(())])
    return out
