"""Predicate selectivity estimation from ANALYZE statistics.

Analog of the reference's derived-statistics layer
(fe/.../sql/optimizer/statistics/StatisticsCalculator.java:185 — per-operator
ColumnStatistic/Histogram propagation feeding the cost model). Scope here:
estimate the surviving fraction of a single-table conjunct from the
catalog's sampled NDV / min-max / equi-height histogram (catalog.ColumnStats)
so the planner's filtered-size estimates — and through them the cost-based
join order — track the data instead of a flat default.

Estimates are deliberately coarse (sampled stats, independence across
conjuncts); they only need to rank join candidates, not predict runtime.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from starrocks_tpu.sql import ast
from starrocks_tpu.sql.catalog import ColumnStats, TableMeta

DEFAULT_SEL = 0.3      # the planner's historical flat guess — the fallback
_EQ_FLOOR = 1e-6


def lit_value(node: ast.Node, col_dtype) -> Optional[float]:
    """Literal -> storage-unit numeric value for comparison against stats
    (dates are day numbers, decimals scaled ints). None when not literal
    or not comparable in storage units."""
    if not isinstance(node, ast.Lit):
        return None
    if node.kind == "int":
        v = node.value
        if col_dtype is not None and col_dtype.is_decimal:
            v *= 10 ** col_dtype.scale
        return float(v)
    if node.kind == "decimal":
        if col_dtype is None or not col_dtype.is_decimal:
            return float(node.value) / 10 ** node.scale
        if col_dtype.scale >= node.scale:
            return float(node.value * 10 ** (col_dtype.scale - node.scale))
        return None
    if node.kind == "date":
        return float(node.value)
    return None


def _range_sel(st: ColumnStats, lo: Optional[float], hi: Optional[float],
               lo_open: bool = False, hi_open: bool = False) -> float:
    """P(lo <= col <= hi) from histogram (preferred) or min/max."""
    h = st.histogram
    if h is not None and len(h) > 2:
        n = len(h) - 1
        a = 0.0 if lo is None else np.searchsorted(h, lo, "left") / n
        b = 1.0 if hi is None else np.searchsorted(h, hi, "right") / n
        frac = max(0.0, min(b, 1.0) - max(a - 1.0 / n, 0.0))
        return float(min(1.0, max(frac, _EQ_FLOOR)))
    if st.min is None or st.max is None or st.max <= st.min:
        return DEFAULT_SEL
    span = st.max - st.min
    a = st.min if lo is None else max(lo, st.min)
    b = st.max if hi is None else min(hi, st.max)
    if b < a:
        return _EQ_FLOOR
    return float(min(1.0, max((b - a) / span, _EQ_FLOOR)))


def _cmp_sel(st: ColumnStats, op: str, v: float) -> float:
    if op == "=":
        return min(1.0, max(1.0 / max(st.ndv, 1), _EQ_FLOOR))
    if op in ("!=", "<>"):
        return 1.0 - min(1.0, 1.0 / max(st.ndv, 1))
    if op in ("<", "<="):
        return _range_sel(st, None, v)
    if op in (">", ">="):
        return _range_sel(st, v, None)
    return DEFAULT_SEL


def _flip(op: str) -> str:
    return {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op, op)


def _col_stats(meta: TableMeta, col: ast.Col) -> Optional[ColumnStats]:
    return meta.stats.get(col.name)


def pred_selectivity(meta: Optional[TableMeta], pred: ast.Node,
                     fold=None) -> float:
    """Estimated surviving fraction of `pred` over `meta`'s table.
    `fold` is the planner's constant folder (avoids an import cycle)."""
    if meta is None:
        return DEFAULT_SEL
    if fold is None:
        from starrocks_tpu.sql.planner import fold_const as fold
    p = pred
    if isinstance(p, ast.BinOp) and p.op in ("and", "or"):
        sl = pred_selectivity(meta, p.left, fold)
        sr = pred_selectivity(meta, p.right, fold)
        return sl * sr if p.op == "and" else min(1.0, sl + sr - sl * sr)
    if isinstance(p, ast.UnaryOp) and p.op == "not":
        return max(_EQ_FLOOR, 1.0 - pred_selectivity(meta, p.child, fold))
    if isinstance(p, ast.BinOp) and p.op in ("=", "!=", "<>", "<", "<=",
                                             ">", ">="):
        l, r = fold(p.left), fold(p.right)
        if isinstance(l, ast.Col) and isinstance(r, ast.Lit):
            col, op, lit = l, p.op, r
        elif isinstance(r, ast.Col) and isinstance(l, ast.Lit):
            col, op, lit = r, _flip(p.op), l
        else:
            return DEFAULT_SEL
        st = _col_stats(meta, col)
        if st is None:
            return DEFAULT_SEL
        if lit.kind == "string":
            # dict-code order isn't visible here; eq/neq still have NDV
            if op == "=":
                return min(1.0, 1.0 / max(st.ndv, 1))
            if op in ("!=", "<>"):
                return 1.0 - min(1.0, 1.0 / max(st.ndv, 1))
            return DEFAULT_SEL
        v = lit_value(lit, meta.schema.get(col.name))
        if v is None:
            return DEFAULT_SEL
        return _cmp_sel(st, op, v)
    if isinstance(p, ast.BetweenExpr):
        e = fold(p.expr)
        if not isinstance(e, ast.Col):
            return DEFAULT_SEL
        st = _col_stats(meta, e)
        if st is None:
            return DEFAULT_SEL
        lo = lit_value(fold(p.lo), meta.schema.get(e.name))
        hi = lit_value(fold(p.hi), meta.schema.get(e.name))
        if lo is None or hi is None:
            return DEFAULT_SEL
        s = _range_sel(st, lo, hi)
        return max(_EQ_FLOOR, 1.0 - s) if p.negated else s
    if isinstance(p, ast.InList):
        e = fold(p.expr)
        st = _col_stats(meta, e) if isinstance(e, ast.Col) else None
        if st is None:
            return DEFAULT_SEL
        s = min(1.0, len(p.values) / max(st.ndv, 1))
        return max(_EQ_FLOOR, 1.0 - s) if p.negated else s
    if isinstance(p, ast.IsNullExpr):
        e = fold(p.expr)
        st = _col_stats(meta, e) if isinstance(e, ast.Col) else None
        if st is None:
            return 0.1 if not p.negated else 0.9
        nf = st.null_frac
        return max(_EQ_FLOOR, (1.0 - nf) if p.negated else max(nf, _EQ_FLOOR))
    if isinstance(p, ast.LikeExpr):
        # prefix patterns are ~range scans; contains patterns rarer
        return 0.1 if not p.negated else 0.9
    return DEFAULT_SEL
