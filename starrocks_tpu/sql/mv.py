"""Materialized views with transparent query rewrite.

Analog of the reference's async materialized views
(fe/fe-core/src/main/java/com/starrocks/catalog/MaterializedView.java) and
the SPJG rewrite rules
(fe/.../sql/optimizer/rule/transformation/materialization/
AggregatedMaterializedViewRewriter.java): a view's defining query is
materialized into an ordinary device-resident table, and later queries that
are subsumed by the view are rewritten to scan the (much smaller)
materialization instead of the base table.

TPU-first design: because registered tables are immutable between catalog
versions, an MV is simply a cached Table keyed by the defining SQL — refresh
is "recompute on base-table re-register" (the reference's auto-refresh task,
fe/.../scheduler/mv/MVMaintenanceJob semantics, without the incremental
apply since there are no incremental writes). The rewrite happens on the
AST before planning, so the rewritten query flows through the normal
planner/executor and compiles to the same frozen whole-query module as any
other query.

Supported rewrites (MaterializedViewRewriter.java's SPJG scope, reduced to
the single-table case):
  1. exact match — query AST == view AST up to qualifiers;
  2. aggregate rollup — view is  SELECT dims, aggs FROM t [WHERE p]
     GROUP BY dims  and the query groups by a SUBSET of dims with
     re-aggregable functions (sum/min/max; count rolls up as sum of
     counts; avg(x) rolls up when the view carries both sum(x) and
     count(x)), with the query predicate either equal to the view's or a
     residual expressible over the view's dims.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional

from starrocks_tpu.sql import ast
from starrocks_tpu.sql.parser import parse
from starrocks_tpu.sql.planner import AGG_FN_NAMES, _ast_equal, conjuncts, _and_all


@dataclasses.dataclass
class MaterializedView:
    name: str
    sql: str                     # defining SELECT text
    table_name: str              # storage table registered in the session
    base_tables: list            # table names the definition reads
    stmt: ast.SelectStmt         # parsed definition (qualifiers stripped)
    out_names: list              # storage column name per select item
    # SPJG decomposition (None => only exact-match rewrite applies)
    dims: Optional[list] = None  # [(expr, colname)] group-by dims in items
    aggs: Optional[list] = None  # [(Func, colname)]
    where: Optional[ast.Node] = None


def _strip_quals(node):
    """Deep-copy with every Col qualifier dropped — single-table ASTs are
    unambiguous, and the reference's ColumnRewriter likewise compares in a
    normalized column space (materialization/ColumnRewriter.java)."""
    if isinstance(node, ast.Col):
        return ast.Col(node.name, None)
    if isinstance(node, list):
        return [_strip_quals(x) for x in node]
    if isinstance(node, tuple):
        return tuple(_strip_quals(x) for x in node)
    if dataclasses.is_dataclass(node) and isinstance(node, ast.Node):
        return type(node)(**{f.name: _strip_quals(getattr(node, f.name))
                             for f in dataclasses.fields(node)})
    return node


def _base_tables(stmt) -> list:
    out = []

    def walk(n):
        if isinstance(n, ast.TableRef):
            out.append(n.name)
        elif isinstance(n, ast.SubqueryRef):
            walk(n.query)
        elif isinstance(n, ast.JoinClause):
            walk(n.ref)
        elif isinstance(n, (ast.SelectStmt, ast.SetOpStmt, ast.WithStmt)):
            for f in dataclasses.fields(n):
                v = getattr(n, f.name)
                if isinstance(v, list):
                    for x in v:
                        walk(x)
                elif isinstance(v, ast.Node):
                    walk(v)

    walk(stmt)
    return sorted(set(out))


def _is_simple_select(s) -> bool:
    return (isinstance(s, ast.SelectStmt) and len(s.froms) == 1
            and isinstance(s.froms[0], ast.TableRef) and not s.joins
            and not s.star and not s.distinct and s.grouping_sets is None)


def _has_subquery_or_window(stmt) -> bool:
    found = []

    def walk(n):
        if isinstance(n, (ast.ScalarSubquery, ast.ExistsExpr, ast.InSubquery,
                          ast.WindowExpr, ast.SubqueryRef, ast.WithStmt)):
            found.append(n)
            return
        if isinstance(n, list):
            for x in n:
                walk(x)
        elif isinstance(n, tuple):
            for x in n:
                walk(x)
        elif dataclasses.is_dataclass(n) and isinstance(n, ast.Node):
            for f in dataclasses.fields(n):
                walk(getattr(n, f.name))

    walk(stmt)
    return bool(found)


def analyze_mv(name: str, sql: str, out_names: list) -> MaterializedView:
    """Parse the defining query and extract the SPJG shape if it has one.
    `out_names` are the storage table's column names, positionally aligned
    with the definition's select items."""
    stmt = _strip_quals(parse(sql))
    mv = MaterializedView(name=name, sql=sql, table_name=f"__mv_{name}",
                          base_tables=_base_tables(stmt), stmt=stmt,
                          out_names=list(out_names))
    s = stmt
    if not _is_simple_select(s) or _has_subquery_or_window(s):
        return mv
    if s.having is not None or s.order_by or s.limit is not None:
        return mv
    dims, aggs = [], []
    for item, cname in zip(s.items, out_names):
        e = item.expr
        inner = []
        _collect_agg_fns(e, inner)
        if isinstance(e, ast.Func) and e.name in AGG_FN_NAMES:
            if e.distinct or e.name not in ("sum", "count", "min", "max",
                                            "avg"):
                return mv          # not re-aggregable => exact match only
            aggs.append((e, cname))
        elif inner:
            return mv              # agg buried in an expression: bail
        else:
            if not any(_ast_equal(e, g) for g in s.group_by):
                return mv
            dims.append((e, cname))
    # every group-by dim must be projected, or subset queries can't group
    for g in s.group_by:
        if not any(_ast_equal(g, d) for d, _ in dims):
            return mv
    if not aggs and not s.group_by:
        return mv                  # plain projection: exact match only
    mv.dims, mv.aggs, mv.where = dims, aggs, s.where
    return mv


def _collect_agg_fns(node, out):
    if isinstance(node, ast.Func) and node.name in AGG_FN_NAMES:
        out.append(node)
        return
    if isinstance(node, list):
        for x in node:
            _collect_agg_fns(x, out)
    elif isinstance(node, tuple):
        for x in node:
            _collect_agg_fns(x, out)
    elif dataclasses.is_dataclass(node) and isinstance(node, ast.Node):
        for f in dataclasses.fields(node):
            _collect_agg_fns(getattr(node, f.name), out)


class _NoRewrite(Exception):
    pass


def _map_agg(f: ast.Func, mv: MaterializedView) -> ast.Node:
    """Map a query aggregate onto a re-aggregation over MV columns
    (AggregateFunctionRewriter.java's rollup table)."""
    if f.distinct:
        raise _NoRewrite
    if f.name == "avg":
        sum_c = cnt_c = None
        for mf, cname in mv.aggs:
            if mf.name == "sum" and _ast_equal(mf.args[0], f.args[0]):
                sum_c = cname
            if (mf.name == "count" and not mf.star and mf.args
                    and _ast_equal(mf.args[0], f.args[0])):
                cnt_c = cname
        if sum_c is None or cnt_c is None:
            raise _NoRewrite
        return ast.BinOp("/", ast.Func("sum", [ast.Col(sum_c)]),
                         ast.Func("sum", [ast.Col(cnt_c)]))
    for mf, cname in mv.aggs:
        if mf.name != f.name or mf.star != f.star:
            continue
        if f.star or all(_ast_equal(a, b) for a, b in zip(mf.args, f.args)):
            if f.name == "count":     # counts roll up by summation
                return ast.Func("coalesce",
                                [ast.Func("sum", [ast.Col(cname)]),
                                 ast.Lit(0, "int")])
            return ast.Func(f.name, [ast.Col(cname)])
    raise _NoRewrite


def _map_expr(node, mv: MaterializedView, allow_aggs: bool,
              aliases: frozenset = frozenset()):
    """Rewrite an expression over the base table into one over the MV's
    storage columns. Dims map to their columns; aggregates map through
    _map_agg; select-item aliases (legal in HAVING/ORDER BY) pass through;
    anything else recurses. An unmapped base Col fails."""
    for d, cname in mv.dims:
        if _ast_equal(node, d):
            return ast.Col(cname)
    if isinstance(node, ast.Func) and node.name in AGG_FN_NAMES:
        if not allow_aggs:
            raise _NoRewrite
        return _map_agg(node, mv)
    if isinstance(node, ast.Col):
        if node.name in aliases:      # refers to the rewritten output item
            return ast.Col(node.name)
        raise _NoRewrite              # base column not derivable from the MV
    if isinstance(node, list):
        return [_map_expr(x, mv, allow_aggs, aliases) for x in node]
    if isinstance(node, tuple):
        return tuple(_map_expr(x, mv, allow_aggs, aliases) for x in node)
    if dataclasses.is_dataclass(node) and isinstance(node, ast.Node):
        return type(node)(**{f.name: _map_expr(getattr(node, f.name), mv,
                                               allow_aggs, aliases)
                             for f in dataclasses.fields(node)})
    return node


def _rewrite_where(q_where, mv: MaterializedView):
    """Return the residual predicate (over MV columns) after subtracting the
    MV's own predicate, or raise if the query isn't subsumed
    (AndRangePredicate.java's containment check, reduced to conjunct
    equality + dim-expressible residuals)."""
    q = conjuncts(_strip_quals(q_where)) if q_where is not None else []
    m = conjuncts(mv.where) if mv.where is not None else []
    residual = []
    for c in q:
        if any(_ast_equal(c, mc) for mc in m):
            continue
        residual.append(_map_expr(c, mv, allow_aggs=False))
    # every MV conjunct must be present in the query, else the MV filtered
    # rows the query wants
    for mc in m:
        if not any(_ast_equal(mc, qc) for qc in q):
            raise _NoRewrite
    return _and_all(residual)


def try_rewrite(stmt, mviews: dict) -> Optional[ast.SelectStmt]:
    """Attempt to rewrite a parsed query against the registered MVs; returns
    the rewritten SelectStmt (scanning the MV's storage table) or None.
    First match wins in registration order (BestMvSelector.java picks by
    cost; with single-table MVs the first subsuming view is minimal)."""
    for mv in mviews.values():
        got = _try_one(stmt, mv)
        if got is not None:
            return got
    return None


def _try_one(stmt, mv: MaterializedView) -> Optional[ast.SelectStmt]:
    if not isinstance(stmt, ast.SelectStmt):
        return None
    norm = _strip_quals(stmt)
    # 1. exact match: swap the whole query for a scan of the materialization
    if _ast_equal(norm, mv.stmt):
        return ast.SelectStmt(
            items=[ast.SelectItem(ast.Col(c), alias=c)
                   for c in mv.out_names],
            star=False, froms=[ast.TableRef(mv.table_name)], joins=[],
            where=None, group_by=[], having=None, order_by=[], limit=None)
    # 2. aggregate rollup
    if mv.dims is None:
        return None
    if not _is_simple_select(norm) or _has_subquery_or_window(norm):
        return None
    if norm.froms[0].name != mv.base_tables[0]:
        return None
    if norm.grouping_sets is not None:
        return None
    try:
        residual = _rewrite_where(norm.where, mv)
        for g in norm.group_by:
            if not any(_ast_equal(g, d) for d, _ in mv.dims):
                raise _NoRewrite
        items = [ast.SelectItem(_map_expr(it.expr, mv, allow_aggs=True),
                                it.alias)
                 for it in norm.items]
        aliases = frozenset(it.alias for it in norm.items if it.alias)
        group_by = [_map_expr(g, mv, allow_aggs=False)
                    for g in norm.group_by]
        having = (None if norm.having is None
                  else _map_expr(norm.having, mv, allow_aggs=True, aliases=aliases))
        order_by = [(_map_expr(e, mv, allow_aggs=True, aliases=aliases), asc)
                    for e, asc in norm.order_by]
    except _NoRewrite:
        return None
    return ast.SelectStmt(items=items, star=False,
                          froms=[ast.TableRef(mv.table_name)], joins=[],
                          where=residual, group_by=group_by, having=having,
                          order_by=order_by, limit=norm.limit)


# -- DDL front-end -----------------------------------------------------------

_CREATE = re.compile(r"(?is)^create\s+materialized\s+view\s+(\w+)\s+as\s+(.*)$")
_DROP = re.compile(r"(?is)^drop\s+materialized\s+view\s+(?:if\s+exists\s+)?(\w+)$")
_REFRESH = re.compile(r"(?is)^refresh\s+materialized\s+view\s+(\w+)$")


def match_ddl(text: str):
    """Classify MV DDL: returns ('create', name, select) | ('drop', name)
    | ('refresh', name) | None."""
    s = text.strip().rstrip(";")
    m = _CREATE.match(s)
    if m:
        return ("create", m.group(1), m.group(2))
    m = _DROP.match(s)
    if m:
        return ("drop", m.group(1))
    m = _REFRESH.match(s)
    if m:
        return ("refresh", m.group(1))
    return None
