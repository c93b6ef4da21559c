"""SQL planner: bound AST -> physical plan.

This is the engine's FE: the combined analog of StarRocks' Analyzer
(fe/.../sql/analyzer/), optimizer rewrites (subquery decorrelation, predicate
pushdown, two-phase agg split — fe/.../sql/optimizer/rule/transformation/)
and PlanFragmentBuilder (fe/.../sql/plan/PlanFragmentBuilder.java:255).
Instead of a cascades memo search it uses cost heuristics:

- predicate pushdown: single-relation conjuncts filter their scan; common
  equi conjuncts are factored out of OR disjunctions (Q19 shape)
- greedy join order: the largest relation streams as the probe side; each
  connected relation joins build-side when its join keys are unique (FK->PK;
  the cost-model analog of HashJoinCostModel.java picking the small side),
  with probe/build flip or fanout-capped expansion when not
- subquery decorrelation:
  * scalar subqueries (correlated or not) are rewritten to GROUP BY on the
    correlation columns + join / BroadcastScalar; avg comparisons stay exact
    by keeping sum/count as a fraction and cross-multiplying
  * [NOT] IN / EXISTS -> semi/anti hash join
  * EXISTS with a `<>` correlation conjunct (TPC-H Q21) -> min/max group
    decorrelation: exists(y != x in group) == (min != x or max != x)
- aggregates: avg -> sum+count, count(distinct) -> two-level distinct agg
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Optional

import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.exprs import expr as E
from starrocks_tpu.exec.plan import (
    AddColumns, Aggregate, BroadcastScalar, CrossJoin, Filter, GroupConcat,
    HashJoin, Limit, PlanNode, Project, Scan, Sort, Window,
)
from starrocks_tpu.ops.hash_agg import AggSpec
from starrocks_tpu.ops.sort import SortKey
from starrocks_tpu.sql import ast
from starrocks_tpu.sql.catalog import Catalog
from starrocks_tpu.sql import selectivity

_uid = itertools.count()


def _gen(prefix="c"):
    return f"_{prefix}{next(_uid)}"


@dataclasses.dataclass
class Relation:
    """A planned FROM item (or join stream): plan + name binding + props.

    maps: qualifier -> {sql column name -> plan column name}. A merged join
    stream keeps one entry per original table alias so self-join qualifiers
    (n1.n_name vs n2.n_name) resolve correctly.
    """
    plan: PlanNode
    maps: dict[str, dict[str, str]]
    unique_keys: list[tuple[str, ...]]
    size: int
    # global-aggregate SELECTs produce exactly one row; such relations
    # cross-join as broadcasts (the reference plans these as a 1-row
    # cross join, e.g. TPC-DS q28/q61/q88/q90)
    single_row: bool = False
    # base table name when this relation is a direct table reference
    # (enables zone-map pruning of pushdown predicates)
    base: Optional[str] = None
    # row count BEFORE filters (the base table's cardinality) — the
    # denominator of filter-survival fractions in the join cost model;
    # None for derived relations (falls back to size)
    base_rows: Optional[int] = None

    @property
    def unfiltered_rows(self) -> int:
        return self.base_rows if self.base_rows else max(self.size, 1)

    @property
    def aliases(self):
        return set(self.maps)

    def lookup(self, col: ast.Col) -> Optional[str]:
        if col.qualifier is not None:
            m = self.maps.get(col.qualifier)
            return m.get(col.name) if m else None
        hits = [m[col.name] for m in self.maps.values() if col.name in m]
        if len(hits) > 1 and len(set(hits)) > 1:
            raise ValueError(f"ambiguous column {col}")
        return hits[0] if hits else None

    def all_plan_cols(self) -> list[str]:
        out = []
        for m in self.maps.values():
            out.extend(m.values())
        return list(dict.fromkeys(out))

    def filtered(self, pred: E.Expr, sel: float = 0.3) -> "Relation":
        return dataclasses.replace(self, plan=Filter(self.plan, pred),
                                   size=max(1, int(self.size * sel)))


class Scope:
    def __init__(self, relations: list[Relation], parent: Optional["Scope"] = None):
        self.relations = relations
        self.parent = parent

    def resolve(self, col: ast.Col):
        """-> (relation, plan_name, depth); depth 0 = local, 1+ = outer."""
        depth = 0
        scope = self
        while scope is not None:
            hits = []
            for r in scope.relations:
                pn = r.lookup(col)
                if pn is not None:
                    hits.append((r, pn))
            if len(hits) > 1 and len({pn for _, pn in hits}) > 1:
                raise ValueError(f"ambiguous column {col}")
            if hits:
                return hits[0][0], hits[0][1], depth
            scope = scope.parent
            depth += 1
        raise ValueError(f"cannot resolve column {col}")


# ---------------------------------------------------------------------------
# expression utilities over the AST
# ---------------------------------------------------------------------------

def fold_const(node: ast.Node) -> ast.Node:
    """Constant folding, mainly date ± interval (TPC-H literal arithmetic)."""
    if isinstance(node, ast.BinOp):
        l, r = fold_const(node.left), fold_const(node.right)
        if isinstance(l, ast.Lit) and isinstance(r, ast.Lit):
            if l.kind == "date" and r.kind == "interval":
                days = l.value
                sign = 1 if node.op == "+" else -1
                if r.months:
                    d = np.datetime64("1970-01-01") + np.timedelta64(days, "D")
                    m = d.astype("datetime64[M]") + sign * r.months
                    rem = (d - d.astype("datetime64[M]")).astype(int)
                    nd = m.astype("datetime64[D]") + rem
                    return ast.Lit(int((nd - np.datetime64("1970-01-01")).astype(int)), "date")
                return ast.Lit(days + sign * r.value, "date")
            if l.kind == "int" and r.kind == "int" and node.op in "+-*":
                v = {"+": l.value + r.value, "-": l.value - r.value,
                     "*": l.value * r.value}[node.op]
                return ast.Lit(v, "int")
            if (l.kind in ("int", "decimal") and r.kind in ("int", "decimal")
                    and node.op == "/"):
                # fold constant division (q23's `50/100.0`) to a decimal
                lv = l.value / (10 ** l.scale if l.kind == "decimal" else 1)
                rv = r.value / (10 ** r.scale if r.kind == "decimal" else 1)
                if rv != 0:
                    v = lv / rv
                    scaled = round(v * 10**6)
                    if abs(scaled / 10**6 - v) < 1e-12:
                        return ast.Lit(scaled, "decimal", 6)
        return ast.BinOp(node.op, l, r)
    if isinstance(node, ast.UnaryOp) and node.op == "-":
        c = fold_const(node.child)
        if isinstance(c, ast.Lit) and c.kind in ("int", "decimal"):
            return ast.Lit(-c.value, c.kind, c.scale)
        return ast.UnaryOp("-", c)
    return node


def conjuncts(node: Optional[ast.Node]) -> list[ast.Node]:
    if node is None:
        return []
    if isinstance(node, ast.BinOp) and node.op == "and":
        return conjuncts(node.left) + conjuncts(node.right)
    return [node]


def _and_all(nodes: list[ast.Node]) -> Optional[ast.Node]:
    if not nodes:
        return None
    out = nodes[0]
    for n in nodes[1:]:
        out = ast.BinOp("and", out, n)
    return out


def factor_or(node: ast.Node) -> list[ast.Node]:
    """Factor conjuncts common to every OR branch out of the disjunction
    (Q19's `(p=l and ...) or (p=l and ...)` -> `p=l` + residual OR)."""
    if not (isinstance(node, ast.BinOp) and node.op == "or"):
        return [node]
    branches = []
    def flat(n):
        if isinstance(n, ast.BinOp) and n.op == "or":
            flat(n.left); flat(n.right)
        else:
            branches.append(conjuncts(n))
    flat(node)
    common = []
    for c in branches[0]:
        if all(any(_ast_equal(c, d) for d in b) for b in branches[1:]):
            common.append(c)
    if not common:
        return [node]
    residual_branches = []
    for b in branches:
        rest = [d for d in b if not any(_ast_equal(d, c) for c in common)]
        residual_branches.append(_and_all(rest) or ast.Lit(True, "bool"))
    residual = residual_branches[0]
    for r in residual_branches[1:]:
        residual = ast.BinOp("or", residual, r)
    return common + [residual]


def collect_cols(node) -> list[ast.Col]:
    out = []
    def walk(n):
        if isinstance(n, ast.Col):
            out.append(n)
        elif isinstance(n, ast.InSubquery):
            walk(n.expr)
        elif isinstance(n, (ast.ScalarSubquery, ast.ExistsExpr)):
            pass  # inner columns bind in their own scope
        elif dataclasses.is_dataclass(n):
            for f in dataclasses.fields(n):
                v = getattr(n, f.name)
                if isinstance(v, list):
                    for x in v:
                        if isinstance(x, tuple):
                            for y in x:
                                if isinstance(y, ast.Node):
                                    walk(y)
                        elif isinstance(x, ast.Node):
                            walk(x)
                elif isinstance(v, ast.Node):
                    walk(v)
    walk(node)
    return out


def contains_subquery(node) -> bool:
    found = []
    def walk(n):
        if isinstance(n, (ast.ScalarSubquery, ast.ExistsExpr, ast.InSubquery)):
            found.append(n)
        elif dataclasses.is_dataclass(n):
            for f in dataclasses.fields(n):
                v = getattr(n, f.name)
                if isinstance(v, list):
                    for x in v:
                        if isinstance(x, tuple):
                            for y in x:
                                if isinstance(y, ast.Node):
                                    walk(y)
                        elif isinstance(x, ast.Node):
                            walk(x)
                elif isinstance(v, ast.Node):
                    walk(v)
    walk(node)
    return bool(found)


# SQL aggregate name -> engine AggSpec fn. VARIANCE/STDDEV map to the
# population flavor, matching StarRocks/MySQL (fe FunctionSet aliases
# variance=var_pop, std/stddev=stddev_pop).
AGG_NAME_MAP = {
    "sum": "sum", "count": "count", "min": "min", "max": "max",
    "variance": "var_pop", "var_pop": "var_pop", "var_samp": "var_samp",
    "stddev": "stddev_pop", "std": "stddev_pop", "stddev_pop": "stddev_pop",
    "stddev_samp": "stddev_samp",
    "percentile_cont": "percentile_cont", "percentile_disc": "percentile_disc",
}
# distinct-cardinality family (be/src/types/hll.h, bitmap_union_count).
# The approximate members (approx_count_distinct / ndv / hll_union_agg) run
# as real HLL register sketches (ops/hash_agg HLL_FNS) — no sort of the
# input, pmax-mergeable distributed; the exact members
# (bitmap_union_count(to_bitmap), multi_distinct_count, COUNT(DISTINCT))
# run as two-level exact distinct aggregation. `to_bitmap`/`hll_hash`
# inner wrappers are unwrapped at plan time.
DISTINCT_SKETCH_FNS = ("approx_count_distinct", "ndv", "bitmap_union_count",
                       "hll_union_agg", "multi_distinct_count")
APPROX_DISTINCT_FNS = ("approx_count_distinct", "ndv", "hll_union_agg")
AGG_FN_NAMES = ("avg", "group_concat") + DISTINCT_SKETCH_FNS \
    + tuple(AGG_NAME_MAP)

WINDOW_FN_NAMES = ("row_number", "rank", "dense_rank", "percent_rank",
                   "cume_dist", "ntile", "lag", "lead", "first_value",
                   "last_value", "sum", "min", "max", "count", "avg")


def collect_windows(node, out: list):
    if isinstance(node, ast.WindowExpr):
        out.append(node)
        return
    if isinstance(node, (ast.ScalarSubquery, ast.ExistsExpr, ast.InSubquery)):
        return
    if dataclasses.is_dataclass(node):
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, list):
                for x in v:
                    if isinstance(x, tuple):
                        for y in x:
                            if isinstance(y, ast.Node):
                                collect_windows(y, out)
                    elif isinstance(x, ast.Node):
                        collect_windows(x, out)
            elif isinstance(v, ast.Node):
                collect_windows(v, out)


def collect_aggs(node, out: list):
    if isinstance(node, ast.WindowExpr):
        # the window fn itself is not a group aggregate, but aggregates may
        # appear inside its argument / partition / order expressions
        # (rank() over (order by sum(x)))
        for a in node.func.args:
            collect_aggs(a, out)
        for e in node.partition_by:
            collect_aggs(e, out)
        for e, _ in node.order_by:
            collect_aggs(e, out)
        return
    if isinstance(node, ast.Func) and node.name in AGG_FN_NAMES:
        out.append(node)
        return
    if isinstance(node, (ast.ScalarSubquery, ast.ExistsExpr, ast.InSubquery)):
        return
    if dataclasses.is_dataclass(node):
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, list):
                for x in v:
                    if isinstance(x, tuple):
                        for y in x:
                            if isinstance(y, ast.Node):
                                collect_aggs(y, out)
                    elif isinstance(x, ast.Node):
                        collect_aggs(x, out)
            elif isinstance(v, ast.Node):
                collect_aggs(v, out)


def _ast_equal(a, b) -> bool:
    if type(a) is not type(b):
        return False
    if isinstance(a, ast.Col):
        return a.name == b.name and (a.qualifier == b.qualifier
                                     or a.qualifier is None or b.qualifier is None)
    if not dataclasses.is_dataclass(a):
        return a == b
    for f in dataclasses.fields(a):
        va, vb = getattr(a, f.name), getattr(b, f.name)
        if isinstance(va, ast.Node):
            if not _ast_equal(va, vb):
                return False
        elif isinstance(va, list):
            if not isinstance(vb, list) or len(va) != len(vb):
                return False
            for xa, xb in zip(va, vb):
                if isinstance(xa, tuple):
                    if not all(_ast_equal(p, q) for p, q in zip(xa, xb)):
                        return False
                elif isinstance(xa, ast.Node):
                    if not _ast_equal(xa, xb):
                        return False
                elif xa != xb:
                    return False
        elif va != vb:
            return False
    return True


def _flip_op(op: str) -> str:
    return {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "==": "==", "!=": "!="}[op]


def _cap(n: float) -> int:
    p = 16
    while p < 2 * max(n, 1):
        p *= 2
    return p


# ---------------------------------------------------------------------------
# expression binding (AST -> exprs.Expr); aggregates pre-rewritten by planner
# ---------------------------------------------------------------------------

class Binder:
    def __init__(self, scope: Scope):
        self.scope = scope
        self.hook = None     # optional node-level substitution (agg refs)

    def bind(self, node: ast.Node) -> E.Expr:
        if self.hook is not None:
            r = self.hook(node)
            if r is not None:
                return r
        node = fold_const(node)
        if isinstance(node, ast.Col):
            rel, plan_name, depth = self.scope.resolve(node)
            if depth > 0:
                raise ValueError(f"outer reference {node} must be decorrelated")
            return E.col(plan_name)
        if isinstance(node, ast.Lit):
            return self.bind_lit(node)
        if isinstance(node, ast.CastExpr):
            from starrocks_tpu.exprs.functions import Cast
            return Cast(self.bind(node.child), node.target, node.scale)
        if isinstance(node, ast.BinOp):
            if node.op == "and":
                return E.And(self.bind(node.left), self.bind(node.right))
            if node.op == "or":
                return E.Or(self.bind(node.left), self.bind(node.right))
            l, r = self.bind(node.left), self.bind(node.right)
            if node.op in ("+", "-", "*", "/"):
                return E.Arith(node.op, l, r)
            return E.Compare({"=": "==", "<>": "!="}.get(node.op, node.op), l, r)
        if isinstance(node, ast.UnaryOp):
            if node.op == "not":
                return E.Not(self.bind(node.child))
            return E.Arith("-", E.lift(0), self.bind(node.child))
        if isinstance(node, ast.BetweenExpr):
            e = self.bind(node.expr)
            b = E.And(E.Compare(">=", e, self.bind(node.lo)),
                      E.Compare("<=", e, self.bind(node.hi)))
            return E.Not(b) if node.negated else b
        if isinstance(node, ast.InList):
            vals = []
            for v in node.values:
                v = fold_const(v)
                assert isinstance(v, ast.Lit), "IN list must be literals"
                vals.append(v.value)
            r = E.In(self.bind(node.expr), vals)
            return E.Not(r) if node.negated else r
        if isinstance(node, ast.LikeExpr):
            return E.Like(self.bind(node.expr), node.pattern, negate=node.negated)
        if isinstance(node, ast.IsNullExpr):
            return E.IsNull(self.bind(node.expr), negate=node.negated)
        if isinstance(node, ast.CaseExpr):
            branches = [(self.bind(c), self.bind(v)) for c, v in node.branches]
            default = (E.NullValue() if node.default is None
                       else self.bind(node.default))
            return E.Case(branches, default)
        if isinstance(node, ast.Func):
            return self.bind_func(node)
        raise NotImplementedError(f"cannot bind {type(node).__name__}")

    def bind_lit(self, node: ast.Lit) -> E.Expr:
        kinds = {"int": dt.INT64, "date": dt.DATE, "string": dt.STRING,
                 "bool": dt.BOOL}
        if node.kind == "decimal":
            return E.Literal(node.value, dt.DECIMAL(node.scale))
        if node.kind == "null":
            return E.NullValue()
        if node.kind in kinds:
            return E.Literal(node.value, kinds[node.kind])
        raise NotImplementedError(f"literal kind {node.kind}")

    def bind_func(self, node: ast.Func) -> E.Expr:
        if node.name == "year":
            return E.ExtractYear(self.bind(node.args[0]))
        if node.name in ("substring", "substr"):
            a1, a2 = fold_const(node.args[1]), fold_const(node.args[2])
            return E.substring(self.bind(node.args[0]), a1.value, a2.value)
        if node.name == "coalesce":
            return E.Coalesce([self.bind(a) for a in node.args])
        if node.name in AGG_FN_NAMES:
            raise ValueError(f"aggregate {node.name} outside aggregation context")
        from starrocks_tpu.exprs import functions as F
        if node.name in F.SQL_FUNCTIONS:
            return F.build(node.name, [self.bind(a) for a in node.args])
        raise NotImplementedError(f"function {node.name}")


# ---------------------------------------------------------------------------
# the planner
# ---------------------------------------------------------------------------

class Planner:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    # -- FROM items ------------------------------------------------------------
    def plan_table_ref(self, ref, outer_scope) -> Relation:
        if isinstance(ref, ast.SubqueryRef):
            rel = self.plan_stmt(ref.query, outer_scope)
            alias = ref.alias or _gen("sq")
            merged = {}
            for m in rel.maps.values():
                merged.update(m)
            return dataclasses.replace(rel, maps={alias: merged})
        ctes = getattr(self, "_ctes", {})
        if ref.name in ctes:
            # materialize the CTE once and share the subplan across all
            # references (the reference's CTE reuse / MultiCastDataStreamSink;
            # execution memoizes node results so it runs once) — q4/q47's
            # 6-way self-joined CTEs make inlining quadratic
            cache = getattr(self, "_cte_plans", None)
            if cache is None:
                cache = self._cte_plans = {}
            rel = cache.get(ref.name)
            if rel is None:
                rel = self.plan_stmt(ctes[ref.name], None)
                merged = {}
                for m in rel.maps.values():
                    merged.update(m)
                rel = dataclasses.replace(rel, maps={"_cte": merged})
                cache[ref.name] = rel
            alias = getattr(ref, "alias", None) or ref.name
            return dataclasses.replace(
                rel, maps={alias: dict(rel.maps["_cte"])})
        meta = self.catalog.get(ref.name)
        alias = ref.alias or ref.name
        qualify = ref.alias is not None and ref.alias != ref.name
        plan: PlanNode = Scan(ref.name)
        if qualify:
            outputs = {f"{alias}__{c}": c for c in meta.schema}
            plan = Project(plan, outputs)
            cmap = {c: f"{alias}__{c}" for c in meta.schema}
            uks = [tuple(f"{alias}__{k}" for k in uk) for uk in meta.unique_keys]
        else:
            cmap = {c: c for c in meta.schema}
            uks = list(meta.unique_keys)
        return Relation(plan, {alias: cmap}, uks, meta.size, base=ref.name,
                        base_rows=meta.size)

    # -- main --------------------------------------------------------------------
    def plan_stmt(self, stmt, outer_scope: Optional[Scope] = None) -> Relation:
        if isinstance(stmt, ast.WithStmt):
            prev = getattr(self, "_ctes", {})
            prev_plans = getattr(self, "_cte_plans", None)
            self._ctes = dict(prev)
            self._cte_plans = dict(prev_plans or {})
            for name, q in stmt.ctes:
                self._ctes[name] = q     # later CTEs may reference earlier
                self._cte_plans.pop(name, None)   # shadowing redefines
            try:
                return self.plan_stmt(stmt.body, outer_scope)
            finally:
                self._ctes = prev
                self._cte_plans = prev_plans
        if isinstance(stmt, ast.SetOpStmt):
            return self.plan_setop(stmt, outer_scope)
        return self.plan_select(stmt, outer_scope)

    def plan_setop(self, stmt: ast.SetOpStmt, outer_scope=None) -> Relation:
        from starrocks_tpu.exec.plan import SetOp

        left = self.plan_stmt(stmt.left, outer_scope)
        right = self.plan_stmt(stmt.right, outer_scope)
        lnames = left.all_plan_cols()
        rnames = right.all_plan_cols()
        assert len(lnames) == len(rnames), "set op arity mismatch"
        # align right's columns positionally to left's names
        rplan = Project(right.plan, {ln: rn for ln, rn in zip(lnames, rnames)}) \
            if lnames != rnames else right.plan
        est = left.size + right.size
        plan = SetOp(left.plan, rplan, stmt.kind, est_rows=est)
        uks = [] if stmt.kind == "union_all" else [tuple(lnames)]
        rel = Relation(plan, {"q": {n: n for n in lnames}}, uks, est)
        if stmt.order_by:
            keys = []
            for e, asc in stmt.order_by:
                assert isinstance(e, ast.Col) and e.name in lnames, \
                    "compound ORDER BY must name an output column"
                keys.append(SortKey(e.name, asc=asc))
            rel = dataclasses.replace(rel, plan=Sort(rel.plan, tuple(keys),
                                                     limit=stmt.limit))
        elif stmt.limit is not None:
            rel = dataclasses.replace(rel, plan=Limit(rel.plan, stmt.limit))
        return rel

    def plan_select(self, stmt: ast.SelectStmt, outer_scope: Optional[Scope] = None) -> Relation:
        # nested planning (subqueries) must not clobber the caller's maps
        prev_agg_map = getattr(self, "_agg_map", None)
        prev_sub_map = getattr(self, "_sel_sub_map", None)
        try:
            return self._plan_select(stmt, outer_scope)
        finally:
            self._agg_map = prev_agg_map if prev_agg_map is not None else {}
            self._sel_sub_map = prev_sub_map if prev_sub_map is not None else {}

    def _plan_select(self, stmt: ast.SelectStmt, outer_scope: Optional[Scope] = None) -> Relation:
        if not stmt.froms:
            raise SyntaxError("SELECT without FROM is not supported")
        rels = [self.plan_table_ref(r, outer_scope) for r in stmt.froms]
        left_joins = []
        where = stmt.where
        for jc in stmt.joins:
            r = self.plan_table_ref(jc.ref, outer_scope)
            if jc.kind == "inner":
                rels.append(r)
                if jc.on is not None:
                    where = ast.BinOp("and", where, jc.on) if where else jc.on
            elif jc.kind in ("left_outer", "right_outer", "full_outer"):
                left_joins.append((jc, r))
            else:
                raise NotImplementedError(jc.kind)
        # outer-join simplification: a null-rejecting WHERE conjunct on the
        # null-extended side converts LEFT JOIN to INNER (the reference's
        # OuterJoinEliminationRule analog) — q93's `sr_x = r_x` shape
        if left_joins and where is not None:
            for jc, r in list(left_joins):
                if jc.kind != "left_outer":
                    continue
                if any(self._null_rejecting_on(c, r) for c in conjuncts(where)):
                    left_joins.remove((jc, r))
                    rels.append(r)
                    if jc.on is not None:
                        where = ast.BinOp("and", where, jc.on)
        scope = Scope(rels + [r for _, r in left_joins], parent=outer_scope)

        # classify conjuncts (after OR-factoring)
        all_conjs = []
        for c in conjuncts(where):
            all_conjs.extend(factor_or(c))
        pushdowns: dict[int, list] = {i: [] for i in range(len(rels))}
        edges, pending, sub_preds, post_filters = [], [], [], []
        lj_rels = [r for _, r in left_joins]
        for c in all_conjs:
            if isinstance(c, ast.Lit) and c.kind == "bool" and c.value:
                continue
            if contains_subquery(c):
                sub_preds.append(c)
                continue
            if lj_rels and self._rels_of(c, lj_rels, scope):
                # references a null-extended side (q78's `sr_ticket_number
                # is null` anti-join idiom): filter after the outer join
                post_filters.append(c)
                continue
            idxs = self._rels_of(c, rels, scope)
            if len(idxs) == 1:
                pushdowns[next(iter(idxs))].append(c)
            elif (len(idxs) == 2 and isinstance(c, ast.BinOp) and c.op == "="
                  and len(self._rels_of(c.left, rels, scope)) == 1
                  and len(self._rels_of(c.right, rels, scope)) == 1):
                # equi edge; either side may be an expression over one rel
                # (q8's substr(s_zip,1,2) = substr(ca_zip,1,2)) — computed
                # keys materialize as derived columns on their rel
                i, j = sorted(idxs)
                lexpr, rexpr = c.left, c.right
                if next(iter(self._rels_of(lexpr, rels, scope))) != i:
                    lexpr, rexpr = rexpr, lexpr
                lcol = self._join_key_ref(rels, i, lexpr, outer_scope)
                rcol = self._join_key_ref(rels, j, rexpr, outer_scope)
                edges.append((i, j, lcol, rcol))
            else:
                pending.append((idxs, c))

        for i, preds in pushdowns.items():
            base_size = rels[i].size
            meta = (self.catalog.get(rels[i].base)
                    if rels[i].base is not None else None)
            if preds and rels[i].base is not None:
                rels[i] = self._apply_zone_maps(rels[i], preds)
            sel = 1.0
            for p in preds:
                b = Binder(Scope([rels[i]], parent=outer_scope))
                rels[i] = rels[i].filtered(b.bind(p), sel=1.0)
                sel *= selectivity.pred_selectivity(meta, p, fold_const)
            if preds:
                # estimate off the base size ONCE (zone-map pruning changed
                # the scan shape, not the survivor count; per-call flat
                # guesses double-counted)
                rels[i] = dataclasses.replace(
                    rels[i], size=max(1, int(base_size * sel)))

        stream = self._join_greedy(rels, edges, pending, outer_scope)
        for jc, r in left_joins:
            stream = self._left_join(stream, r, jc, outer_scope)
        for c in post_filters:
            b = Binder(Scope([stream], parent=outer_scope))
            stream = dataclasses.replace(stream,
                                         plan=Filter(stream.plan, b.bind(c)))
        for c in sub_preds:
            stream = self.apply_subquery_pred(stream, c, outer_scope,
                                              bind_fn=None)
        return self._finish(stmt, stream, outer_scope)

    def _null_rejecting_on(self, c: ast.Node, rel: Relation) -> bool:
        """True if conjunct c references rel and evaluates to non-TRUE when
        rel's columns are NULL (so an outer join can become inner)."""
        refs = any(rel.lookup(col) is not None for col in collect_cols(c))
        if not refs:
            return False
        if isinstance(c, ast.BinOp) and c.op in ("=", "<>", "<", "<=", ">",
                                                 ">="):
            return True
        if isinstance(c, (ast.BetweenExpr, ast.InList, ast.LikeExpr)):
            return True
        if isinstance(c, ast.IsNullExpr) and c.negated:
            return True
        return False

    def _rels_of(self, node, rels, scope: Scope) -> set[int]:
        idxs = set()
        for col in collect_cols(node):
            try:
                rel, _, depth = scope.resolve(col)
            except ValueError:
                continue
            if depth == 0:
                for i, r in enumerate(rels):
                    if r is rel:
                        idxs.add(i)
        return idxs

    def _apply_zone_maps(self, rel: Relation, preds) -> Relation:
        """Plan-time block pruning (zonemap index analog,
        be/src/storage/rowset/segment_iterator.cpp:220): conjuncts with
        literal bounds knock out blocks whose [min,max] cannot satisfy them.
        Pays off on cluster-sorted columns; predicate literals are plan-time
        constants, so the surviving block list compiles in statically."""
        meta = self.catalog.get(rel.base)
        if not meta.zone_maps:
            return rel
        import numpy as np
        nb = len(next(iter(meta.zone_maps.values()))[0])
        keep = np.ones(nb, bool)
        ranges = []   # closed intervals (col, lo|None, hi|None) — recorded
        #               on the BlockScan so the distributed executor can
        #               re-prune against per-shard zone maps

        def lit_value(node, col_dtype):
            node = fold_const(node)
            if not isinstance(node, ast.Lit):
                return None
            if node.kind == "int":
                v = node.value
                if col_dtype.is_decimal:
                    v *= 10 ** col_dtype.scale
                return v
            if node.kind == "decimal":
                if not col_dtype.is_decimal:
                    return None
                return node.value * 10 ** (col_dtype.scale - node.scale) \
                    if col_dtype.scale >= node.scale else None
            if node.kind == "date":
                return node.value
            return None

        for p in preds:
            cmp_, col, lo, hi = None, None, None, None
            if (isinstance(p, ast.BinOp)
                    and p.op in ("=", "<", "<=", ">", ">=")):
                l, r = fold_const(p.left), fold_const(p.right)
                if isinstance(l, ast.Col) and isinstance(r, ast.Lit):
                    col, op, lit = l, p.op, r
                elif isinstance(r, ast.Col) and isinstance(l, ast.Lit):
                    col, op, lit = r, _flip_op(p.op), l
                else:
                    continue
                if col.name not in meta.zone_maps:
                    continue
                v = lit_value(lit, meta.schema[col.name])
                if v is None:
                    continue
                mins, maxs = meta.zone_maps[col.name]
                if op == "=":
                    keep &= (mins <= v) & (v <= maxs)
                    ranges.append((col.name, v, v))
                elif op in ("<", "<="):
                    keep &= mins <= v if op == "<=" else mins < v
                    ranges.append((col.name, None, v))
                else:
                    keep &= maxs >= v if op == ">=" else maxs > v
                    ranges.append((col.name, v, None))
            elif isinstance(p, ast.BetweenExpr) and not p.negated:
                e = fold_const(p.expr)
                if not isinstance(e, ast.Col) or e.name not in meta.zone_maps:
                    continue
                lo = lit_value(p.lo, meta.schema[e.name])
                hi = lit_value(p.hi, meta.schema[e.name])
                if lo is None or hi is None:
                    continue
                mins, maxs = meta.zone_maps[e.name]
                keep &= (maxs >= lo) & (mins <= hi)
                ranges.append((e.name, lo, hi))

        frac = keep.mean() if nb else 1.0
        if frac > 0.75:
            return rel
        blocks = [int(b) for b in np.nonzero(keep)[0]]
        if not blocks:
            blocks = [0]           # degenerate: keep one block (filter
            #                        still applies; empty static shapes are
            #                        more trouble than one dead block)
        # pad the kept count to a power of two with out-of-range sentinel
        # blocks (their rows land dead) so BlockScan output shapes collapse
        # onto ~log(nb) sizes — the same pow2 shape discipline that keeps
        # the persistent compile cache effective for sorts/joins
        target = 1 << (len(blocks) - 1).bit_length()
        if target < nb:            # never exceed the unpruned block count
            blocks += [nb + 1] * (target - len(blocks))
        else:
            return rel             # padding would reach full size anyway
        blocks = tuple(blocks)
        from starrocks_tpu.exec.plan import BlockScan

        def swap(plan):
            if isinstance(plan, Scan):
                return BlockScan(plan.table, blocks, meta.block_rows,
                                 plan.columns, pred_ranges=tuple(ranges))
            if isinstance(plan, Project) and isinstance(plan.child, Scan):
                return Project(swap(plan.child), plan.outputs)
            return None

        new_plan = swap(rel.plan)
        if new_plan is None:
            return rel
        est = max(1, int(rel.size * frac))
        return dataclasses.replace(rel, plan=new_plan, size=est)

    def _join_key_ref(self, rels, i, expr, outer_scope) -> ast.Col:
        """Resolve a join-key expression on rels[i] to a column reference,
        materializing non-trivial expressions as derived columns."""
        if isinstance(expr, ast.Col):
            return expr
        name = _gen("jk")
        b = Binder(Scope([rels[i]], parent=outer_scope))
        alias = next(iter(rels[i].maps))
        maps = {a: dict(m) for a, m in rels[i].maps.items()}
        maps[alias][name] = name
        rels[i] = dataclasses.replace(
            rels[i], plan=AddColumns(rels[i].plan, {name: b.bind(expr)}),
            maps=maps)
        return ast.Col(name, qualifier=alias)

    # -- joins ---------------------------------------------------------------------
    def _join_greedy(self, rels, edges, pending, outer_scope) -> Relation:
        n = len(rels)
        start = max(range(n), key=lambda i: rels[i].size) if n > 1 else 0
        stream = rels[start]
        joined = {start}
        pending = list(pending)

        def apply_pending(stream):
            rest = []
            for idxs, c in pending:
                if idxs <= joined:
                    b = Binder(Scope([stream], parent=outer_scope))
                    stream = dataclasses.replace(stream, plan=Filter(stream.plan, b.bind(c)))
                else:
                    rest.append((idxs, c))
            return stream, rest

        stream, pending = apply_pending(stream)
        remaining = set(range(n)) - joined
        while remaining:
            cands: dict[int, list] = {}
            for (i, j, lc, rc) in edges:
                if i in joined and j in remaining:
                    cands.setdefault(j, []).append((lc, rc))
                elif j in joined and i in remaining:
                    cands.setdefault(i, []).append((rc, lc))
            if not cands:
                # single-row sources cross-join as broadcasts (the engine's
                # BroadcastScalar; mirrors the reference's 1-row cross join
                # of uncorrelated scalar subqueries — TPC-DS q28/q61/q88/q90)
                b_idx = next((k for k in remaining if rels[k].single_row), None)
                if b_idx is not None:
                    src = rels[b_idx]
                    plan = BroadcastScalar(stream.plan, src.plan,
                                           tuple(src.all_plan_cols()))
                    new_size, uks = stream.size, stream.unique_keys
                else:
                    # genuine cross product (q77's cs × cr): smallest
                    # remaining rel, nested-loop expansion
                    b_idx = min(remaining, key=lambda k: rels[k].size)
                    src = self._disambiguate(stream, rels[b_idx])
                    if stream.size * src.size > 1 << 24:
                        raise NotImplementedError(
                            f"cross join too large ({stream.size}x{src.size})")
                    plan = CrossJoin(stream.plan, src.plan,
                                     tuple(src.all_plan_cols()))
                    new_size, uks = stream.size * src.size, []
                maps = dict(stream.maps)
                for alias, m in src.maps.items():
                    maps.setdefault(alias, {}).update(m)
                stream = Relation(plan, maps, uks, new_size,
                                  single_row=stream.single_row and src.single_row)
                joined.add(b_idx)
                remaining.discard(b_idx)
                stream, pending = apply_pending(stream)
                continue
            # cost-based next choice: the candidate minimizing the
            # estimated JOIN OUTPUT (ANALYZE rowcounts x filter survival /
            # key NDV), not merely the smallest build side — the greedy
            # analog of the reference's memo join-order costing
            # (QueryOptimizer.java:892, CostModel.java:76,
            # HashJoinCostModel.java); selective dimensions join first so
            # later (bigger) joins probe fewer rows
            nxt = min(cands, key=lambda k: (
                self._est_join_size(stream, rels[k], cands[k]),
                rels[k].size))
            est = self._est_join_size(stream, rels[nxt], cands[nxt])
            stream = self._hash_join(stream, rels[nxt], cands[nxt], "inner")
            stream = dataclasses.replace(stream, size=est)
            joined.add(nxt)
            remaining.discard(nxt)
            stream, pending = apply_pending(stream)
        if pending:
            raise ValueError(f"unapplied predicates: {[c for _, c in pending]}")
        return stream

    def _est_join_size(self, stream: Relation, build: Relation,
                       pairs) -> int:
        """Estimated output rows of stream JOIN build on `pairs`
        [(stream_col_ast, build_col_ast)]. Unique (FK->PK) builds keep
        stream cardinality scaled by the build side's filter survival;
        general joins use the containment estimate |S|x|B|/NDV(keys)."""
        try:
            bkeys = [self._plan_col(build, bc) for _, bc in pairs]
        except Exception:
            return max(stream.size, build.size)
        if any(set(uk) <= set(bkeys) for uk in build.unique_keys):
            surv = min(1.0, build.size / build.unfiltered_rows)
            return max(1, int(stream.size * surv))
        ndv, known = 1, False
        if build.base is not None:
            meta = self.catalog.get(build.base)
            for _, bc in pairs:
                st = meta.stats.get(bc.name)
                if st is not None:
                    ndv *= max(st.ndv, 1)
                    known = True
        if known:
            ndv = min(ndv, build.unfiltered_rows)
            return max(1, int(stream.size * build.size / max(ndv, 1)))
        return max(stream.size, build.size)

    def _disambiguate(self, stream: Relation, build: Relation) -> Relation:
        """Rename build plan columns that collide with stream plan columns
        (two derived tables may both alias an output `customer_sk` — q97)."""
        taken = set(stream.all_plan_cols())
        cols = build.all_plan_cols()
        if not any(c in taken for c in cols):
            return build
        ren = {c: (_gen("r") if c in taken else c) for c in cols}
        plan = Project(build.plan, {ren[c]: c for c in cols})
        maps = {a: {sql: ren[pn] for sql, pn in m.items()}
                for a, m in build.maps.items()}
        uks = [tuple(ren.get(k, k) for k in uk) for uk in build.unique_keys]
        return Relation(plan, maps, uks, build.size, build.single_row)

    def _hash_join(self, stream: Relation, build: Relation, pairs,
                   join_type: str) -> Relation:
        """pairs: [(stream_col_ast, build_col_ast)] (equi keys)."""
        est = self._est_join_size(stream, build, pairs)
        build = self._disambiguate(stream, build)
        skeys = [self._plan_col(stream, sc) for sc, _ in pairs]
        bkeys = [self._plan_col(build, bc) for _, bc in pairs]
        b_unique = any(set(uk) <= set(bkeys) for uk in build.unique_keys)
        s_unique = any(set(uk) <= set(skeys) for uk in stream.unique_keys)
        if join_type in ("semi", "anti"):
            plan = HashJoin(stream.plan, build.plan, tuple(skeys), tuple(bkeys),
                            join_type, (), capacity=_cap(build.size), unique=True)
            return dataclasses.replace(stream, plan=plan)
        if not b_unique and s_unique and join_type == "inner":
            stream, build = build, stream
            skeys, bkeys = bkeys, skeys
            b_unique = True
        carry = tuple(build.all_plan_cols())
        plan = HashJoin(stream.plan, build.plan, tuple(skeys), tuple(bkeys),
                        join_type, carry, capacity=_cap(build.size),
                        unique=b_unique, fanout=16)
        maps = dict(stream.maps)
        for alias, m in build.maps.items():
            maps.setdefault(alias, {}).update(m)
        uks = list(stream.unique_keys) if (b_unique or join_type != "inner") else []
        return Relation(plan, maps, uks, est)

    def _plan_col(self, rel: Relation, col: ast.Col) -> str:
        pn = rel.lookup(col)
        if pn is None:
            raise ValueError(f"column {col} not in relation")
        return pn

    def _left_join(self, stream: Relation, build: Relation, jc: ast.JoinClause,
                   outer_scope) -> Relation:
        jt = jc.kind  # left_outer | right_outer | full_outer
        build = self._disambiguate(stream, build)
        eq_pairs, build_filters = [], []
        for c in conjuncts(jc.on):
            if (isinstance(c, ast.BinOp) and c.op == "="
                    and isinstance(c.left, ast.Col) and isinstance(c.right, ast.Col)):
                l, r = c.left, c.right
                if stream.lookup(l) and build.lookup(r):
                    eq_pairs.append((l, r)); continue
                if stream.lookup(r) and build.lookup(l):
                    eq_pairs.append((r, l)); continue
            if all(build.lookup(col) for col in collect_cols(c)):
                # build-only ON filter: for left joins it pre-filters the
                # null-extended side; for right/full the build side is
                # preserved, so it may only disqualify matches
                if jt != "left_outer":
                    raise NotImplementedError(
                        f"{jt} ON with non-equi predicate")
                build_filters.append(c)
            else:
                raise NotImplementedError("outer join ON with probe-side predicate")
        for p in build_filters:
            build = build.filtered(Binder(Scope([build])).bind(p))
        skeys = tuple(self._plan_col(stream, l) for l, _ in eq_pairs)
        bkeys = tuple(self._plan_col(build, r) for _, r in eq_pairs)
        b_unique = any(set(uk) <= set(bkeys) for uk in build.unique_keys)
        plan = HashJoin(stream.plan, build.plan, skeys, bkeys, jt,
                        tuple(build.all_plan_cols()), capacity=_cap(build.size),
                        unique=b_unique, fanout=32)
        maps = dict(stream.maps)
        for alias, m in build.maps.items():
            maps.setdefault(alias, {}).update(m)
        uks = (stream.unique_keys if b_unique and jt == "left_outer" else [])
        return Relation(plan, maps, uks, max(stream.size, build.size))

    # -- subquery predicates ---------------------------------------------------------
    def apply_subquery_pred(self, stream: Relation, c: ast.Node, outer_scope,
                            bind_fn: Optional[Callable] = None) -> Relation:
        negated = False
        while isinstance(c, ast.UnaryOp) and c.op == "not":
            negated = not negated
            c = c.child
        if isinstance(c, ast.ExistsExpr):
            return self._apply_exists(stream, c.query, negated != c.negated, outer_scope)
        if isinstance(c, ast.InSubquery):
            return self._apply_in(stream, c, negated != c.negated, outer_scope)
        if isinstance(c, ast.BinOp) and c.op in ("=", "<>", "<", "<=", ">", ">="):
            assert not negated, "NOT around scalar compare unsupported"
            return self._apply_scalar_compare(stream, c, outer_scope, bind_fn)
        if isinstance(c, ast.BinOp) and c.op in ("and", "or"):
            assert not negated, "NOT around composite subquery pred unsupported"
            return self._apply_mark_pred(stream, c, outer_scope)
        raise NotImplementedError(f"subquery predicate {type(c).__name__}")

    def _apply_mark_pred(self, stream, c: ast.Node, outer_scope) -> Relation:
        """Subqueries under OR/AND (q45's `zip in (...) or item in (select
        ...)`): each IN/EXISTS becomes a boolean *mark* computed by a
        left-outer join against the distinct subquery keys plus a constant
        flag (the mark-join rewrite of the reference optimizer), then the
        whole predicate filters on the marks."""
        subs: list = []

        def find(n):
            if isinstance(n, (ast.InSubquery, ast.ExistsExpr)):
                subs.append(n)
                return
            if isinstance(n, ast.ScalarSubquery):
                raise NotImplementedError("scalar subquery under OR unsupported")
            if dataclasses.is_dataclass(n):
                for f in dataclasses.fields(n):
                    v = getattr(n, f.name)
                    if isinstance(v, (list, tuple)):
                        for x in v:
                            if isinstance(x, (list, tuple)):
                                for y in x:
                                    if isinstance(y, ast.Node):
                                        find(y)
                            elif isinstance(x, ast.Node):
                                find(x)
                    elif isinstance(v, ast.Node):
                        find(v)

        find(c)
        marks: dict[int, E.Expr] = {}
        for n in subs:
            if isinstance(n, ast.InSubquery):
                assert not n.negated, "NOT IN under OR unsupported"
                sub = self.plan_select(n.query,
                                       Scope([stream], parent=outer_scope))
                out_cols = sub.all_plan_cols()
                assert len(out_cols) == 1, "IN subquery must output one column"
                key = out_cols[0]
                src = Aggregate(sub.plan, (key,), (),
                                est_groups=max(16, sub.size // 2))
                lhs = fold_const(n.expr)
                assert isinstance(lhs, ast.Col), "IN lhs must be a column"
                skeys, bkeys = (self._plan_col(stream, lhs),), (key,)
                est = sub.size
            else:  # EXISTS under OR (q35)
                inner_rels = [self.plan_table_ref(r, None) for r in n.query.froms]
                local, equi, nonequi = self._split_correlation(
                    n.query, inner_rels, stream, outer_scope)
                assert not nonequi, "non-equi EXISTS under OR unsupported"
                sub, bkeys = self._exists_keys_rel(n.query, local, equi)
                src = sub.plan
                skeys = tuple(pn for pn, _ in equi)
                est = sub.size
            flag = _gen("mk")
            src = AddColumns(src, {flag: E.lift(True)})
            plan = HashJoin(stream.plan, src, tuple(skeys), tuple(bkeys),
                            "left_outer", (flag,), capacity=_cap(est),
                            unique=True)
            stream = dataclasses.replace(stream, plan=plan)
            mark = E.IsNull(E.col(flag), negate=True)
            if getattr(n, "negated", False):  # NOT EXISTS under OR
                mark = E.IsNull(E.col(flag))
            marks[id(n)] = mark

        binder = Binder(Scope([stream], parent=outer_scope))
        orig_bind = binder.bind

        def bind_with_marks(node):
            if id(node) in marks:
                return marks[id(node)]
            return orig_bind(node)

        binder.bind = bind_with_marks
        return dataclasses.replace(stream, plan=Filter(stream.plan,
                                                       binder.bind(c)))

    def _split_correlation(self, stmt: ast.SelectStmt, inner_rels, stream, outer_scope):
        inner_scope = Scope(inner_rels, parent=Scope([stream], parent=outer_scope))
        local, equi, nonequi = [], [], []
        # OR-factoring first: q41's correlation hides inside
        # (corr and X) or (corr and Y) — factoring exposes `corr` + residual
        all_conjs = []
        for c0 in conjuncts(stmt.where):
            all_conjs.extend(factor_or(c0))
        for c in all_conjs:
            cols = collect_cols(c)
            resolved = [(col, *inner_scope.resolve(col)[1:]) for col in cols]
            if all(d == 0 for _, _, d in resolved):
                local.append(c)
                continue
            assert (isinstance(c, ast.BinOp) and c.op in ("=", "<>")
                    and len(resolved) == 2), f"unsupported correlated conjunct"
            (lc, lpn, ld), (rc, rpn, rd) = resolved
            if ld > 0:
                outer_pn, inner_ast = lpn, rc
            else:
                outer_pn, inner_ast = rpn, lc
            (equi if c.op == "=" else nonequi).append((outer_pn, inner_ast))
        return local, equi, nonequi

    def _apply_exists(self, stream, q: ast.SelectStmt, negated, outer_scope) -> Relation:
        inner_rels = [self.plan_table_ref(r, None) for r in q.froms]
        local, equi, nonequi = self._split_correlation(q, inner_rels, stream, outer_scope)
        okeys = tuple(pn for pn, _ in equi)
        if len(inner_rels) == 1 and not nonequi:
            # fast path: semi/anti join straight against the filtered table
            inner = inner_rels[0]
            for p in local:
                inner = inner.filtered(Binder(Scope([inner])).bind(p))
            ikeys = tuple(self._plan_col(inner, a) for _, a in equi)
            jt = "anti" if negated else "semi"
            plan = HashJoin(stream.plan, inner.plan, okeys, ikeys, jt, (),
                            capacity=_cap(inner.size))
            return dataclasses.replace(stream, plan=plan)
        if not nonequi:
            # multi-table EXISTS (q10/q35/q69): synthesize
            # SELECT <equi keys> ... GROUP BY <equi keys> and semi-join it
            sub, bkeys = self._exists_keys_rel(q, local, equi)
            jt = "anti" if negated else "semi"
            plan = HashJoin(stream.plan, sub.plan, okeys, bkeys, jt, (),
                            capacity=_cap(sub.size), unique=True)
            return dataclasses.replace(stream, plan=plan)
        assert len(nonequi) == 1, "one non-equi correlation supported"
        outer_pn, inner_col = nonequi[0]
        mn, mx = _gen("mn"), _gen("mx")
        eq_inner = [a for _, a in equi]
        items = [ast.SelectItem(ast.Func("min", [inner_col]), mn),
                 ast.SelectItem(ast.Func("max", [inner_col]), mx)]
        items += [ast.SelectItem(g, _gen("ek")) for g in eq_inner]
        sub_stmt = ast.SelectStmt(
            items=items, star=False, froms=q.froms, joins=q.joins,
            where=_and_all(local), group_by=list(eq_inner), having=None,
            order_by=[], limit=None)
        sub = self.plan_select(sub_stmt, None)
        cols = sub.all_plan_cols()
        mn, mx = cols[0], cols[1]
        ikeys = tuple(cols[2:2 + len(eq_inner)])
        plan = HashJoin(stream.plan, sub.plan, okeys, ikeys, "left_outer",
                        (mn, mx), capacity=_cap(sub.size), unique=True)
        if negated:
            pred = E.Or(E.IsNull(E.col(mn)),
                        E.And(E.Compare("==", E.col(mn), E.col(outer_pn)),
                              E.Compare("==", E.col(mx), E.col(outer_pn))))
        else:
            pred = E.And(E.IsNull(E.col(mn), negate=True),
                         E.Or(E.Compare("!=", E.col(mn), E.col(outer_pn)),
                              E.Compare("!=", E.col(mx), E.col(outer_pn))))
        return dataclasses.replace(stream, plan=Filter(plan, pred))

    def _exists_keys_rel(self, q: ast.SelectStmt, local, equi):
        """Plan the distinct correlation-key set of an EXISTS subquery:
        SELECT <inner equi cols> FROM q.froms WHERE <local> GROUP BY keys."""
        eq_inner = [a for _, a in equi]
        items = [ast.SelectItem(g, _gen("ek")) for g in eq_inner]
        sub_stmt = ast.SelectStmt(
            items=items, star=False, froms=q.froms, joins=q.joins,
            where=_and_all(local), group_by=list(eq_inner), having=None,
            order_by=[], limit=None)
        sub = self.plan_select(sub_stmt, None)
        return sub, tuple(sub.all_plan_cols()[:len(eq_inner)])

    def _apply_in(self, stream, c: ast.InSubquery, negated, outer_scope) -> Relation:
        sub = self.plan_select(c.query, Scope([stream], parent=outer_scope))
        out_cols = sub.all_plan_cols()
        assert len(out_cols) == 1, "IN subquery must output one column"
        lhs = fold_const(c.expr)
        assert isinstance(lhs, ast.Col), "IN lhs must be a column"
        skey = self._plan_col(stream, lhs)
        jt = "anti" if negated else "semi"
        plan = HashJoin(stream.plan, sub.plan, (skey,), (out_cols[0],), jt, (),
                        capacity=_cap(sub.size))
        return dataclasses.replace(stream, plan=plan)

    def _apply_scalar_compare(self, stream, c: ast.BinOp, outer_scope,
                              bind_fn=None) -> Relation:
        def split(node):
            node = fold_const(node)
            if isinstance(node, ast.ScalarSubquery):
                return None, node
            if isinstance(node, ast.BinOp) and node.op == "*":
                l, r = fold_const(node.left), fold_const(node.right)
                if isinstance(l, ast.Lit) and isinstance(r, ast.ScalarSubquery):
                    return l, r
                if isinstance(r, ast.Lit) and isinstance(l, ast.ScalarSubquery):
                    return r, l
            return None, None

        mult, sub = split(c.right)
        lhs_ast, op = c.left, {"=": "==", "<>": "!="}.get(c.op, c.op)
        if sub is None:
            mult, sub = split(c.left)
            lhs_ast, op = c.right, _flip_op({"=": "==", "<>": "!="}.get(c.op, c.op))
            if sub is None:
                raise NotImplementedError("no scalar subquery found in compare")
        stream, num, den = self._plan_scalar_sub(stream, sub.query, outer_scope)
        scope = Scope([stream], parent=outer_scope)
        if mult is not None:
            num = E.Arith("*", Binder(scope).bind_lit(fold_const(mult)), num)
        if bind_fn is not None:
            lhs = bind_fn(lhs_ast, Binder(scope))
        else:
            lhs = Binder(scope).bind(lhs_ast)
        if den is None:
            pred = E.Compare(op, lhs, num)
        else:
            pred = E.Compare(op, E.Arith("*", lhs, den), num)
        return dataclasses.replace(stream, plan=Filter(stream.plan, pred))

    def _plan_scalar_sub(self, stream: Relation, q: ast.SelectStmt, outer_scope):
        """Plan a scalar aggregate subquery; returns (stream', num, den|None).

        Uniform decorrelation: rewrite the subquery to GROUP BY its
        correlation columns, plan it as a normal select, then join on the
        correlation keys (inner join: empty group -> comparison false, which
        matches scalar-NULL comparison semantics) or BroadcastScalar when
        uncorrelated. avg is decomposed to sum+count so comparisons can be
        cross-multiplied into exact integer arithmetic.
        """
        if q.group_by or q.star:
            # grouped scalar subquery (q44's HAVING: GROUP BY a column the
            # WHERE pins to one value -> one row) or `select * from <1-row
            # cte>` (q23). Uncorrelated only: plan whole and broadcast its
            # single output column.
            assert q.star or len(q.items) == 1, \
                "grouped scalar subquery with >1 item"
            sub = self.plan_select(q, None)
            v = sub.all_plan_cols()[0]
            plan = BroadcastScalar(stream.plan, sub.plan, (v,))
            maps = dict(stream.maps)
            maps.setdefault("_sub", {}).update({v: v})
            stream2 = dataclasses.replace(stream, plan=plan, maps=maps)
            return stream2, E.col(v), None
        assert len(q.items) == 1
        item = fold_const(q.items[0].expr)

        # detect [const *] avg(x) for the exact-fraction path
        const_mult, avg_node = None, None
        if isinstance(item, ast.Func) and item.name == "avg":
            avg_node = item
        elif isinstance(item, ast.BinOp) and item.op == "*":
            l, r = fold_const(item.left), fold_const(item.right)
            if isinstance(l, ast.Lit) and isinstance(r, ast.Func) and r.name == "avg":
                const_mult, avg_node = l, r
            elif isinstance(r, ast.Lit) and isinstance(l, ast.Func) and l.name == "avg":
                const_mult, avg_node = r, l

        inner_rels = [self.plan_table_ref(r, None) for r in q.froms]
        local, equi, nonequi = self._split_correlation(q, inner_rels, stream, outer_scope)
        assert not nonequi, "non-equi correlated scalar subquery unsupported"

        s_n, c_n, v_n = _gen("s"), _gen("n"), _gen("v")
        if avg_node is not None:
            arg = avg_node.args[0]
            items = [ast.SelectItem(ast.Func("sum", [arg]), s_n),
                     ast.SelectItem(ast.Func("count", [arg]), c_n)]
        else:
            items = [ast.SelectItem(item, v_n)]
        group_cols = [inner_ast for _, inner_ast in equi]
        items += [ast.SelectItem(g, None) for g in group_cols]
        new_stmt = ast.SelectStmt(
            items=items, star=False, froms=q.froms, joins=q.joins,
            where=_and_all(local), group_by=list(group_cols), having=None,
            order_by=[], limit=None)
        sub = self.plan_select(new_stmt, None)

        if equi:
            okeys = tuple(pn for pn, _ in equi)
            bkeys = tuple(self._plan_col(sub, ast.Col(g.name)) for g in group_cols)
            carry = (s_n, c_n) if avg_node is not None else (v_n,)
            plan = HashJoin(stream.plan, sub.plan, okeys, bkeys, "inner",
                            carry, capacity=_cap(sub.size), unique=True)
            stream2 = dataclasses.replace(stream, plan=plan)
        else:
            carry = (s_n, c_n) if avg_node is not None else (v_n,)
            plan = BroadcastScalar(stream.plan, sub.plan, carry)
            stream2 = dataclasses.replace(stream, plan=plan)
        # expose the carried columns for binding
        maps = dict(stream2.maps)
        maps.setdefault("_sub", {}).update({n: n for n in carry})
        stream2 = dataclasses.replace(stream2, maps=maps)

        if avg_node is not None:
            num, den = E.col(s_n), E.col(c_n)
            if const_mult is not None:
                num = E.Arith("*", Binder(Scope([stream2])).bind_lit(const_mult), num)
            return stream2, num, den
        return stream2, E.col(v_n), None

    # -- aggregation & output -----------------------------------------------------
    def _finish(self, stmt: ast.SelectStmt, stream: Relation, outer_scope) -> Relation:
        if stmt.star and not stmt.items:
            # expand SELECT * from the stream's name maps (in relation order,
            # first-binding wins for duplicated unqualified names)
            items, seen = [], set()
            for alias, m in stream.maps.items():
                for sql in m:
                    if sql in seen:
                        continue
                    seen.add(sql)
                    items.append(ast.SelectItem(
                        ast.Col(sql, qualifier=alias), sql))
            stmt = dataclasses.replace(stmt, items=items, star=False)
        # scalar subqueries in the SELECT list (q9's CASE of subqueries):
        # plan each uncorrelated one and broadcast its value onto the stream
        sel_sub_map: dict[int, E.Expr] = {}
        sel_subs: list[ast.ScalarSubquery] = []

        def find_sel_subs(n):
            if isinstance(n, ast.ScalarSubquery):
                sel_subs.append(n)
                return
            if isinstance(n, (ast.ExistsExpr, ast.InSubquery)):
                return
            if dataclasses.is_dataclass(n):
                for f in dataclasses.fields(n):
                    v = getattr(n, f.name)
                    if isinstance(v, (list, tuple)):
                        for x in v:
                            if isinstance(x, (list, tuple)):
                                for y in x:
                                    if isinstance(y, ast.Node):
                                        find_sel_subs(y)
                            elif isinstance(x, ast.Node):
                                find_sel_subs(x)
                    elif isinstance(v, ast.Node):
                        find_sel_subs(v)

        for it in stmt.items:
            find_sel_subs(it.expr)
        for n in sel_subs:
            sub = self.plan_select(n.query, None)   # uncorrelated only
            v = sub.all_plan_cols()
            assert len(v) == 1, "SELECT scalar subquery must output one column"
            plan = BroadcastScalar(stream.plan, sub.plan, (v[0],))
            maps = dict(stream.maps)
            maps.setdefault("_sub", {}).update({v[0]: v[0]})
            stream = dataclasses.replace(stream, plan=plan, maps=maps)
            sel_sub_map[id(n)] = E.col(v[0])
        # assign after all nested plan_select calls (each resets the attr)
        self._sel_sub_map = sel_sub_map

        scope = Scope([stream], parent=outer_scope)
        agg_nodes: list[ast.Func] = []
        for it in stmt.items:
            collect_aggs(it.expr, agg_nodes)
        if stmt.having is not None:
            collect_aggs(stmt.having, agg_nodes)
        for e, _ in stmt.order_by:
            collect_aggs(e, agg_nodes)

        self._agg_map = {}
        self._gb_exprs = []
        if agg_nodes or stmt.group_by:
            stream = self._plan_aggregate(stmt, stream, agg_nodes, scope)
            scope = Scope([stream], parent=outer_scope)

        # window functions evaluate over the post-aggregation stream
        # (SQL evaluation order: FROM/WHERE/GROUP BY/HAVING -> window -> SELECT)
        self._win_map = {}
        win_nodes: list[ast.WindowExpr] = []
        for it in stmt.items:
            collect_windows(it.expr, win_nodes)
        for e, _ in stmt.order_by:
            collect_windows(e, win_nodes)
        if win_nodes:
            stream = self._plan_windows(stream, win_nodes, scope)
            scope = Scope([stream], parent=outer_scope)

        outputs: dict[str, object] = {}
        out_names: list[str] = []
        b = Binder(scope)
        for it in stmt.items:
            name = it.alias or (it.expr.name if isinstance(it.expr, ast.Col) else _gen("col"))
            outputs[name] = self._bind_with_agg_refs(it.expr, b)
            out_names.append(name)
        # ORDER BY expressions not in the select list ride as hidden columns
        # through the projection and are dropped after the sort
        order_keys: list[tuple[str, bool]] = []
        hidden: list[str] = []
        for e, asc in stmt.order_by:
            try:
                name = self._resolve_order_key(e, stmt, out_names)
            except NotImplementedError:
                if stmt.distinct:
                    raise  # SELECT DISTINCT forbids ordering by hidden exprs
                name = _gen("ord")
                outputs[name] = self._bind_with_agg_refs(
                    self._subst_aliases(e, stmt, stream), b)
                hidden.append(name)
            order_keys.append((name, asc))
        plan = Project(stream.plan, outputs)
        uks = []
        if stmt.group_by:
            gb_out = []
            for g in stmt.group_by:
                for it, name in zip(stmt.items, out_names):
                    if _ast_equal(it.expr, g):
                        gb_out.append(name)
                        break
            if len(gb_out) == len(stmt.group_by):
                uks = [tuple(gb_out)]
        single = bool(agg_nodes) and not stmt.group_by and stmt.having is None
        rel = Relation(plan, {"q": {n: n for n in out_names}}, uks,
                       1 if single else stream.size, single_row=single)

        if stmt.distinct:
            rel = dataclasses.replace(
                rel, plan=Aggregate(rel.plan, tuple(out_names), (),
                                    est_groups=max(16, stream.size // 4)),
                unique_keys=[tuple(out_names)])

        if stmt.order_by:
            keys = tuple(SortKey(name, asc=asc) for name, asc in order_keys)
            sorted_plan = Sort(rel.plan, keys, limit=stmt.limit)
            if hidden:
                sorted_plan = Project(
                    sorted_plan, {n: E.col(n) for n in out_names})
            rel = dataclasses.replace(rel, plan=sorted_plan)
        elif stmt.limit is not None:
            rel = dataclasses.replace(rel, plan=Limit(rel.plan, stmt.limit))
        return rel

    def _subst_aliases(self, e: ast.Node, stmt, stream) -> ast.Node:
        """Replace unqualified column refs that name a SELECT alias with the
        aliased expression (ORDER BY `case when lochierarchy = 0 ...` where
        lochierarchy is an output alias — q36/q70/q86)."""
        alias_map = {it.alias: it.expr for it in stmt.items if it.alias}

        def walk(n):
            if (isinstance(n, ast.Col) and n.qualifier is None
                    and n.name in alias_map and stream.lookup(n) is None):
                return alias_map[n.name]     # original node: id-keyed maps hit
            if isinstance(n, ast.Node) and dataclasses.is_dataclass(n):
                kwargs, changed = {}, False
                for f in dataclasses.fields(n):
                    v = getattr(n, f.name)
                    if isinstance(v, ast.Node):
                        nv = walk(v)
                        changed |= nv is not v
                        kwargs[f.name] = nv
                    elif isinstance(v, list):
                        nl = []
                        for x in v:
                            if isinstance(x, tuple):
                                nt = tuple(walk(y) if isinstance(y, ast.Node)
                                           else y for y in x)
                                changed |= nt != x
                                nl.append(nt)
                            elif isinstance(x, ast.Node):
                                nx = walk(x)
                                changed |= nx is not x
                                nl.append(nx)
                            else:
                                nl.append(x)
                        kwargs[f.name] = nl
                    else:
                        kwargs[f.name] = v
                if changed:
                    return dataclasses.replace(n, **kwargs)
            return n

        return walk(e)

    def _resolve_order_key(self, e: ast.Node, stmt, out_names) -> str:
        if isinstance(e, ast.Col) and e.name in out_names:
            return e.name
        if isinstance(e, ast.Lit) and e.kind == "int":
            return out_names[e.value - 1]
        for it, name in zip(stmt.items, out_names):
            if _ast_equal(it.expr, e):
                return name
        if isinstance(e, ast.Col):
            for it, name in zip(stmt.items, out_names):
                if isinstance(it.expr, ast.Col) and it.expr.name == e.name:
                    return name
        raise NotImplementedError(f"ORDER BY expression not in select list: {e}")

    def _plan_aggregate(self, stmt, stream: Relation, agg_nodes, scope) -> Relation:
        b = Binder(scope)
        key_names, pre_cols = [], {}
        key_sql_map: dict[str, str] = {}
        for g in stmt.group_by:
            g = fold_const(g)
            if (isinstance(g, ast.Col) and g.qualifier is None
                    and stream.lookup(g) is None):
                # GROUP BY <select alias> (MySQL/StarRocks extension):
                # substitute the aliased select expression
                for it in stmt.items:
                    if it.alias == g.name:
                        g = it.expr
                        break
            if isinstance(g, ast.Col):
                pn = self._plan_col(stream, g)
                key_names.append(pn)
                key_sql_map[g.name] = pn
            else:
                name = _gen("k")
                pre_cols[name] = b.bind(g)
                key_names.append(name)
                self._gb_exprs.append((g, name))

        specs: list[AggSpec] = []
        distinct_aggs = []
        gc_aggs = []          # group_concat: (node, arg, out, sep, distinct)
        planned_nodes: list = []
        for node in agg_nodes:
            if id(node) in self._agg_map:
                continue
            # structural dedup: `count(distinct x)` in SELECT and ORDER BY
            # are distinct AST objects but one aggregate (q16/q94)
            dup = next((m for m in planned_nodes if _ast_equal(m, node)), None)
            if dup is not None:
                self._agg_map[id(node)] = self._agg_map[id(dup)]
                continue
            planned_nodes.append(node)
            if node.name == "group_concat":
                # string concatenation per group (group_concat.h analog) —
                # host-finalized in its own subplan, rejoined on the keys
                arg = _gen("gc")
                pre_cols[arg] = b.bind(node.args[0])
                sep = ", "
                if len(node.args) > 1:
                    sp = fold_const(node.args[1])
                    assert isinstance(sp, ast.Lit) and sp.kind == "string", \
                        "group_concat separator must be a string literal"
                    sep = sp.value
                out = _gen("gco")
                gc_aggs.append((node, arg, out, sep, bool(node.distinct)))
                self._agg_map[id(node)] = ("col", out)
                continue
            if node.distinct or node.name in DISTINCT_SKETCH_FNS:
                # the whole distinct-cardinality family (count(distinct),
                # ndv, approx_count_distinct, bitmap_union_count(to_bitmap),
                # hll_union_agg(hll_hash)) is answered exactly via two-level
                # distinct aggregation — the reference's sketches trade
                # accuracy for memory; group state here is sort-segmented,
                # so exact costs the same
                arg_ast = node.args[0]
                if (isinstance(arg_ast, ast.Func)
                        and arg_ast.name in ("to_bitmap", "hll_hash")):
                    arg_ast = arg_ast.args[0]
                arg = _gen("d")
                pre_cols[arg] = b.bind(arg_ast)
                out = _gen("cd")
                approx = (not node.distinct
                          and node.name in APPROX_DISTINCT_FNS)
                distinct_aggs.append((node, arg, out, approx))
                self._agg_map[id(node)] = ("col", out)
                continue
            if node.name == "avg":
                arg = _gen("a")
                pre_cols[arg] = b.bind(node.args[0])
                s, n = _gen("s"), _gen("n")
                specs += [AggSpec("sum", arg, s), AggSpec("count", arg, n)]
                self._agg_map[id(node)] = ("avg", s, n)
                continue
            if node.star:
                out = _gen("cs")
                specs.append(AggSpec("count_star", None, out))
                self._agg_map[id(node)] = ("col", out)
                continue
            arg_ast = fold_const(node.args[0])
            if isinstance(arg_ast, ast.Col):
                arg = self._plan_col(stream, arg_ast)
            else:
                arg = _gen("a")
                pre_cols[arg] = b.bind(arg_ast)
            out = _gen("ag")
            param = None
            if node.name in ("percentile_cont", "percentile_disc"):
                p = fold_const(node.args[1])
                assert isinstance(p, ast.Lit), "percentile fraction must be const"
                param = float(p.value) / (10 ** p.scale if p.kind == "decimal" else 1)
            specs.append(AggSpec(AGG_NAME_MAP[node.name], arg, out, param))
            self._agg_map[id(node)] = ("col", out)

        plan = stream.plan
        if pre_cols:
            plan = AddColumns(plan, pre_cols)
        est = self._est_groups(stream, stmt.group_by)

        if stmt.grouping_sets is not None:
            return self._plan_grouping_sets(stmt, stream, plan, key_names,
                                            specs, distinct_aggs, est,
                                            gc_aggs)

        agg_plan = self._plan_agg_with_distincts(plan, key_names, specs,
                                                 distinct_aggs, est, gc_aggs)

        # name map: group keys keep their sql names; agg outputs synthetic
        gk_map = {}
        for alias, m in stream.maps.items():
            gk_map[alias] = {sql: pn for sql, pn in m.items() if pn in key_names}
        synth = {pn: pn for pn in key_names}
        synth.update({s.out: s.out for s in specs})
        synth.update({d[2]: d[2] for d in distinct_aggs})
        synth.update({g[2]: g[2] for g in gc_aggs})
        gk_map["_agg"] = synth
        out_rel = Relation(agg_plan, gk_map, [tuple(key_names)], max(1, est))

        if stmt.having is not None:
            for c in conjuncts(stmt.having):
                if contains_subquery(c):
                    out_rel = self.apply_subquery_pred(
                        out_rel, c, None, bind_fn=self._bind_with_agg_refs)
                else:
                    pred = self._bind_with_agg_refs(c, Binder(Scope([out_rel])))
                    out_rel = dataclasses.replace(out_rel, plan=Filter(out_rel.plan, pred))
        return out_rel

    def _plan_agg_with_distincts(self, plan, key_names, specs, distinct_aggs,
                                 est, gc_aggs=()):
        """Aggregate with any number of DISTINCT aggregates: each distinct
        runs as its own two-level aggregate (dedupe on keys+arg, then count
        per key) and rejoins the base aggregate on the group keys with
        null-safe equality (the reference's multi-stage distinct split,
        SplitAggregateRule / multi-distinct aggs in be/src/exprs/agg/)."""
        if not distinct_aggs and not gc_aggs:
            return Aggregate(plan, tuple(key_names), tuple(specs),
                             est_groups=est)

        def dcount(arg, out, approx):
            if approx:
                # HLL sketch: single-level aggregate, no dedupe sort
                return Aggregate(plan, tuple(key_names),
                                 (AggSpec("approx_count_distinct", arg, out),),
                                 est_groups=est)
            d1 = Aggregate(plan, tuple(key_names) + (arg,), (),
                           est_groups=max(est * 8, 64))
            return Aggregate(d1, tuple(key_names),
                             (AggSpec("count", arg, out),), est_groups=est)

        dplans = [(arg, out, dcount(arg, out, approx))
                  for _, arg, out, approx in distinct_aggs]
        dplans += [(arg, out, GroupConcat(plan, tuple(key_names), arg, out,
                                          sep, distinct))
                   for _, arg, out, sep, distinct in gc_aggs]
        if not key_names:
            # global: chain 1-row side aggregates onto the 1-row base agg
            if specs:
                agg_plan, rest = Aggregate(plan, (), tuple(specs)), dplans
            else:
                agg_plan, rest = dplans[0][2], dplans[1:]
            for _, out, dp in rest:
                agg_plan = BroadcastScalar(agg_plan, dp, (out,))
            return agg_plan
        if specs:
            agg_plan, rest = Aggregate(plan, tuple(key_names), tuple(specs),
                                       est_groups=est), dplans
        else:
            agg_plan, rest = dplans[0][2], dplans[1:]
        for _, out, dp in rest:
            agg_plan = HashJoin(agg_plan, dp, tuple(key_names),
                                tuple(key_names), "inner", (out,),
                                capacity=_cap(est), unique=True,
                                null_safe=True)
        return agg_plan

    def _plan_grouping_sets(self, stmt, stream: Relation, plan, key_names,
                            specs, distinct_aggs, est,
                            gc_aggs=()) -> Relation:
        """ROLLUP / CUBE / GROUPING SETS: one Aggregate per set over the same
        child, grouped-out keys masked to NULL (the RepeatNode analog,
        be/src/exec/repeat_node.cpp — the reference replicates input rows
        per set then aggregates once; aggregating per set over the original
        input and unioning the small outputs is the cheaper TPU shape),
        then UNION ALL. grouping(expr) binds to a per-branch literal."""
        from starrocks_tpu.exec.plan import SetOp

        # resolve grouping(expr) calls -> group_by index + synthetic column
        grouping_calls: list[tuple] = []   # (node, key_index, out_name)

        def find_grouping(node):
            if isinstance(node, ast.Func) and node.name == "grouping":
                for i, g in enumerate(stmt.group_by):
                    if _ast_equal(node.args[0], g):
                        name = _gen("grp")
                        grouping_calls.append((node, i, name))
                        self._agg_map[id(node)] = ("col", name)
                        return
                raise ValueError("grouping() argument is not a GROUP BY key")
            if dataclasses.is_dataclass(node):
                for f in dataclasses.fields(node):
                    v = getattr(node, f.name)
                    if isinstance(v, list):
                        for x in v:
                            if isinstance(x, tuple):
                                for y in x:
                                    if isinstance(y, ast.Node):
                                        find_grouping(y)
                            elif isinstance(x, ast.Node):
                                find_grouping(x)
                    elif isinstance(v, ast.Node):
                        find_grouping(v)

        for it in stmt.items:
            find_grouping(it.expr)
        if stmt.having is not None:
            find_grouping(stmt.having)
        for e, _ in stmt.order_by:
            find_grouping(e)

        branches = []
        for set_idxs in stmt.grouping_sets:
            keep = set(set_idxs)
            masked = [key_names[i] for i in range(len(key_names))
                      if i not in keep]
            branch = plan
            if masked:
                branch = AddColumns(branch,
                                    {k: E.NullLike(k) for k in masked})
            agg = self._plan_agg_with_distincts(branch, key_names, specs,
                                                distinct_aggs, est, gc_aggs)
            gcols = {name: E.Literal(0 if kidx in keep else 1, dt.INT64)
                     for _, kidx, name in grouping_calls}
            if gcols:
                agg = AddColumns(agg, gcols)
            branches.append(agg)
        agg_plan = branches[0]
        for b2 in branches[1:]:
            agg_plan = SetOp(agg_plan, b2, "union_all")

        gk_map = {}
        for alias, m in stream.maps.items():
            gk_map[alias] = {sql: pn for sql, pn in m.items()
                             if pn in key_names}
        synth = {pn: pn for pn in key_names}
        synth.update({s.out: s.out for s in specs})
        synth.update({name: name for _, _, name in grouping_calls})
        synth.update({d[2]: d[2] for d in distinct_aggs})
        synth.update({g[2]: g[2] for g in gc_aggs})
        gk_map["_agg"] = synth
        nsets = len(stmt.grouping_sets)
        out_rel = Relation(agg_plan, gk_map, [], max(1, est * nsets))

        if stmt.having is not None:
            for c in conjuncts(stmt.having):
                pred = self._bind_with_agg_refs(c, Binder(Scope([out_rel])))
                out_rel = dataclasses.replace(out_rel,
                                              plan=Filter(out_rel.plan, pred))
        return out_rel

    def _plan_windows(self, stream: Relation, win_nodes, scope) -> Relation:
        """Plan WindowExpr nodes: bind partition/order/argument expressions to
        columns, group specs sharing a (partition, order) signature onto one
        Window node (one sort), and record result bindings in _win_map.
        (AnalyticAnalyzer + AnalyticPlanner analog, fe/.../sql/analyzer.)"""
        from starrocks_tpu.ops.window import WindowSpec
        b = Binder(scope)
        pre_cols: dict[str, E.Expr] = {}

        def as_col(e):
            bound = self._bind_with_agg_refs(fold_const(e), b)
            if isinstance(bound, E.ColRef):
                return bound.name
            name = _gen("w")
            pre_cols[name] = bound
            return name

        groups: dict = {}
        for node in win_nodes:
            if id(node) in self._win_map:
                continue
            fn = node.func.name
            if fn not in WINDOW_FN_NAMES:
                raise NotImplementedError(f"window function {fn}")
            pnames = tuple(as_col(e) for e in node.partition_by)
            okeys = tuple(SortKey(as_col(e), asc=asc)
                          for e, asc in node.order_by)
            col_arg = None
            offset, param, default_expr = 1, None, None
            if fn == "ntile":
                param = int(fold_const(node.func.args[0]).value)
            elif fn in ("lag", "lead"):
                col_arg = as_col(node.func.args[0])
                if len(node.func.args) > 1:
                    offset = int(fold_const(node.func.args[1]).value)
                if len(node.func.args) > 2:
                    default_expr = self._bind_with_agg_refs(
                        fold_const(node.func.args[2]), b)
            elif fn in ("first_value", "last_value", "sum", "min", "max",
                        "avg"):
                col_arg = as_col(node.func.args[0])
            elif fn == "count" and not node.func.star and node.func.args:
                col_arg = as_col(node.func.args[0])
            running = peers = False
            frame_rows = frame_range = None
            if node.frame is not None:
                kind, start, end = node.frame

                def bound_rows(bound, sign):
                    # rows before (sign=+1 for PRECEDING side) / after the
                    # current row; None = unbounded
                    if bound == "current":
                        return 0
                    if bound in ("unbounded_preceding", "unbounded_following"):
                        return None
                    word, e = bound
                    k = fold_const(e)
                    if not isinstance(k, ast.Lit):
                        raise ValueError(
                            "window frame offset must be a constant")
                    v = k.value / (10 ** k.scale) if k.kind == "decimal" \
                        else k.value
                    return v if (word == "preceding") == (sign > 0) else -v

                p = bound_rows(start, +1)   # rows/units preceding
                f = bound_rows(end, -1)     # rows/units following
                if p is None and f == 0:
                    running, peers = True, kind == "range"
                elif p is None and f is None:
                    pass                    # whole partition
                elif kind == "rows":
                    frame_rows = (None if p is None else int(p),
                                  None if f is None else int(f))
                else:
                    # RANGE with a numeric offset: frame = rows whose order
                    # key value lies within [v - p, v + f] (value units;
                    # searchsorted per partition in ops.window)
                    if len(okeys) != 1:
                        raise ValueError(
                            "RANGE frame with offset requires exactly one "
                            "ORDER BY key")
                    frame_range = (p, f)
            elif (fn in ("sum", "min", "max", "avg", "count", "last_value")
                  and node.order_by):
                # SQL default frame with ORDER BY:
                # RANGE UNBOUNDED PRECEDING .. CURRENT ROW
                running, peers = True, True
            out = _gen("win")
            spec = WindowSpec(fn, col_arg, out, running=running, peers=peers,
                              offset=offset, param=param, frame=frame_rows,
                              range_frame=frame_range)
            groups.setdefault((pnames, okeys), []).append(spec)
            expr: E.Expr = E.col(out)
            if default_expr is not None:
                expr = E.Coalesce([expr, default_expr])
            self._win_map[id(node)] = expr

        plan = stream.plan
        if pre_cols:
            plan = AddColumns(plan, pre_cols)
        for (pnames, okeys), specs in groups.items():
            plan = Window(plan, pnames, okeys, tuple(specs))
        return dataclasses.replace(stream, plan=plan)

    def _est_groups(self, stream: Relation, group_by) -> int:
        est = 1
        for g in group_by:
            ndv = None
            if isinstance(g, ast.Col):
                for tmeta in self.catalog.tables.values():
                    if g.name in tmeta.stats:
                        ndv = tmeta.stats[g.name].ndv
                        break
            est *= ndv if ndv else 64
        return int(min(max(est, 16), max(stream.size, 16)))

    def _bind_with_agg_refs(self, node: ast.Node, binder: Binder) -> E.Expr:
        """Bind an output expression where planned aggregates / windows /
        scalar subqueries / group-by expressions substitute as column refs.
        Installed as a Binder hook so substitution reaches aggregates nested
        under ANY wrapper (cast(sum(x)) in q49, coalesce(sum(x), 0), ...)."""
        smap = getattr(self, "_sel_sub_map", {})
        wmap = getattr(self, "_win_map", {})
        amap = getattr(self, "_agg_map", {})
        gb_exprs = getattr(self, "_gb_exprs", [])

        def hook(n):
            if id(n) in smap:
                return smap[id(n)]
            if id(n) in wmap:
                return wmap[id(n)]
            if id(n) in amap:
                entry = amap[id(n)]
                if entry[0] == "col":
                    return E.col(entry[1])
                _, s, cnt = entry
                return E.Arith("/", E.col(s), E.col(cnt))
            for g_ast, key_name in gb_exprs:
                if _ast_equal(n, g_ast):
                    return E.col(key_name)
            if isinstance(n, ast.Func) and n.name in AGG_FN_NAMES:
                raise ValueError("aggregate not planned (agg_map miss)")
            return None

        prev = getattr(binder, "hook", None)
        binder.hook = hook
        try:
            return binder.bind(node)
        finally:
            binder.hook = prev




def rewrite_eager_count(plan: PlanNode) -> PlanNode:
    """Eager aggregation (the CBO push-agg-through-join rewrite the
    reference applies to q13-class shapes, SplitAggregateRule family):
    COUNT of build-side columns grouped by probe-side keys over a FANOUT
    (non-unique) join rewrites to a pre-aggregate of the build side by the
    join key + a UNIQUE join + SUM of the per-key counts. The join's static
    output shrinks from probe_rows x fanout to probe_rows (q13: a 9.6M-row
    expand join becomes a 150k-row unique-build lookup)."""
    import dataclasses as _dc

    def xform(node):
        for f in _dc.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, PlanNode):
                setattr(node, f.name, xform(v))
        if not isinstance(node, Aggregate) or not node.keys or not node.aggs:
            return node
        j = node.child
        if (not isinstance(j, HashJoin) or j.unique
                or j.join_type not in ("left_outer", "inner")
                or len(j.left_keys) != 1 or j.null_safe):
            return node
        bcols = set(j.build_cols)
        if any(a.fn != "count" or a.col not in bcols for a in node.aggs):
            return node
        if any(k in bcols for k in node.keys):
            return node
        pk, bk = j.left_keys[0], j.right_keys[0]
        pre_specs = [AggSpec("count", a.col, f"_ec{node.node_id}_{i}")
                     for i, a in enumerate(node.aggs)]
        pre = Aggregate(j.build, (bk,), tuple(pre_specs),
                        est_groups=max(node.est_groups, 1024))
        join2 = HashJoin(j.probe, pre, (pk,), (bk,), j.join_type,
                         tuple(sp.out for sp in pre_specs),
                         capacity=j.capacity, unique=True)
        add = AddColumns(join2, {
            sp.out + "z": E.Coalesce([E.ColRef(sp.out),
                                      E.Literal(0, dt.INT64)])
            for sp in pre_specs})
        return Aggregate(add, node.keys,
                         tuple(AggSpec("sum", sp.out + "z", a.out)
                               for sp, a in zip(pre_specs, node.aggs)),
                         est_groups=node.est_groups)

    return xform(plan)

def plan_sql(text: str, catalog: Catalog, views: Optional[dict] = None) -> PlanNode:
    from starrocks_tpu.sql.parser import parse
    return plan_ast(parse(text), catalog, views)


def plan_ast(stmt, catalog: Catalog, views: Optional[dict] = None) -> PlanNode:
    """Plan an already-parsed statement (used by the MV rewriter, which
    produces rewritten ASTs rather than SQL text)."""
    from starrocks_tpu.sql.parser import parse
    p = Planner(catalog)
    if views:
        p._ctes = {name: parse(sql) for name, sql in views.items()}
    return prune_scan_columns(rewrite_eager_count(p.plan_stmt(stmt).plan))


# ---------------------------------------------------------------------------
# Scan column pruning (final physical pass)
# ---------------------------------------------------------------------------

def _expr_refs(e, out: set) -> None:
    """Collect every ColRef name under `e`, recursing through dataclass
    fields and arbitrarily nested lists/tuples (Case.branches is a list of
    (cond, value) TUPLES — a flat walk missed those and pruned columns a
    CASE arm still reads)."""
    from starrocks_tpu.exprs.expr import ColRef, Expr
    if isinstance(e, ColRef):
        out.add(e.name)
        return
    if isinstance(e, (list, tuple)):
        for x in e:
            _expr_refs(x, out)
        return
    if isinstance(e, Expr) and dataclasses.is_dataclass(e):
        for f in dataclasses.fields(e):
            _expr_refs(getattr(e, f.name), out)


def prune_scan_columns(plan):
    """Restrict every Scan/BlockScan to the columns its ancestors actually
    consume (the reference's column pruning, done in the optimizer's
    PruneScanColumnRule; here a demand-driven pass over the physical plan).

    This is a first-order TPU win, not a memory nicety: adaptive compaction
    and join-output row movement gather EVERY carried column (~13ms per
    6M-row lane on v5e through XLA's fixed-cost gather), so a filter chain
    over a 40-column SSB flat table was paying ~0.5s per compaction for
    columns the query never touches.

    Demand propagates as a worklist to fixpoint: a node's frontier is the
    UNION of every parent's demand (shared CTE subplans serve all their
    consumers), where `None` means "every column the child produces
    surfaces in the result" (no pruning below until a projection/aggregate
    boundary resets the frontier). SetOp children are positional — always
    None."""
    from starrocks_tpu.exec import plan as P

    acc, nodes = _demand(plan)
    # phase 2: narrow alias-Projects (the planner materializes EVERY
    # renamed table column; q21's l2/l3 Projects carried 16 lineitem
    # columns for a 1-column aggregate), then recompute demand so the
    # scans see the narrowed frontiers
    for nid, needed in acc.items():
        node = nodes[nid]
        if isinstance(node, P.Project) and needed is not None:
            kept = {k: v for k, v in node.outputs.items() if k in needed}
            if kept and len(kept) < len(node.outputs):
                node.outputs = kept
    acc, nodes = _demand(plan)
    for nid, needed in acc.items():
        node = nodes[nid]
        if not isinstance(node, (P.Scan, P.BlockScan)) or needed is None:
            continue
        base = list(node.columns) if node.columns is not None else None
        keep = set(needed)
        if isinstance(node, P.BlockScan):
            keep |= {c for c, _lo, _hi in node.pred_ranges}
        cols = [c for c in (base or sorted(keep)) if c in keep] \
            if base is not None else sorted(keep)
        node.columns = tuple(cols) if cols else \
            (tuple(base[:1]) if base else None)
    return plan


def _demand(plan):
    """Worklist fixpoint of per-node column demand (None = all)."""
    from starrocks_tpu.exec import plan as P

    # acc[node_id]: None = all columns demanded; else a (growing) set
    acc: dict = {}
    nodes: dict = {}

    def union(a, b):
        if a is None or b is None:
            return None
        return a | b

    work = [(plan, None)]
    while work:
        node, needed = work.pop()
        nid = node.node_id
        if nid in acc:
            merged = union(acc[nid], needed)
            if merged == acc[nid] or (
                    merged is not None and acc[nid] is not None
                    and merged <= acc[nid]):
                continue
            acc[nid] = merged
        else:
            acc[nid] = needed
        nodes[nid] = node
        needed = acc[nid]
        if isinstance(node, (P.Scan, P.BlockScan)):
            continue
        if isinstance(node, P.Filter):
            refs = set()
            _expr_refs(node.predicate, refs)
            work.append((node.child,
                         None if needed is None else (needed | refs)))
        elif isinstance(node, P.Project):
            refs = set()
            for v in node.outputs.values():
                if isinstance(v, str):
                    refs.add(v)
                else:
                    _expr_refs(v, refs)
            work.append((node.child, refs))
        elif isinstance(node, P.AddColumns):
            refs = set()
            for v in node.outputs.values():
                if isinstance(v, str):
                    refs.add(v)
                else:
                    _expr_refs(v, refs)
            work.append((node.child, None if needed is None
                         else (needed - set(node.outputs)) | refs))
        elif isinstance(node, P.HashJoin):
            pk = set(node.left_keys)
            work.append((node.probe, None if needed is None
                         else (needed - set(node.build_cols)) | pk))
            work.append((node.build,
                         set(node.right_keys) | set(node.build_cols)))
        elif isinstance(node, P.Aggregate):
            work.append((node.child,
                         set(node.keys) | {a.col for a in node.aggs
                                           if a.col}))
        elif isinstance(node, P.GroupConcat):
            work.append((node.child, set(node.keys) | {node.col}))
        elif isinstance(node, P.Sort):
            keys = {k.name for k in node.keys}
            work.append((node.child,
                         None if needed is None else (needed | keys)))
        elif isinstance(node, P.Limit):
            work.append((node.child, needed))
        elif isinstance(node, P.Window):
            refs = set(node.partition_by) | {k.name for k in node.order_by}
            for sp in node.specs:
                if sp.col:
                    refs.add(sp.col)
            outs = {sp.out for sp in node.specs}
            work.append((node.child, None if needed is None
                         else (needed - outs) | refs))
        elif isinstance(node, P.SetOp):
            work.append((node.left, None))   # positional: arity is fixed
            work.append((node.right, None))
        elif isinstance(node, P.CrossJoin):
            rc = set(node.right_cols)
            work.append((node.left,
                         None if needed is None else (needed - rc)))
            work.append((node.right, rc))
        elif isinstance(node, P.BroadcastScalar):
            bc = set(node.columns)
            work.append((node.child,
                         None if needed is None else (needed - bc)))
            work.append((node.source, bc))
        else:                           # unknown node: give up below it
            for c in node.children():
                work.append((c, None))

    return acc, nodes
