"""SQL abstract syntax tree.

Analog of StarRocks' AST (fe/.../sql/ast/, built by AstBuilder.java) reduced
to the analytic SELECT subset the engine plans.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional


class Node:
    pass


# -- expressions -------------------------------------------------------------

@dataclasses.dataclass
class Col(Node):
    name: str
    qualifier: Optional[str] = None

    def __repr__(self):
        return f"{self.qualifier}.{self.name}" if self.qualifier else self.name


@dataclasses.dataclass
class Lit(Node):
    value: Any
    kind: str          # int | decimal | string | date | interval | bool | null
    scale: int = 0     # decimal scale; for interval: days in value, months in scale2
    months: int = 0    # interval months


@dataclasses.dataclass
class BinOp(Node):
    op: str            # + - * / = <> < <= > >= and or
    left: Node
    right: Node


@dataclasses.dataclass
class UnaryOp(Node):
    op: str            # not | -
    child: Node


@dataclasses.dataclass
class Func(Node):
    name: str          # sum avg count min max year extract_year substring coalesce
    args: list
    distinct: bool = False
    star: bool = False  # count(*)


@dataclasses.dataclass
class WindowExpr(Node):
    """fn(args) OVER ([PARTITION BY ...] [ORDER BY ...] [frame]).

    frame is None (SQL-default frame) or (kind, start, end): kind in
    {rows, range}; start/end each one of "unbounded_preceding",
    "unbounded_following", "current", ("preceding", expr),
    ("following", expr) — general ROWS frames plus the unbounded RANGE
    frames (the Analytor frame set, be/src/exec/analytor.h:52; RANGE with
    numeric offsets is not supported, matching the reference)."""
    func: Func
    partition_by: list           # [expr]
    order_by: list               # [(expr, asc)]
    frame: Optional[tuple] = None


@dataclasses.dataclass
class CastExpr(Node):
    child: Node
    target: str        # int | double | decimal | string | date | bool
    scale: int = 0     # decimal target scale


@dataclasses.dataclass
class WithStmt(Node):
    """WITH name AS (query), ... body — CTEs are planned by inlining at each
    reference (the reference's default CTE strategy for non-reused CTEs)."""
    ctes: list         # [(name, SelectStmt|SetOpStmt)]
    body: Node


@dataclasses.dataclass
class CaseExpr(Node):
    branches: list     # [(cond, value)]
    default: Optional[Node]


@dataclasses.dataclass
class BetweenExpr(Node):
    expr: Node
    lo: Node
    hi: Node
    negated: bool = False


@dataclasses.dataclass
class InList(Node):
    expr: Node
    values: list
    negated: bool = False


@dataclasses.dataclass
class LikeExpr(Node):
    expr: Node
    pattern: str
    negated: bool = False


@dataclasses.dataclass
class IsNullExpr(Node):
    expr: Node
    negated: bool = False


@dataclasses.dataclass
class InSubquery(Node):
    expr: Node
    query: "SelectStmt"
    negated: bool = False


@dataclasses.dataclass
class ExistsExpr(Node):
    query: "SelectStmt"
    negated: bool = False


@dataclasses.dataclass
class ScalarSubquery(Node):
    query: "SelectStmt"


# -- relations ---------------------------------------------------------------

@dataclasses.dataclass
class TableRef(Node):
    name: str
    alias: Optional[str] = None


@dataclasses.dataclass
class SubqueryRef(Node):
    query: "SelectStmt"
    alias: str


@dataclasses.dataclass
class JoinClause(Node):
    """Explicit JOIN ... ON (comma joins live in SelectStmt.froms)."""
    kind: str          # inner | left_outer
    ref: Node          # TableRef | SubqueryRef
    on: Optional[Node]


@dataclasses.dataclass
class SelectItem(Node):
    expr: Node
    alias: Optional[str]


@dataclasses.dataclass
class SetOpStmt(Node):
    kind: str              # union | union_all | intersect | except
    left: Node             # SelectStmt | SetOpStmt
    right: Node
    order_by: list = dataclasses.field(default_factory=list)
    limit: "Optional[int]" = None


@dataclasses.dataclass
class SelectStmt(Node):
    items: list            # [SelectItem]; [] + star=True for SELECT *
    star: bool
    froms: list            # [TableRef|SubqueryRef]
    joins: list            # [JoinClause] attached after froms
    where: Optional[Node]
    group_by: list         # [Node]
    having: Optional[Node]
    order_by: list         # [(Node, asc: bool)]
    limit: Optional[int]
    distinct: bool = False
    grouping_sets: Optional[list] = None  # [tuple(indices into group_by)];
    # set by ROLLUP/CUBE/GROUPING SETS (RepeatNode analog,
    # be/src/exec/repeat_node.cpp)
