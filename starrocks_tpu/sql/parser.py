"""Recursive-descent SQL parser for the analytic SELECT subset.

Analog of StarRocks' parser (fe/.../sql/parser/StarRocks.g4 + AstBuilder) —
covers everything the TPC-H/SSB query classes need: comma + explicit joins,
scalar/IN/EXISTS subqueries (correlated), CASE, BETWEEN, LIKE, date/interval
literals and arithmetic, aggregate functions with DISTINCT, extract/substring.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from starrocks_tpu.sql import ast
from starrocks_tpu.sql.lexer import Token, tokenize


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0

    # -- token helpers -------------------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, value: Optional[str] = None) -> Optional[Token]:
        t = self.peek()
        if t.kind == kind and (value is None or t.value == value):
            return self.next()
        return None

    def expect(self, kind: str, value: Optional[str] = None) -> Token:
        t = self.accept(kind, value)
        if t is None:
            got = self.peek()
            raise SyntaxError(f"expected {value or kind}, got {got.value!r} @ {got.pos}")
        return t

    def kw(self, word: str) -> Optional[Token]:
        return self.accept("KEYWORD", word)

    # -- entry ----------------------------------------------------------------
    def parse(self):
        if self.kw("with"):
            ctes = []
            while True:
                name = self.expect("IDENT").value
                self.expect("KEYWORD", "as")
                self.expect("SYMBOL", "(")
                q = self.parse_compound()
                self.expect("SYMBOL", ")")
                ctes.append((name, q))
                if not self.accept("SYMBOL", ","):
                    break
            stmt = ast.WithStmt(ctes, self.parse_compound())
        else:
            stmt = self.parse_compound()
        self.accept("SYMBOL", ";")
        self.expect("EOF")
        return stmt

    def parse_compound(self):
        left = self.parse_setop_operand()
        while True:
            kind = None
            if self.kw("union"):
                kind = "union_all" if self.kw("all") else "union"
            elif self.kw("intersect"):
                kind = "intersect"
            elif self.kw("except"):
                kind = "except"
            if kind is None:
                break
            right = self.parse_setop_operand()
            if isinstance(right, ast.SelectStmt):
                # ORDER BY / LIMIT after the last select belong to the compound
                order_by, limit = right.order_by, right.limit
                right.order_by, right.limit = [], None
            else:
                order_by, limit = [], None
            left = ast.SetOpStmt(kind, left, right, order_by, limit)
        if isinstance(left, ast.SetOpStmt) and not left.order_by:
            # compound-level ORDER BY / LIMIT after a parenthesized operand
            if self.kw("order"):
                self.expect("KEYWORD", "by")
                while True:
                    e = self.parse_expr()
                    asc = not self.kw("desc")
                    if asc:
                        self.kw("asc")
                    left.order_by.append((e, asc))
                    if not self.accept("SYMBOL", ","):
                        break
            if left.limit is None and self.kw("limit"):
                left.limit = int(self.expect("NUMBER").value)
        return left

    def parse_setop_operand(self):
        """A set-op operand: SELECT ... or a parenthesized compound."""
        t = self.peek()
        if t.kind == "SYMBOL" and t.value == "(":
            t1 = self.peek(1)
            if ((t1.kind == "KEYWORD" and t1.value in ("select", "with"))
                    or (t1.kind == "SYMBOL" and t1.value == "(")):
                self.next()
                q = self.parse_compound()
                self.expect("SYMBOL", ")")
                return q
        return self.parse_select()

    def parse_select(self) -> ast.SelectStmt:
        self.expect("KEYWORD", "select")
        distinct = bool(self.kw("distinct"))
        star = False
        items = []
        if self.accept("SYMBOL", "*"):
            star = True
        else:
            while True:
                e = self.parse_expr()
                alias = None
                if self.kw("as"):
                    alias = self.expect("IDENT").value
                elif self.peek().kind == "IDENT":
                    alias = self.next().value
                items.append(ast.SelectItem(e, alias))
                if not self.accept("SYMBOL", ","):
                    break
        froms, joins = [], []
        if self.kw("from"):
            froms.append(self.parse_table_ref())
            while True:
                if self.accept("SYMBOL", ","):
                    froms.append(self.parse_table_ref())
                    continue
                jk = self.parse_join_kind()
                if jk is None:
                    break
                ref = self.parse_table_ref()
                on = None
                if self.kw("on"):
                    on = self.parse_expr()
                joins.append(ast.JoinClause(jk, ref, on))
        where = self.parse_expr() if self.kw("where") else None
        group_by, grouping_sets = [], None
        if self.kw("group"):
            self.expect("KEYWORD", "by")
            group_by, grouping_sets = self.parse_group_by()
        having = self.parse_expr() if self.kw("having") else None
        order_by = []
        if self.kw("order"):
            self.expect("KEYWORD", "by")
            while True:
                e = self.parse_expr()
                asc = True
                if self.kw("desc"):
                    asc = False
                else:
                    self.kw("asc")
                order_by.append((e, asc))
                if not self.accept("SYMBOL", ","):
                    break
        limit = None
        if self.kw("limit"):
            limit = int(self.expect("NUMBER").value)
        return ast.SelectStmt(items=items, star=star, froms=froms, joins=joins,
                              where=where, group_by=group_by, having=having,
                              order_by=order_by, limit=limit, distinct=distinct,
                              grouping_sets=grouping_sets)

    def parse_group_by(self):
        """GROUP BY exprs | ROLLUP(..) | CUBE(..) | GROUPING SETS ((..), ..).
        Returns (group_by exprs, grouping_sets index tuples or None)."""
        if self.kw("rollup") or self.kw("cube"):
            kind = self.toks[self.i - 1].value
            self.expect("SYMBOL", "(")
            exprs = [self.parse_expr()]
            while self.accept("SYMBOL", ","):
                exprs.append(self.parse_expr())
            self.expect("SYMBOL", ")")
            k = len(exprs)
            if kind == "rollup":
                sets = [tuple(range(i)) for i in range(k, -1, -1)]
            else:
                sets = [tuple(i for i in range(k) if mask & (1 << i))
                        for mask in range(2 ** k - 1, -1, -1)]
            return exprs, sets
        if self.kw("grouping"):
            t = self.expect("IDENT")
            if t.value.lower() != "sets":
                raise SyntaxError(f"expected SETS after GROUPING @ {t.pos}")
            self.expect("SYMBOL", "(")
            raw_sets = []
            while True:
                if self.accept("SYMBOL", "("):
                    s = []
                    if not (self.peek().kind == "SYMBOL"
                            and self.peek().value == ")"):
                        s.append(self.parse_expr())
                        while self.accept("SYMBOL", ","):
                            s.append(self.parse_expr())
                    self.expect("SYMBOL", ")")
                else:
                    s = [self.parse_expr()]
                raw_sets.append(s)
                if not self.accept("SYMBOL", ","):
                    break
            self.expect("SYMBOL", ")")
            # union of all set exprs, de-duplicated by repr equality
            exprs, sets = [], []
            for s in raw_sets:
                idxs = []
                for e in s:
                    for i, g in enumerate(exprs):
                        if repr(g) == repr(e):
                            idxs.append(i)
                            break
                    else:
                        exprs.append(e)
                        idxs.append(len(exprs) - 1)
                sets.append(tuple(idxs))
            return exprs, sets
        group_by = [self.parse_expr()]
        while self.accept("SYMBOL", ","):
            group_by.append(self.parse_expr())
        return group_by, None

    def parse_join_kind(self) -> Optional[str]:
        if self.kw("join") or (self.kw("inner") and self.expect("KEYWORD", "join")):
            return "inner"
        if self.kw("left"):
            self.kw("outer")
            self.expect("KEYWORD", "join")
            return "left_outer"
        if self.kw("right"):
            self.kw("outer")
            self.expect("KEYWORD", "join")
            return "right_outer"
        if self.kw("full"):
            self.kw("outer")
            self.expect("KEYWORD", "join")
            return "full_outer"
        return None

    def parse_table_ref(self):
        if self.accept("SYMBOL", "("):
            q = self.parse_compound()
            self.expect("SYMBOL", ")")
            self.kw("as")
            alias = self.expect("IDENT").value if self.peek().kind == "IDENT" else None
            return ast.SubqueryRef(q, alias)
        name = self.expect("IDENT").value
        alias = None
        if self.kw("as"):
            alias = self.expect("IDENT").value
        elif self.peek().kind == "IDENT":
            alias = self.next().value
        return ast.TableRef(name, alias)

    # -- expressions (precedence climbing) ------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        e = self.parse_and()
        while self.kw("or"):
            e = ast.BinOp("or", e, self.parse_and())
        return e

    def parse_and(self):
        e = self.parse_not()
        while self.kw("and"):
            e = ast.BinOp("and", e, self.parse_not())
        return e

    def parse_not(self):
        if self.kw("not"):
            return ast.UnaryOp("not", self.parse_not())
        return self.parse_predicate()

    def parse_predicate(self):
        e = self.parse_additive()
        negated = bool(self.kw("not"))
        if self.kw("between"):
            lo = self.parse_additive()
            self.expect("KEYWORD", "and")
            hi = self.parse_additive()
            return ast.BetweenExpr(e, lo, hi, negated)
        if self.kw("in"):
            self.expect("SYMBOL", "(")
            if self.peek().kind == "KEYWORD" and self.peek().value == "select":
                q = self.parse_select()
                self.expect("SYMBOL", ")")
                return ast.InSubquery(e, q, negated)
            values = [self.parse_additive()]
            while self.accept("SYMBOL", ","):
                values.append(self.parse_additive())
            self.expect("SYMBOL", ")")
            return ast.InList(e, values, negated)
        if self.kw("like"):
            pat = self.expect("STRING").value
            return ast.LikeExpr(e, pat, negated)
        if self.kw("is"):
            neg = bool(self.kw("not"))
            self.expect("KEYWORD", "null")
            return ast.IsNullExpr(e, neg)
        if negated:
            raise SyntaxError("dangling NOT")
        t = self.peek()
        if t.kind == "SYMBOL" and t.value in ("=", "<>", "!=", "<", "<=", ">", ">="):
            op = self.next().value
            if op == "!=":
                op = "<>"
            rhs = self.parse_additive()
            return ast.BinOp(op, e, rhs)
        return e

    def parse_additive(self):
        e = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.kind == "SYMBOL" and t.value in ("+", "-"):
                op = self.next().value
                e = ast.BinOp(op, e, self.parse_multiplicative())
            elif t.kind == "SYMBOL" and t.value == "||":
                self.next()
                e = ast.Func("concat", [e, self.parse_multiplicative()])
            else:
                return e

    def parse_multiplicative(self):
        e = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "SYMBOL" and t.value in ("*", "/"):
                op = self.next().value
                e = ast.BinOp(op, e, self.parse_unary())
            elif t.kind == "SYMBOL" and t.value == "%":
                self.next()
                e = ast.Func("mod", [e, self.parse_unary()])
            else:
                return e

    def parse_unary(self):
        if self.accept("SYMBOL", "-"):
            return ast.UnaryOp("-", self.parse_unary())
        self.accept("SYMBOL", "+")
        return self.parse_primary()

    def parse_primary(self):
        t = self.peek()
        if t.kind == "SYMBOL" and t.value == "(":
            self.next()
            if self.peek().kind == "KEYWORD" and self.peek().value == "select":
                q = self.parse_select()
                self.expect("SYMBOL", ")")
                return ast.ScalarSubquery(q)
            e = self.parse_expr()
            self.expect("SYMBOL", ")")
            return e
        if t.kind == "NUMBER":
            self.next()
            if "." in t.value:
                frac = t.value.split(".")[1]
                scale = len(frac)
                return ast.Lit(int(round(float(t.value) * 10**scale)), "decimal", scale)
            return ast.Lit(int(t.value), "int")
        if t.kind == "STRING":
            self.next()
            return ast.Lit(t.value, "string")
        if t.kind == "KEYWORD":
            return self.parse_keyword_primary()
        if t.kind == "IDENT":
            self.next()
            if self.accept("SYMBOL", "."):
                col = self.expect("IDENT").value
                return ast.Col(col, qualifier=t.value)
            if self.peek().kind == "SYMBOL" and self.peek().value == "(":
                return self.parse_call(t.value)
            return ast.Col(t.value)
        raise SyntaxError(f"unexpected token {t.value!r} @ {t.pos}")

    def parse_keyword_primary(self):
        t = self.next()
        word = t.value
        if word == "date":
            s = self.expect("STRING").value
            days = int((np.datetime64(s) - np.datetime64("1970-01-01")).astype(int))
            return ast.Lit(days, "date")
        if word == "interval":
            qty = self.expect("STRING").value
            unit_t = self.next()
            unit = unit_t.value
            n = int(qty)
            if unit == "day":
                return ast.Lit(n, "interval")
            if unit == "month":
                return ast.Lit(0, "interval", months=n)
            if unit == "year":
                return ast.Lit(0, "interval", months=12 * n)
            raise SyntaxError(f"unsupported interval unit {unit}")
        if word == "case":
            # simple form `case X when v then ...` desugars to searched form
            operand = None
            if not (self.peek().kind == "KEYWORD"
                    and self.peek().value == "when"):
                operand = self.parse_expr()
            branches = []
            default = None
            while self.kw("when"):
                cond = self.parse_expr()
                if operand is not None:
                    cond = ast.BinOp("=", operand, cond)
                self.expect("KEYWORD", "then")
                val = self.parse_expr()
                branches.append((cond, val))
            if self.kw("else"):
                default = self.parse_expr()
            self.expect("KEYWORD", "end")
            return ast.CaseExpr(branches, default)
        if word == "extract":
            self.expect("SYMBOL", "(")
            field = self.next().value
            self.expect("KEYWORD", "from")
            e = self.parse_expr()
            self.expect("SYMBOL", ")")
            if field != "year":
                raise SyntaxError(f"extract({field}) unsupported")
            return ast.Func("year", [e])
        if word in ("substring", "coalesce", "year", "count", "sum", "avg",
                    "min", "max", "cast"):
            return self.parse_call(word)
        if word == "null":
            return ast.Lit(None, "null")
        if word in ("true", "false"):
            return ast.Lit(word == "true", "bool")
        if word == "not":
            return ast.UnaryOp("not", self.parse_not())
        if word == "exists":
            self.expect("SYMBOL", "(")
            q = self.parse_select()
            self.expect("SYMBOL", ")")
            return ast.ExistsExpr(q)
        # any other keyword followed by "(" is a function call (keywords like
        # month/day/left/right/if double as function names)
        if self.peek().kind == "SYMBOL" and self.peek().value == "(":
            return self.parse_call(word)
        raise SyntaxError(f"unexpected keyword {word!r} @ {t.pos}")

    def parse_call(self, name: str):
        self.expect("SYMBOL", "(")
        if name == "count" and self.accept("SYMBOL", "*"):
            self.expect("SYMBOL", ")")
            f = ast.Func("count", [], star=True)
            if self.kw("over"):
                return self.parse_over(f)
            return f
        if name == "cast":
            e = self.parse_expr()
            self.expect("KEYWORD", "as")
            tname = self.next().value.lower()
            scale = 0
            if self.accept("SYMBOL", "("):
                self.expect("NUMBER")          # precision (ignored)
                if self.accept("SYMBOL", ","):
                    scale = int(self.expect("NUMBER").value)
                self.expect("SYMBOL", ")")
            self.expect("SYMBOL", ")")
            target = {
                "int": "int", "integer": "int", "bigint": "int",
                "smallint": "int", "tinyint": "int", "largeint": "int",
                "double": "double", "float": "double",
                "decimal": "decimal", "numeric": "decimal",
                "varchar": "string", "char": "string", "string": "string",
                "date": "date", "boolean": "bool", "bool": "bool",
            }.get(tname)
            if target is None:
                raise SyntaxError(f"cast target {tname!r} unsupported")
            return ast.CastExpr(e, target, scale)
        distinct = bool(self.kw("distinct"))
        args = []
        if not (self.peek().kind == "SYMBOL" and self.peek().value == ")"):
            args.append(self.parse_expr())
            while self.accept("SYMBOL", ","):
                args.append(self.parse_expr())
        self.expect("SYMBOL", ")")
        f = ast.Func(name, args, distinct=distinct)
        if self.kw("over"):
            return self.parse_over(f)
        return f

    def parse_over(self, f: ast.Func) -> ast.WindowExpr:
        self.expect("SYMBOL", "(")
        partition_by, order_by = [], []
        if self.kw("partition"):
            self.expect("KEYWORD", "by")
            partition_by.append(self.parse_expr())
            while self.accept("SYMBOL", ","):
                partition_by.append(self.parse_expr())
        if self.kw("order"):
            self.expect("KEYWORD", "by")
            while True:
                e = self.parse_expr()
                asc = True
                if self.kw("desc"):
                    asc = False
                else:
                    self.kw("asc")
                order_by.append((e, asc))
                if not self.accept("SYMBOL", ","):
                    break
        frame = None
        fk = "rows" if self.kw("rows") else ("range" if self.kw("range") else None)
        if fk:
            if self.kw("between"):
                start = self._parse_frame_bound()
                self.expect("KEYWORD", "and")
                end = self._parse_frame_bound()
            else:
                start = self._parse_frame_bound()
                end = "current"
            frame = (fk, start, end)
        self.expect("SYMBOL", ")")
        return ast.WindowExpr(f, partition_by, order_by, frame)

    def _parse_frame_bound(self):
        """UNBOUNDED PRECEDING/FOLLOWING | CURRENT ROW | <expr> PRECEDING |
        <expr> FOLLOWING."""
        if self.kw("unbounded"):
            if self.kw("preceding"):
                return "unbounded_preceding"
            self.expect("KEYWORD", "following")
            return "unbounded_following"
        if self.kw("current"):
            self.expect("KEYWORD", "row")
            return "current"
        e = self.parse_expr()
        if self.kw("preceding"):
            return ("preceding", e)
        self.expect("KEYWORD", "following")
        return ("following", e)


def parse(text: str) -> ast.SelectStmt:
    return Parser(text).parse()
