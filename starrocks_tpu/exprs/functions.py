"""Scalar function library: math / string / date / conditional families.

Analog of StarRocks' scalar function set (be/src/exprs/math_functions.cpp,
string_functions.cpp, time_functions.cpp — 200+ families behind the
FunctionSet registry). TPU redesign:

- numeric fns are elementwise jnp ops (XLA fuses them into consumers — the
  LLVM JIT analog for free); decimals stay exact int64 fixed-point wherever
  SQL semantics allow (round/floor/ceil/mod/abs/sign), floating otherwise
- string fns run over the DICTIONARY on the host at trace time and reach the
  device as an int LUT gather (the global-dict rewrite of
  fe/.../AddDecodeNodeForDictStringRule applied to every string fn)
- date fns use branchless civil-date arithmetic on int32 day numbers
  (Howard Hinnant's algorithms; no tables, pure VPU ops)

`build(name, args)` is the registry entry the SQL binder dispatches to.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp
import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column
from starrocks_tpu.column.dtypes import TypeKind
from starrocks_tpu.exprs.expr import (
    Case, Coalesce, Expr, Literal, StringFn, _combine_valid, _numeric_pair,
    _to_float, civil_from_days, lift,
)


def days_from_civil(y, m, d):
    """(year, month, day) -> days since 1970-01-01 (Hinnant, branchless)."""
    y = (y - (m <= 2)).astype(jnp.int32)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    mp = m + jnp.where(m > 2, -3, 9)
    doy = jnp.floor_divide(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def _trunc_div(a, b):
    """Integer division truncating toward zero (C semantics)."""
    q = jnp.floor_divide(jnp.abs(a), jnp.abs(b))
    return jnp.where((a < 0) != (b < 0), -q, q)


# ---------------------------------------------------------------------------
# numeric
# ---------------------------------------------------------------------------

def _float_fn(fn, domain: Optional[Callable] = None):
    def impl(*cols: Column) -> Column:
        fs = [_to_float(c) for c in cols]
        data = fn(*fs)
        valid = _combine_valid(*cols)
        if domain is not None:
            ok = domain(*fs)
            valid = ok if valid is None else (valid & ok)
            data = jnp.where(ok, data, 0.0)
        return Column(data, valid, dt.FLOAT64)
    return impl


def _abs(c: Column) -> Column:
    if c.dtype.kind is TypeKind.FLOAT64:
        return Column(jnp.abs(c.data), c.valid, dt.FLOAT64)
    return Column(jnp.abs(c.data.astype(jnp.int64)).astype(c.dtype.jnp_dtype),
                  c.valid, c.dtype)


def _sign(c: Column) -> Column:
    return Column(jnp.sign(_to_float(c)).astype(jnp.int32), c.valid, dt.INT32)


def _round(c: Column, d: int = 0) -> Column:
    """SQL ROUND: half away from zero. Exact on decimals."""
    if c.dtype.is_decimal:
        s = c.dtype.scale
        if d >= s:
            return c
        q = 10 ** (s - d)
        half = q // 2
        adj = jnp.where(c.data >= 0, c.data + half, c.data - half)
        data = _trunc_div(adj, jnp.int64(q))
        return Column(data, c.valid, dt.DECIMAL(max(d, 0)))
    if c.dtype.is_integer:
        if d >= 0:
            return c
        q = 10 ** (-d)
        half = q // 2
        x = c.data.astype(jnp.int64)
        adj = jnp.where(x >= 0, x + half, x - half)
        return Column(_trunc_div(adj, jnp.int64(q)) * q, c.valid, dt.INT64)
    f = _to_float(c)
    p = 10.0 ** d
    data = jnp.sign(f) * jnp.floor(jnp.abs(f) * p + 0.5) / p
    return Column(data, c.valid, dt.FLOAT64)


def _truncate(c: Column, d: int = 0) -> Column:
    if c.dtype.is_decimal:
        s = c.dtype.scale
        if d >= s:
            return c
        q = 10 ** (s - d)
        return Column(_trunc_div(c.data, jnp.int64(q)), c.valid,
                      dt.DECIMAL(max(d, 0)))
    f = _to_float(c)
    p = 10.0 ** d
    return Column(jnp.trunc(f * p) / p, c.valid, dt.FLOAT64)


def _floor(c: Column) -> Column:
    if c.dtype.is_decimal:
        data = jnp.floor_divide(c.data, jnp.int64(10 ** c.dtype.scale))
        return Column(data, c.valid, dt.INT64)
    if c.dtype.is_integer:
        return Column(c.data.astype(jnp.int64), c.valid, dt.INT64)
    return Column(jnp.floor(c.data).astype(jnp.int64), c.valid, dt.INT64)


def _ceil(c: Column) -> Column:
    if c.dtype.is_decimal:
        q = jnp.int64(10 ** c.dtype.scale)
        data = -jnp.floor_divide(-c.data, q)
        return Column(data, c.valid, dt.INT64)
    if c.dtype.is_integer:
        return Column(c.data.astype(jnp.int64), c.valid, dt.INT64)
    return Column(jnp.ceil(c.data).astype(jnp.int64), c.valid, dt.INT64)


def _mod(a: Column, b: Column) -> Column:
    da, db, kind, scale = _numeric_pair(a, b)
    valid = _combine_valid(a, b)
    if kind is TypeKind.FLOAT64:
        zero = db == 0.0
        data = jnp.where(zero, 0.0, da - jnp.trunc(da / jnp.where(zero, 1.0, db)) * db)
        valid = ~zero if valid is None else (valid & ~zero)
        return Column(data, valid, dt.FLOAT64)
    zero = db == 0
    safe = jnp.where(zero, 1, db)
    data = da - _trunc_div(da, safe) * safe   # sign follows dividend (SQL)
    valid = ~zero if valid is None else (valid & ~zero)
    if kind is TypeKind.DECIMAL:
        return Column(data, valid, dt.DECIMAL(scale))
    return Column(data, valid, dt.INT64 if data.dtype == jnp.int64 else dt.INT32)


def _fold_pair(op):
    def impl(*cols: Column) -> Column:
        out = cols[0]
        for c in cols[1:]:
            da, db, kind, scale = _numeric_pair(out, c)
            valid = _combine_valid(out, c)
            data = op(da, db)
            if kind is TypeKind.FLOAT64:
                out = Column(data, valid, dt.FLOAT64)
            elif kind is TypeKind.DECIMAL:
                out = Column(data, valid, dt.DECIMAL(scale))
            else:
                out = Column(data, valid,
                             dt.INT64 if data.dtype == jnp.int64 else dt.INT32)
        return out
    return impl


_NUMERIC: dict[str, Callable] = {
    "abs": _abs,
    "sign": _sign,
    "mod": _mod,
    "pmod": lambda a, b: _pmod(a, b),
    "floor": _floor,
    "ceil": _ceil,
    "ceiling": _ceil,
    "greatest": _fold_pair(jnp.maximum),
    "least": _fold_pair(jnp.minimum),
    "sqrt": _float_fn(jnp.sqrt, domain=lambda x: x >= 0),
    "cbrt": _float_fn(jnp.cbrt),
    "exp": _float_fn(jnp.exp),
    "ln": _float_fn(jnp.log, domain=lambda x: x > 0),
    "log": _float_fn(jnp.log, domain=lambda x: x > 0),
    "log2": _float_fn(jnp.log2, domain=lambda x: x > 0),
    "log10": _float_fn(jnp.log10, domain=lambda x: x > 0),
    "pow": _float_fn(jnp.power),
    "power": _float_fn(jnp.power),
    "sin": _float_fn(jnp.sin), "cos": _float_fn(jnp.cos),
    "tan": _float_fn(jnp.tan),
    "asin": _float_fn(jnp.arcsin, domain=lambda x: jnp.abs(x) <= 1),
    "acos": _float_fn(jnp.arccos, domain=lambda x: jnp.abs(x) <= 1),
    "atan": _float_fn(jnp.arctan),
    "atan2": _float_fn(jnp.arctan2),
    "degrees": _float_fn(jnp.degrees),
    "radians": _float_fn(jnp.radians),
}


def _pmod(a: Column, b: Column) -> Column:
    m = _mod(a, b)
    da, db, kind, scale = _numeric_pair(m, b)
    data = jnp.where((da != 0) & ((da < 0) != (db < 0)), da + db, da)
    if kind is TypeKind.FLOAT64:
        return Column(data, m.valid, dt.FLOAT64)
    if kind is TypeKind.DECIMAL:
        return Column(data, m.valid, dt.DECIMAL(scale))
    return Column(data, m.valid, m.dtype)


# ---------------------------------------------------------------------------
# string (dictionary LUT)
# ---------------------------------------------------------------------------

def _str_map(fn):
    """string -> string elementwise over dict values."""
    def make(child: Expr, *args) -> Expr:
        lits = [_lit_value(a) for a in args]
        return StringFn(child, lambda vs: np.array(
            [fn(v, *lits) for v in vs], dtype=object).astype(str))
    return make


@dataclasses.dataclass(eq=False)
class StringScalarFn(Expr):
    """string -> scalar (int/bool) via dict LUT."""
    child: Expr
    fn: Any
    out_dtype: Any

    def eval(self, table) -> Column:
        from starrocks_tpu.exprs.expr import _dict_lut
        c = self.child.eval(table)
        lut = _dict_lut(c.dict_id, lambda vs: np.array(
            [self.fn(v) for v in vs], self.out_dtype.np_dtype))
        return Column(lut[c.data], c.valid, self.out_dtype)


@dataclasses.dataclass(eq=False)
class Concat2(Expr):
    """concat of two dict-encoded strings: 2-D code LUT (sizes permitting)."""
    left: Expr
    right: Expr

    def eval(self, table) -> Column:
        a = self.left.eval(table)
        b = self.right.eval(table)
        va, vb = dt.dict_values(a.dict_id), dt.dict_values(b.dict_id)
        if len(va) * len(vb) > 1 << 22:
            raise NotImplementedError("concat dict cross product too large")
        prod = np.array([x + y for x in va for y in vb], dtype=object).astype(str)
        uniq, inv = np.unique(prod, return_inverse=True)
        new_id = dt.register_dict(uniq)
        lut = jnp.asarray(inv.astype(np.int32).reshape(len(va), len(vb)))
        data = lut[a.data, b.data]
        return Column(data, _combine_valid(a, b), dt.STRING, dict_id=new_id)


def _lit_value(e):
    if isinstance(e, Literal):
        v = e.value
        if e.dtype.is_decimal:
            return v / (10 ** e.dtype.scale)
        return v
    if isinstance(e, (int, str, float)):
        return e
    raise NotImplementedError("argument must be a constant")


def _build_concat(args: list[Expr]) -> Expr:
    out = args[0]
    for a in args[1:]:
        if isinstance(a, Literal) and isinstance(a.value, str):
            lit = a.value
            out = StringFn(out, lambda vs, lit=lit: np.array(
                [v + lit for v in vs], dtype=object).astype(str))
        elif isinstance(out, Literal) and isinstance(out.value, str):
            lit = out.value
            out = StringFn(a, lambda vs, lit=lit: np.array(
                [lit + v for v in vs], dtype=object).astype(str))
        else:
            out = Concat2(out, a)
    return out


_STRING_MAP = {
    "upper": _str_map(lambda v: v.upper()),
    "ucase": _str_map(lambda v: v.upper()),
    "lower": _str_map(lambda v: v.lower()),
    "lcase": _str_map(lambda v: v.lower()),
    "trim": _str_map(lambda v: v.strip()),
    "ltrim": _str_map(lambda v: v.lstrip()),
    "rtrim": _str_map(lambda v: v.rstrip()),
    "reverse": _str_map(lambda v: v[::-1]),
    "repeat": _str_map(lambda v, n: v * int(n)),
    "lpad": _str_map(lambda v, n, p=" ": v.rjust(int(n), p)[: int(n)]),
    "rpad": _str_map(lambda v, n, p=" ": v.ljust(int(n), p)[: int(n)]),
    "replace": _str_map(lambda v, a, b: v.replace(a, b)),
    "left": _str_map(lambda v, n: v[: int(n)]),
    "right": _str_map(lambda v, n: v[-int(n):] if int(n) else ""),
}

_STRING_SCALAR = {
    "length": (lambda v: len(v), dt.INT32),
    "char_length": (lambda v: len(v), dt.INT32),
    "character_length": (lambda v: len(v), dt.INT32),
    "ascii": (lambda v: ord(v[0]) if v else 0, dt.INT32),
}


# ---------------------------------------------------------------------------
# date
# ---------------------------------------------------------------------------

@dataclasses.dataclass(eq=False)
class DateFieldFn(Expr):
    child: Expr
    field: str

    def eval(self, table) -> Column:
        c = self.child.eval(table)
        y, m, d = civil_from_days(c.data.astype(jnp.int32))
        days = c.data.astype(jnp.int32)
        if self.field == "year":
            out = y
        elif self.field == "month":
            out = m
        elif self.field == "day":
            out = d
        elif self.field == "quarter":
            out = (m - 1) // 3 + 1
        elif self.field == "dayofweek":        # 1=Sunday (MySQL)
            out = (days + 4) % 7 + 1
        elif self.field == "weekday":          # 0=Monday (MySQL)
            out = (days + 3) % 7
        elif self.field == "dayofyear":
            jan1 = days_from_civil(y, jnp.ones_like(m), jnp.ones_like(d))
            out = days - jan1 + 1
        elif self.field == "weekofyear":       # ISO 8601 week number
            thu = days - (days + 3) % 7 + 3    # Thursday of this ISO week
            ty, _, _ = civil_from_days(thu)
            jan1 = days_from_civil(ty, jnp.ones_like(m), jnp.ones_like(d))
            out = (thu - jan1) // 7 + 1
        else:
            raise ValueError(self.field)
        return Column(out.astype(jnp.int32), c.valid, dt.INT32)


@dataclasses.dataclass(eq=False)
class DateAddDays(Expr):
    child: Expr
    n: Expr          # integer days (negative subtracts)

    def eval(self, table) -> Column:
        c = self.child.eval(table)
        nc = self.n.eval(table)
        data = (c.data.astype(jnp.int32) + nc.data.astype(jnp.int32))
        return Column(data, _combine_valid(c, nc), dt.DATE)


@dataclasses.dataclass(eq=False)
class AddMonths(Expr):
    child: Expr
    months: int

    def eval(self, table) -> Column:
        c = self.child.eval(table)
        y, m, d = civil_from_days(c.data.astype(jnp.int32))
        t = y * 12 + (m - 1) + self.months
        ny, nm = jnp.floor_divide(t, 12), t % 12 + 1
        # clamp day to target month length
        first_next = days_from_civil(
            ny + (nm == 12), jnp.where(nm == 12, 1, nm + 1), jnp.ones_like(d))
        first = days_from_civil(ny, nm, jnp.ones_like(d))
        maxd = first_next - first
        data = days_from_civil(ny, nm, jnp.minimum(d, maxd))
        return Column(data, c.valid, dt.DATE)


@dataclasses.dataclass(eq=False)
class DateDiff(Expr):
    left: Expr
    right: Expr

    def eval(self, table) -> Column:
        a = self.left.eval(table)
        b = self.right.eval(table)
        data = a.data.astype(jnp.int32) - b.data.astype(jnp.int32)
        return Column(data, _combine_valid(a, b), dt.INT32)


@dataclasses.dataclass(eq=False)
class DateTrunc(Expr):
    child: Expr
    unit: str

    def eval(self, table) -> Column:
        c = self.child.eval(table)
        days = c.data.astype(jnp.int32)
        y, m, d = civil_from_days(days)
        one = jnp.ones_like(d)
        if self.unit == "year":
            data = days_from_civil(y, one, one)
        elif self.unit == "quarter":
            qm = ((m - 1) // 3) * 3 + 1
            data = days_from_civil(y, qm, one)
        elif self.unit == "month":
            data = days_from_civil(y, m, one)
        elif self.unit == "week":              # ISO week start (Monday)
            data = days - (days + 3) % 7
        elif self.unit == "day":
            data = days
        else:
            raise ValueError(self.unit)
        return Column(data, c.valid, dt.DATE)


# ---------------------------------------------------------------------------
# registry: the SQL binder's dispatch table
# ---------------------------------------------------------------------------

def build(name: str, args: list[Expr], raw_args: Optional[list] = None) -> Expr:
    """Build the Expr for SQL function `name` over bound argument exprs."""
    if name in _NUMERIC:
        return _NumericCall(name, args)
    if name in _STRING_MAP:
        return _STRING_MAP[name](args[0], *args[1:])
    if name in _STRING_SCALAR:
        fn, od = _STRING_SCALAR[name]
        return StringScalarFn(args[0], fn, od)
    if name == "concat":
        return _build_concat(args)
    if name in ("starts_with", "ends_with"):
        pat = _lit_value(args[1])
        fn = (lambda v: v.startswith(pat)) if name == "starts_with" \
            else (lambda v: v.endswith(pat))
        return StringScalarFn(args[0], fn, dt.BOOL)
    if name == "instr" or name == "locate":
        # locate(substr, str) vs instr(str, substr)
        s, sub = (args[1], args[0]) if name == "locate" else (args[0], args[1])
        pat = _lit_value(sub)
        return StringScalarFn(s, lambda v: v.find(pat) + 1, dt.INT32)
    if name in ("year", "month", "day", "dayofmonth", "quarter",
                "dayofweek", "weekday", "dayofyear", "weekofyear", "week"):
        field = {"dayofmonth": "day", "week": "weekofyear"}.get(name, name)
        return DateFieldFn(args[0], field)
    if name in ("date_add", "adddate", "days_add"):
        return DateAddDays(args[0], args[1])
    if name in ("date_sub", "subdate", "days_sub"):
        return DateAddDays(args[0], _NumericCall("_neg", [args[1]]))
    if name == "datediff":
        return DateDiff(args[0], args[1])
    if name in ("months_add", "add_months"):
        return AddMonths(args[0], int(_lit_value(args[1])))
    if name == "months_sub":
        return AddMonths(args[0], -int(_lit_value(args[1])))
    if name == "date_trunc":
        return DateTrunc(args[1], str(_lit_value(args[0])))
    if name in ("round", "truncate"):
        d = int(_lit_value(args[1])) if len(args) > 1 else 0
        return _RoundCall(args[0], d, name == "truncate")
    if name == "if":
        return Case([(args[0], args[1])], args[2])
    if name == "nullif":
        return _NullIf(args[0], args[1])
    if name in ("ifnull", "nvl"):
        return Coalesce([args[0], args[1]])
    raise NotImplementedError(f"function {name}")


SQL_FUNCTIONS = (
    set(_NUMERIC) | set(_STRING_MAP) | set(_STRING_SCALAR) | {
        "concat", "starts_with", "ends_with", "instr", "locate",
        "year", "month", "day", "dayofmonth", "quarter", "dayofweek",
        "weekday", "dayofyear", "weekofyear", "week", "date_add", "adddate", "days_add",
        "date_sub", "subdate", "days_sub", "datediff", "months_add",
        "add_months", "months_sub", "date_trunc", "round", "truncate",
        "if", "nullif", "ifnull", "nvl",
    })


@dataclasses.dataclass(eq=False)
class Cast(Expr):
    """CAST(x AS type) — analog of be/src/exprs/cast_expr.cpp. String
    sources parse through the dictionary LUT; numeric -> string would need
    device values on the host and is unsupported (dict-encode at load)."""
    child: Expr
    target: str        # int | double | decimal | string | date | bool
    scale: int = 0

    def eval(self, table) -> Column:
        from starrocks_tpu.exprs.expr import _dict_lut
        c = self.child.eval(table)
        t = self.target
        if t == "double":
            if c.dtype.is_string:
                lut = _dict_lut(c.dict_id, lambda vs: np.array(
                    [_safe_float(v) for v in vs], np.float64))
                return Column(lut[c.data], c.valid, dt.FLOAT64)
            return Column(_to_float(c), c.valid, dt.FLOAT64)
        if t == "int":
            if c.dtype.is_string:
                lut = _dict_lut(c.dict_id, lambda vs: np.array(
                    [int(_safe_float(v)) for v in vs], np.int64))
                return Column(lut[c.data], c.valid, dt.INT64)
            if c.dtype.is_decimal:
                data = _trunc_div(c.data, jnp.int64(10 ** c.dtype.scale))
                return Column(data, c.valid, dt.INT64)
            return Column(c.data.astype(jnp.int64), c.valid, dt.INT64)
        if t == "decimal":
            s = self.scale
            if c.dtype.is_string:
                lut = _dict_lut(c.dict_id, lambda vs: np.array(
                    [int(round(_safe_float(v) * 10 ** s)) for v in vs], np.int64))
                return Column(lut[c.data], c.valid, dt.DECIMAL(s))
            if c.dtype.is_decimal:
                if s >= c.dtype.scale:
                    return Column(c.data * (10 ** (s - c.dtype.scale)),
                                  c.valid, dt.DECIMAL(s))
                return _round(c, s)
            if c.dtype.kind is TypeKind.FLOAT64:
                f = c.data * (10.0 ** s)
                data = (jnp.sign(f) * jnp.floor(jnp.abs(f) + 0.5)).astype(jnp.int64)
                return Column(data, c.valid, dt.DECIMAL(s))
            return Column(c.data.astype(jnp.int64) * (10 ** s), c.valid,
                          dt.DECIMAL(s))
        if t == "string":
            if c.dtype.is_string:
                return c
            raise NotImplementedError("cast non-string to string")
        if t == "date":
            if c.dtype.kind is TypeKind.DATE:
                return c
            if c.dtype.is_string:
                lut = _dict_lut(c.dict_id, lambda vs: np.array(
                    [np.datetime64(v, "D").astype(np.int32) for v in vs],
                    np.int32))
                return Column(lut[c.data], c.valid, dt.DATE)
            return Column(c.data.astype(jnp.int32), c.valid, dt.DATE)
        if t == "bool":
            return Column(_to_float(c) != 0.0, c.valid, dt.BOOL)
        raise ValueError(t)


def _safe_float(v: str) -> float:
    try:
        return float(v)
    except ValueError:
        return float("nan")


@dataclasses.dataclass(eq=False)
class _NumericCall(Expr):
    name: str
    children: list

    def eval(self, table) -> Column:
        cols = [c.eval(table) for c in self.children]
        if self.name == "_neg":
            c = cols[0]
            return Column(-c.data, c.valid, c.dtype)
        return _NUMERIC[self.name](*cols)


@dataclasses.dataclass(eq=False)
class _RoundCall(Expr):
    child: Expr
    digits: int
    trunc: bool

    def eval(self, table) -> Column:
        c = self.child.eval(table)
        return (_truncate if self.trunc else _round)(c, self.digits)


@dataclasses.dataclass(eq=False)
class _NullIf(Expr):
    left: Expr
    right: Expr

    def eval(self, table) -> Column:
        from starrocks_tpu.exprs.expr import Compare
        a = self.left.eval(table)
        eq = Compare("==", self.left, self.right).eval(table)
        eq_true = eq.data & (eq.validity() if eq.valid is not None else True)
        valid = jnp.where(eq_true, False, a.validity())
        return Column(a.data, valid, a.dtype, a.dict_id, a.vrange)
