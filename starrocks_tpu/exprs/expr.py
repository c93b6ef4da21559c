"""Vectorized expression engine.

Analog of StarRocks' expression trees (be/src/exprs/expr.h:72,
Expr::evaluate_checked expr.h:216): whole-column in, whole-column out.

TPU-first design choices:
- Every Expr is a pure function Table -> Column; XLA fuses the whole tree
  into the consuming operator (this *is* the reference's LLVM JIT for exprs,
  be/src/exprs/jit/jit_engine.h:68 — for free).
- String predicates (LIKE / substring / equality) are evaluated host-side
  over the *dictionary* at trace time, producing a lookup table; the device
  does a single int gather. This generalizes StarRocks' dictionary-mapped
  exprs (be/src/exprs/dictmapping_expr.cpp).
- NULL semantics: validity masks propagate (SQL ternary logic for AND/OR).
- Decimal arithmetic is exact int64 fixed-point with static scale inference
  (StarRocks decimalv3, be/src/exprs/arithmetic_expr.cpp).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from starrocks_tpu.column import dtypes as dt
from starrocks_tpu.column.column import Column, Table
from starrocks_tpu.column.dtypes import DataType, TypeKind


class Expr:
    """Base expression node."""

    def eval(self, table: Table) -> Column:
        raise NotImplementedError

    # convenience builders ------------------------------------------------
    def __add__(self, o): return Arith("+", self, lift(o))
    def __radd__(self, o): return Arith("+", lift(o), self)
    def __sub__(self, o): return Arith("-", self, lift(o))
    def __rsub__(self, o): return Arith("-", lift(o), self)
    def __mul__(self, o): return Arith("*", self, lift(o))
    def __rmul__(self, o): return Arith("*", lift(o), self)
    def __truediv__(self, o): return Arith("/", self, lift(o))
    def __eq__(self, o): return Compare("==", self, lift(o))  # type: ignore[override]
    def __ne__(self, o): return Compare("!=", self, lift(o))  # type: ignore[override]
    def __lt__(self, o): return Compare("<", self, lift(o))
    def __le__(self, o): return Compare("<=", self, lift(o))
    def __gt__(self, o): return Compare(">", self, lift(o))
    def __ge__(self, o): return Compare(">=", self, lift(o))
    def __and__(self, o): return And(self, lift(o))
    def __or__(self, o): return Or(self, lift(o))
    def __invert__(self): return Not(self)
    def __hash__(self):
        return id(self)

    def between(self, lo, hi):
        return And(Compare(">=", self, lift(lo)), Compare("<=", self, lift(hi)))

    def isin(self, values: Sequence[Any]):
        return In(self, list(values))

    def like(self, pattern: str):
        return Like(self, pattern)


def lift(v) -> Expr:
    if isinstance(v, Expr):
        return v
    return Literal.infer(v)


def col(name: str) -> Expr:
    return ColRef(name)


@dataclasses.dataclass(eq=False, repr=False)
class ColRef(Expr):
    name: str

    def eval(self, table: Table) -> Column:
        return table[self.name]

    def __repr__(self):
        return self.name


@dataclasses.dataclass(eq=False)
class Literal(Expr):
    value: Any           # python scalar in storage units (decimal: scaled int)
    dtype: DataType

    @classmethod
    def infer(cls, v) -> "Literal":
        if isinstance(v, bool):
            return cls(v, dt.BOOL)
        if isinstance(v, (int, np.integer)):
            return cls(int(v), dt.INT64)
        if isinstance(v, float):
            return cls(v, dt.FLOAT64)
        if isinstance(v, str):
            # bare string literal; resolved against the other side's dict
            return cls(v, dt.STRING)
        if isinstance(v, np.datetime64):
            days = (v.astype("datetime64[D]") - np.datetime64("1970-01-01")).astype(int)
            return cls(int(days), dt.DATE)
        raise TypeError(f"cannot lift literal {v!r}")

    def eval(self, table: Table) -> Column:
        n = table.nrows
        if self.dtype.is_string:
            # materialize as a constant dict column (single-entry dictionary;
            # the global-dict analog keeps all string compute on int codes)
            codes, did = dt.dict_encode(np.array([self.value], dtype=object))
            data = jnp.zeros((n,), jnp.int32)
            return Column(data=data, valid=None, dtype=self.dtype,
                          dict_id=did, vrange=(0, 0))
        data = jnp.full((n,), self.value, self.dtype.jnp_dtype)
        return Column(data=data, valid=None, dtype=self.dtype)


def decimal_lit(value: float, scale: int) -> Literal:
    return Literal(int(round(value * 10**scale)), dt.DECIMAL(scale))


def date_lit(s: str) -> Literal:
    days = (np.datetime64(s) - np.datetime64("1970-01-01")).astype(int)
    return Literal(int(days), dt.DATE)


# ---------------------------------------------------------------------------
# type inference helpers
# ---------------------------------------------------------------------------

def _combine_valid(*cols: Column) -> Optional[jnp.ndarray]:
    valids = [c.valid for c in cols if c.valid is not None]
    if not valids:
        return None
    out = valids[0]
    for v in valids[1:]:
        out = out & v
    return out


def _as_scale(c: Column, scale: int) -> jnp.ndarray:
    """Rescale a numeric column's data to decimal `scale` (int64 math)."""
    if c.dtype.is_decimal:
        diff = scale - c.dtype.scale
    elif c.dtype.is_integer or c.dtype.kind is TypeKind.DATE:
        diff = scale
    else:
        raise TypeError(f"cannot scale {c.dtype}")
    data = c.data.astype(jnp.int64)
    if diff > 0:
        data = data * (10 ** diff)
    elif diff < 0:
        raise ValueError("downscale would lose precision")
    return data


def _numeric_pair(a: Column, b: Column):
    """Bring two numeric columns to a common exact representation.

    Returns (a_data, b_data, result_kind, scale).
    """
    ka, kb = a.dtype, b.dtype
    if ka.kind is TypeKind.FLOAT64 or kb.kind is TypeKind.FLOAT64:
        fa = _to_float(a)
        fb = _to_float(b)
        return fa, fb, TypeKind.FLOAT64, 0
    if ka.is_decimal or kb.is_decimal:
        s = max(ka.scale, kb.scale)
        return _as_scale(a, s), _as_scale(b, s), TypeKind.DECIMAL, s
    # ints / dates
    wide = jnp.int64 if (ka.kind is TypeKind.INT64 or kb.kind is TypeKind.INT64) else jnp.int32
    return a.data.astype(wide), b.data.astype(wide), ka.kind, 0


def _to_float(c: Column) -> jnp.ndarray:
    if c.dtype.is_decimal:
        return c.data.astype(jnp.float64) / (10 ** c.dtype.scale)
    return c.data.astype(jnp.float64)


@dataclasses.dataclass(eq=False)
class Arith(Expr):
    op: str
    left: Expr
    right: Expr

    def eval(self, table: Table) -> Column:
        a = self.left.eval(table)
        b = self.right.eval(table)
        valid = _combine_valid(a, b)
        if self.op == "/":
            num = _to_float(a)
            den = _to_float(b)
            data = num / jnp.where(den == 0, 1.0, den)
            data = jnp.where(den == 0, jnp.nan, data)
            return Column(data, valid, dt.FLOAT64)
        if self.op == "*":
            if a.dtype.is_decimal or b.dtype.is_decimal:
                sa = a.dtype.scale if a.dtype.is_decimal else 0
                sb = b.dtype.scale if b.dtype.is_decimal else 0
                data = a.data.astype(jnp.int64) * b.data.astype(jnp.int64)
                return Column(data, valid, dt.DECIMAL(sa + sb))
            da, db, kind, _ = _numeric_pair(a, b)
            return Column(da * db, valid, DataType(kind))
        # + / -
        da, db, kind, s = _numeric_pair(a, b)
        data = da + db if self.op == "+" else da - db
        if kind is TypeKind.DECIMAL:
            return Column(data, valid, dt.DECIMAL(s))
        if a.dtype.kind is TypeKind.DATE and not b.dtype.is_decimal:
            # date +/- int days -> date ; date - date -> int
            if b.dtype.kind is TypeKind.DATE:
                return Column(data.astype(jnp.int32), valid, dt.INT32)
            return Column(data.astype(jnp.int32), valid, dt.DATE)
        return Column(data, valid, DataType(kind))


@dataclasses.dataclass(eq=False)
class Compare(Expr):
    op: str
    left: Expr
    right: Expr

    _OPS = {
        "==": jnp.equal, "!=": jnp.not_equal,
        "<": jnp.less, "<=": jnp.less_equal,
        ">": jnp.greater, ">=": jnp.greater_equal,
    }

    def eval(self, table: Table) -> Column:
        left, right = self.left, self.right
        # string literal compare: resolve against the dict
        lv = _string_literal(right)
        if lv is not None:
            c = left.eval(table)
            return _dict_compare(c, self.op, lv)
        lv = _string_literal(left)
        if lv is not None:
            c = right.eval(table)
            return _dict_compare(c, _flip(self.op), lv)
        a = left.eval(table)
        b = right.eval(table)
        if a.dtype.is_string and b.dtype.is_string:
            if a.dict_id != b.dict_id:
                # remap both onto their union dictionary's rank space
                # (dictionaries are trace-time host metadata; sorted dicts
                # make rank order == string order)
                va = dt.dict_values(a.dict_id)
                vb = dt.dict_values(b.dict_id)
                union = np.unique(np.concatenate([va, vb]))
                la = jnp.asarray(np.searchsorted(union, va).astype(np.int32))
                lb = jnp.asarray(np.searchsorted(union, vb).astype(np.int32))
                data = self._OPS[self.op](la[a.data], lb[b.data])
            else:
                data = self._OPS[self.op](a.data, b.data)
        else:
            da, db, _, _ = _numeric_pair(a, b)
            data = self._OPS[self.op](da, db)
        return Column(data, _combine_valid(a, b), dt.BOOL)


def _flip(op: str) -> str:
    return {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "==": "==", "!=": "!="}[op]


def _string_literal(e: Expr) -> Optional[str]:
    if isinstance(e, Literal) and e.dtype.is_string:
        return e.value
    return None


def _dict_compare(c: Column, op: str, literal: str) -> Column:
    """Compare a dict-encoded column against a string literal.

    The dictionary is sorted, so ordering compares work on codes via the
    insertion point of the literal.
    """
    if not c.dtype.is_string:
        raise TypeError(f"string compare against {c.dtype}")
    values = dt.dict_values(c.dict_id)
    if op in ("==", "!="):
        code = dt.dict_code_of(c.dict_id, literal)
        if code is None:
            data = jnp.zeros(c.data.shape, jnp.bool_)
            if op == "!=":
                data = ~data
        else:
            data = c.data == code
            if op == "!=":
                data = ~data
        return Column(data, c.valid, dt.BOOL)
    # range compare: codes are order-preserving
    ins = int(np.searchsorted(values, literal, side="left" if op in ("<", ">=") else "right"))
    if op in ("<", "<="):
        data = c.data < ins
    else:
        data = c.data >= ins
    return Column(data, c.valid, dt.BOOL)


@dataclasses.dataclass(eq=False)
class And(Expr):
    left: Expr
    right: Expr

    def eval(self, table: Table) -> Column:
        a = self.left.eval(table)
        b = self.right.eval(table)
        data = a.data & b.data
        # 3VL: NULL AND False = False (valid), NULL AND True = NULL
        if a.valid is None and b.valid is None:
            valid = None
        else:
            av, bv = a.validity(), b.validity()
            valid = (av & bv) | (av & ~a.data) | (bv & ~b.data)
            data = data & av & bv
        return Column(data, valid, dt.BOOL)


@dataclasses.dataclass(eq=False)
class Or(Expr):
    left: Expr
    right: Expr

    def eval(self, table: Table) -> Column:
        a = self.left.eval(table)
        b = self.right.eval(table)
        if a.valid is None and b.valid is None:
            return Column(a.data | b.data, None, dt.BOOL)
        av, bv = a.validity(), b.validity()
        ta = a.data & av
        tb = b.data & bv
        data = ta | tb
        valid = (av & bv) | ta | tb
        return Column(data, valid, dt.BOOL)


@dataclasses.dataclass(eq=False)
class Not(Expr):
    child: Expr

    def eval(self, table: Table) -> Column:
        c = self.child.eval(table)
        return Column(~c.data, c.valid, dt.BOOL)


@dataclasses.dataclass(eq=False)
class IsNull(Expr):
    child: Expr
    negate: bool = False

    def eval(self, table: Table) -> Column:
        c = self.child.eval(table)
        isnull = jnp.zeros(c.data.shape, jnp.bool_) if c.valid is None else ~c.valid
        return Column(~isnull if self.negate else isnull, None, dt.BOOL)


@dataclasses.dataclass(eq=False)
class In(Expr):
    child: Expr
    values: list

    def eval(self, table: Table) -> Column:
        c = self.child.eval(table)
        if c.dtype.is_string:
            lut = _dict_lut(c.dict_id, lambda vs: np.isin(vs, np.asarray(self.values)))
            return Column(lut[c.data], c.valid, dt.BOOL)
        data = jnp.zeros(c.data.shape, jnp.bool_)
        for v in self.values:
            vv = v.value if isinstance(v, Literal) else v
            data = data | (c.data == vv)
        return Column(data, c.valid, dt.BOOL)


def _dict_lut(dict_id: int, fn) -> jnp.ndarray:
    """Host-compute fn over dictionary values -> device LUT (trace-time)."""
    values = dt.dict_values(dict_id)
    return jnp.asarray(np.asarray(fn(values)))


def like_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


@dataclasses.dataclass(eq=False)
class Like(Expr):
    child: Expr
    pattern: str
    negate: bool = False

    def eval(self, table: Table) -> Column:
        c = self.child.eval(table)
        rx = re.compile(like_to_regex(self.pattern))
        lut = _dict_lut(
            c.dict_id,
            lambda vs: np.array([rx.match(v) is not None for v in vs], bool),
        )
        data = lut[c.data]
        return Column(~data if self.negate else data, c.valid, dt.BOOL)


@dataclasses.dataclass(eq=False)
class StringFn(Expr):
    """Apply an arbitrary host string function over the dictionary.

    Produces a new dict-encoded STRING column (e.g. substring) — the device
    work is a single int gather through a code-remap LUT.
    """
    child: Expr
    fn: Any          # np.ndarray[str] -> np.ndarray[str]

    def eval(self, table: Table) -> Column:
        c = self.child.eval(table)
        values = dt.dict_values(c.dict_id)
        transformed = np.asarray(self.fn(values))
        new_values, inverse = np.unique(transformed, return_inverse=True)
        new_id = dt.register_dict(new_values)
        remap = jnp.asarray(inverse.astype(np.int32))
        return Column(remap[c.data], c.valid, dt.STRING, dict_id=new_id)


def substring(e: Expr, start: int, length: int) -> Expr:
    """SQL substring (1-based)."""
    return StringFn(e, lambda vs: np.array([v[start - 1:start - 1 + length] for v in vs]))


@dataclasses.dataclass(eq=False)
class ExtractYear(Expr):
    child: Expr

    def eval(self, table: Table) -> Column:
        c = self.child.eval(table)
        y, _, _ = civil_from_days(c.data.astype(jnp.int32))
        return Column(y, c.valid, dt.INT32)


def civil_from_days(days):
    """days since 1970-01-01 -> (year, month, day). Howard Hinnant's
    branchless civil-from-days algorithm; pure int ops, vectorizes on VPU."""
    z = days.astype(jnp.int32) + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = jnp.floor_divide(doe - doe // 1460 + doe // 36524 - doe // 146096, 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    year = y + (m <= 2)
    return year.astype(jnp.int32), m.astype(jnp.int32), d.astype(jnp.int32)


class NullValue(Expr):
    """Untyped NULL literal (CASE ... ELSE NULL / THEN NULL). Only CASE can
    evaluate it — the result type comes from the sibling branches."""

    def eval(self, table: Table) -> Column:
        raise TypeError("untyped NULL literal outside CASE")


@dataclasses.dataclass(eq=False)
class Case(Expr):
    """CASE WHEN cond THEN val ... ELSE default END.

    Branch values (or the default) may be NullValue — those rows are NULL of
    the common branch type."""
    branches: list   # [(cond_expr, value_expr), ...]
    default: Expr

    def eval(self, table: Table) -> Column:
        def ev(e):
            return None if isinstance(e, NullValue) else e.eval(table)

        dflt = ev(self.default)
        evaled = [(c.eval(table), ev(v)) for c, v in self.branches]
        # common type: decimals rescale to max scale; float wins over int;
        # otherwise the first typed value's type
        vals = [v for _, v in evaled if v is not None]
        if dflt is not None:
            vals.append(dflt)
        if not vals:
            raise TypeError("CASE with all-NULL branches")
        out_dtype = vals[0].dtype
        dict_id = vals[0].dict_id
        # float anywhere wins (q11's `then f/f else 0.0`); otherwise the
        # widest decimal scale; otherwise the first value's type
        any_float = any(not v.dtype.is_decimal
                        and jnp.issubdtype(v.data.dtype, jnp.floating)
                        for v in vals)
        if any_float:
            out_dtype = dt.FLOAT64
        else:
            for v in vals:
                if v.dtype.is_decimal and (not out_dtype.is_decimal
                                           or v.dtype.scale > out_dtype.scale):
                    out_dtype = v.dtype
        for v in vals:
            if v.dtype.is_string and v.dict_id != dict_id:
                raise NotImplementedError(
                    "CASE over string columns with different dictionaries")

        def conv(c: Column):
            if out_dtype.is_decimal:
                return _as_scale(c, out_dtype.scale)
            if out_dtype.kind is TypeKind.FLOAT64:
                return _to_float(c)
            return c.data.astype(out_dtype.jnp_dtype)

        n = table.nrows
        if dflt is None:
            data = jnp.zeros((n,), jnp.dtype(out_dtype.jnp_dtype))
            valid = jnp.zeros((n,), jnp.bool_)
        else:
            data = conv(dflt)
            valid = dflt.valid
        for cond, val in reversed(evaled):
            cmask = cond.data & cond.validity() if cond.valid is not None else cond.data
            if val is None:
                data = jnp.where(cmask, jnp.zeros((), data.dtype), data)
                valid = jnp.where(
                    cmask, False,
                    jnp.ones_like(cmask) if valid is None else valid)
                continue
            data = jnp.where(cmask, conv(val), data)
            if val.valid is not None or valid is not None:
                vv = val.validity()
                ov = jnp.ones_like(cmask) if valid is None else valid
                valid = jnp.where(cmask, vv, ov)
        return Column(data, valid, out_dtype,
                      dict_id if out_dtype.is_string else 0)


@dataclasses.dataclass(eq=False)
class NullLike(Expr):
    """An all-NULL column with the dtype/dictionary of an existing column —
    the grouping-sets key mask (RepeatNode nulls grouped-out key slots,
    be/src/exec/repeat_node.cpp)."""
    name: str

    def eval(self, table: Table) -> Column:
        c = table[self.name]
        return Column(jnp.zeros_like(c.data),
                      jnp.zeros(c.data.shape, jnp.bool_),
                      c.dtype, c.dict_id)


@dataclasses.dataclass(eq=False)
class Coalesce(Expr):
    exprs: list

    def eval(self, table: Table) -> Column:
        cols = [e.eval(table) for e in self.exprs]
        if cols[0].dtype.is_string:
            # remap all branches onto a union dictionary (host metadata)
            union = np.unique(np.concatenate(
                [dt.dict_values(c.dict_id) for c in cols]))
            did = dt.register_dict(union)
            cols = [Column(jnp.asarray(np.searchsorted(
                        union, dt.dict_values(c.dict_id)).astype(np.int32)
                        )[c.data], c.valid, c.dtype, did)
                    for c in cols]
        # numeric branches must agree on representation: coalesce(dec, 0)
        # would otherwise reinterpret scaled ints as plain ints (q77/q80)
        out_dtype = cols[0].dtype
        if not out_dtype.is_string:
            if any(c.dtype.kind is TypeKind.FLOAT64 for c in cols):
                cols = [Column(_to_float(c), c.valid, dt.FLOAT64)
                        for c in cols]
                out_dtype = dt.FLOAT64
            elif any(c.dtype.is_decimal for c in cols):
                s = max(c.dtype.scale for c in cols if c.dtype.is_decimal)
                cols = [Column(_as_scale(c, s), c.valid, dt.DECIMAL(s))
                        for c in cols]
                out_dtype = dt.DECIMAL(s)
        out = cols[-1]
        data, valid = out.data, out.validity()
        for c in reversed(cols[:-1]):
            cv = c.validity()
            data = jnp.where(cv, c.data.astype(data.dtype), data)
            valid = cv | valid
        return Column(data, None if cols[0].valid is None else valid,
                      out_dtype, cols[0].dict_id)
