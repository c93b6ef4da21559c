"""SQL lexer.

Analog of the token layer under StarRocks' ANTLR parser
(fe/fe-core/.../sql/parser/StarRocks.g4) — hand-rolled since the engine only
needs the analytic SELECT subset.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Token:
    kind: str     # IDENT | NUMBER | STRING | SYMBOL | KEYWORD | EOF
    value: str
    pos: int


KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "as", "and", "or", "not", "in", "exists", "between", "like", "is",
    "null", "case", "when", "then", "else", "end", "join", "inner", "left",
    "right", "full", "outer", "on", "asc", "desc", "distinct", "date",
    "interval", "year", "month", "day", "extract", "substring", "count",
    "sum", "avg", "min", "max", "all", "any", "union", "cast", "coalesce",
    "true", "false", "view", "create", "drop", "table", "intersect", "except",
    "with", "over", "partition", "rows", "range", "unbounded", "preceding",
    "following", "current", "row", "rollup", "cube", "grouping",
}

SYMBOLS = ["<>", "<=", ">=", "!=", "||", "(", ")", ",", ".", ";", "+", "-",
           "*", "/", "%", "<", ">", "="]


def tokenize(text: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "-" and text[i:i + 2] == "--":
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "'":
            j = i + 1
            buf = []
            while j < n:
                if text[j] == "'" and text[j:j + 2] == "''":
                    buf.append("'")
                    j += 2
                elif text[j] == "'":
                    break
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise SyntaxError(f"unterminated string at {i}")
            toks.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            seen_dot = False
            while j < n and (text[j].isdigit() or (text[j] == "." and not seen_dot)):
                if text[j] == ".":
                    # don't swallow "1." followed by ident (qualified names
                    # never start with a digit, so this is a decimal point)
                    seen_dot = True
                j += 1
            toks.append(Token("NUMBER", text[i:j], i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            word = text[i:j]
            kind = "KEYWORD" if word.lower() in KEYWORDS else "IDENT"
            toks.append(Token(kind, word.lower() if kind == "KEYWORD" else word, i))
            i = j
            continue
        for sym in SYMBOLS:
            if text.startswith(sym, i):
                toks.append(Token("SYMBOL", sym, i))
                i += len(sym)
                break
        else:
            raise SyntaxError(f"unexpected character {c!r} at {i}")
    toks.append(Token("EOF", "", n))
    return toks
