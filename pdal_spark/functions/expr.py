"""PDAL expression-language compiler -> SQL (both dialects) / Column.

Reference grammar (filters/private/expr/): `&&`, `||`, `!`, `+`, `-`,
`*`, `/`, comparisons, parens; identifiers are dimension (column)
names; math functions (MathParser.cpp:182-241): floor ceil round abs
fabs sqrt sin cos tan asin acos atan sinh cosh tanh asinh acosh log
log2 log10 exp exp2; 0-ary consts nan() lowest() highest()
(MathParser.cpp function0); bool funcs isnan/ismax/ismin
(ConditionalParser.cpp:180-199).

Instead of interpreting per point (PDAL evaluates a node tree per
point — the Spark win is exactly that we don't), the compiler emits a
SQL expression string usable by BOTH Spark (`F.expr`, whole-stage
codegen) and DuckDB (oracle). This is the engine's declarative
mini-UDF surface, same role as filters.expression / filters.assign
conditions / filters.mongo.
"""

from __future__ import annotations

import re

from pdal_spark.sqlgen import Dialect, SPARK, fnum

DBL_MAX = 1.7976931348623157e308
DBL_LOWEST = -1.7976931348623157e308

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?"
    r"|\d+(?:[eE][-+]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op>&&|\|\||==|!=|>=|<=|[-+*/!()<>])"
    r")"
)

# name -> (spark_fn, duckdb_fn); None = unsupported in that dialect
_FUNCS1: dict[str, tuple[str, str | None]] = {
    "floor": ("floor", "floor"),
    "ceil": ("ceil", "ceil"),
    "round": ("round", "round"),
    "abs": ("abs", "abs"),
    "fabs": ("abs", "abs"),
    "sqrt": ("sqrt", "sqrt"),
    "sin": ("sin", "sin"),
    "cos": ("cos", "cos"),
    "tan": ("tan", "tan"),
    "asin": ("asin", "asin"),
    "acos": ("acos", "acos"),
    "atan": ("atan", "atan"),
    "sinh": ("sinh", None),
    "cosh": ("cosh", None),
    "tanh": ("tanh", None),
    "asinh": ("asinh", None),
    "acosh": ("acosh", None),
    "log": ("ln", "ln"),
    "log2": ("log2", "log2"),
    "log10": ("log10", "log10"),
    "exp": ("exp", "exp"),
    "exp2": (None, None),  # expanded to power(2, x)
}

_FUNCS0 = {"nan", "lowest", "highest"}
_BOOLFUNCS = {"isnan", "ismax", "ismin"}


class ExpressionError(ValueError):
    pass


class _Parser:
    def __init__(self, src: str, d: Dialect):
        self.d = d
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(src):
            m = _TOKEN_RE.match(src, pos)
            if not m or m.end() == pos:
                if src[pos:].strip():
                    raise ExpressionError(
                        f"bad token at {pos}: {src[pos:pos + 10]!r}"
                    )
                break
            pos = m.end()
            for kind in ("num", "ident", "op"):
                if m.group(kind) is not None:
                    self.toks.append((kind, m.group(kind)))
                    break
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, val: str | None = None) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ExpressionError("unexpected end of expression")
        if val is not None and t[1] != val:
            raise ExpressionError(f"expected {val!r}, got {t[1]!r}")
        self.i += 1
        return t

    # grammar: or <- and (|| and)* ; and <- cmp (&& cmp)* ;
    # cmp <- add ((==|!=|<|<=|>|>=) add)? ; add <- mul ((+|-) mul)* ;
    # mul <- unary ((*|/) unary)* ; unary <- (-|!) unary | primary
    def parse(self) -> str:
        out = self.p_or()
        if self.peek() is not None:
            raise ExpressionError(f"trailing tokens: {self.toks[self.i:]}")
        return out

    def p_or(self) -> str:
        left = self.p_and()
        while self.peek() == ("op", "||"):
            self.take()
            left = f"({left} OR {self.p_and()})"
        return left

    def p_and(self) -> str:
        left = self.p_cmp()
        while self.peek() == ("op", "&&"):
            self.take()
            left = f"({left} AND {self.p_cmp()})"
        return left

    def p_cmp(self) -> str:
        left = self.p_add()
        t = self.peek()
        if t and t[0] == "op" and t[1] in ("==", "!=", "<", "<=", ">", ">="):
            op = self.take()[1]
            sql_op = {"==": "=", "!=": "<>"}.get(op, op)
            return f"({left} {sql_op} {self.p_add()})"
        return left

    def p_add(self) -> str:
        left = self.p_mul()
        while True:
            t = self.peek()
            if t and t[0] == "op" and t[1] in "+-":
                op = self.take()[1]
                left = f"({left} {op} {self.p_mul()})"
            else:
                return left

    def p_mul(self) -> str:
        left = self.p_unary()
        while True:
            t = self.peek()
            if t and t[0] == "op" and t[1] in "*/":
                op = self.take()[1]
                left = f"({left} {op} {self.p_unary()})"
            else:
                return left

    def p_unary(self) -> str:
        t = self.peek()
        if t == ("op", "-"):
            self.take()
            return f"(- {self.p_unary()})"
        if t == ("op", "!"):
            self.take()
            return f"(NOT {self.p_unary()})"
        return self.p_primary()

    def p_primary(self) -> str:
        t = self.take()
        kind, val = t
        if kind == "num":
            return fnum(float(val)) if ("." in val or "e" in val.lower()) \
                else val
        if kind == "op" and val == "(":
            inner = self.p_or()
            self.take(")")
            return inner
        if kind == "ident":
            nxt = self.peek()
            if nxt == ("op", "("):
                return self.p_call(val)
            return f"`{val}`" if self.d.name == "spark" else f'"{val}"'
        raise ExpressionError(f"unexpected token {val!r}")

    def p_call(self, name: str) -> str:
        self.take("(")
        if name in _FUNCS0:
            self.take(")")
            if name == "nan":
                return "(cast('nan' as double))"
            return fnum(DBL_LOWEST if name == "lowest" else DBL_MAX)
        arg = self.p_or()
        self.take(")")
        if name in _BOOLFUNCS:
            if name == "isnan":
                return f"isnan({arg})"
            target = fnum(DBL_MAX if name == "ismax" else DBL_LOWEST)
            return f"({arg} = {target})"
        if name == "exp2":
            return f"power({fnum(2.0)}, {arg})"
        if name not in _FUNCS1:
            raise ExpressionError(f"unknown function {name!r}")
        fn = _FUNCS1[name][0 if self.d.name == "spark" else 1]
        if fn is None:
            # DuckDB ships no hyperbolics: expand to exp/ln closed
            # forms (agrees with libm tanh/... to ~1 ulp relative;
            # gates comparing these columns round accordingly)
            e, ne = f"exp({arg})", f"exp(-({arg}))"
            forms = {
                "sinh": f"(({e} - {ne}) / {fnum(2.0)})",
                "cosh": f"(({e} + {ne}) / {fnum(2.0)})",
                "tanh": f"(({e} - {ne}) / ({e} + {ne}))",
                "asinh": f"ln(({arg}) + sqrt(({arg}) * ({arg})"
                         f" + {fnum(1.0)}))",
                "acosh": f"ln(({arg}) + sqrt(({arg}) * ({arg})"
                         f" - {fnum(1.0)}))",
            }
            if name in forms:
                return forms[name]
            raise ExpressionError(
                f"function {name!r} unsupported in dialect {self.d.name}"
            )
        return f"{fn}({arg})"


def compile_expression(src: str, dialect: Dialect = SPARK) -> str:
    """PDAL expression source -> SQL text for the given dialect."""
    return _Parser(src, dialect).parse()
