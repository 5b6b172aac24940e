"""AST → Spark Column translation with light static typing.

The reference interprets expressions per row with JEXL
(``wrangler-core/.../expression/EL.java``); we compile the identical
surface into native Column expressions so Catalyst sees through them
(pushdown/pruning/codegen). Missing identifiers become NULL literals —
parity with ``EL.java:94-102`` which null-fills unbound variables.

Typing: a coarse static kind ('num'/'str'/'bool'/...) rides along with
each translated Column so `+` can mean numeric addition or string concat
the way Java/JEXL overloading does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wrangler_spark.errors import ExpressionError
from wrangler_spark.expression.parser import parse_expression


@dataclass
class TC:
    """Typed column: a Spark Column plus a coarse static kind.

    ``lit`` carries the Python value when the expression is a literal, so
    functions needing compile-time constants (pad widths, format strings,
    JSON paths) can read it."""

    col: Column
    kind: str = "unknown"  # num | str | bool | null | ts | date | array | struct | map | bin | unknown
    lit: object = None


def kind_of(dt: T.DataType) -> str:
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)):
        return "num"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.BinaryType):
        return "bin"
    return "unknown"


def _is_integral(dt: T.DataType) -> bool:
    return isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))


class Translator:
    def __init__(self, df: DataFrame, variables: dict[str, TC] | None = None):
        self.df = df
        self._schema = {f.name.lower(): f for f in df.schema.fields}
        self.variables = variables or {}
        self.locals: dict[str, TC] = {}  # script-block assignments, shadow columns
        self._integral: set[str] = {
            f.name.lower() for f in df.schema.fields if _is_integral(f.dataType)
        }

    # --- identifier resolution -----------------------------------------

    def var(self, name: str) -> TC:
        loc = self.locals.get(name.lower())
        if loc is not None:
            return loc
        f = self._schema.get(name.lower())
        if f is not None:
            return TC(F.col(f.name), kind_of(f.dataType))
        v = self.variables.get(name)
        if v is not None:
            return v
        # JEXL parity: unbound variable -> null
        return TC(F.lit(None), "null")

    def is_integral_expr(self, node) -> bool:
        """Best-effort: does this AST node statically evaluate to an integer?"""
        tag = node[0]
        if tag == "num":
            return isinstance(node[1], int)
        if tag == "var":
            return node[1].lower() in self._integral
        if tag == "un" and node[1] == "-":
            return self.is_integral_expr(node[2])
        if tag == "bin" and node[1] in ("+", "-", "*", "/", "%"):
            return self.is_integral_expr(node[2]) and self.is_integral_expr(node[3])
        return False

    # --- translation ----------------------------------------------------

    def translate(self, node) -> TC:
        tag = node[0]
        if tag == "num":
            return TC(F.lit(node[1]), "num", node[1])
        if tag == "str":
            return TC(F.lit(node[1]), "str", node[1])
        if tag == "bool":
            return TC(F.lit(node[1]), "bool", node[1])
        if tag == "null":
            return TC(F.lit(None), "null")
        if tag == "var":
            return self.var(node[1])
        if tag == "un":
            x = self.translate(node[2])
            if node[1] == "-":
                return TC(-x.col, "num")
            return TC(~x.col.cast("boolean"), "bool")
        if tag == "bin":
            return self.binop(node[1], node[2], node[3])
        if tag == "ternary" or tag == "if":
            c = self.translate(node[1])
            a = self.translate(node[2])
            b = self.translate(node[3])
            kind = a.kind if a.kind != "null" else b.kind
            return TC(F.when(c.col, a.col).otherwise(b.col), kind)
        if tag == "let":
            # script-local assignments shadow columns/variables for the
            # rest of the script (JEXL context overwrite semantics)
            saved = dict(self.locals)
            try:
                for name, expr in node[1]:
                    self.locals[name.lower()] = self.translate(expr)
                return self.translate(node[2])
            finally:
                self.locals = saved
        if tag == "elvis":
            a = self.translate(node[1])
            b = self.translate(node[2])
            return TC(F.coalesce(a.col, b.col), a.kind if a.kind != "null" else b.kind)
        if tag == "field":
            obj = self.translate(node[1])
            return TC(obj.col.getField(node[2]), "unknown")
        if tag == "index":
            obj = self.translate(node[1])
            idx = node[2]
            if idx[0] == "num":
                return TC(obj.col.getItem(idx[1]), "unknown")
            i = self.translate(idx)
            return TC(F.element_at(obj.col, i.col.cast("int") + F.lit(1)), "unknown")
        if tag == "array":
            items = [self.translate(x) for x in node[1]]
            return TC(F.array(*[x.col for x in items]), "array")
        if tag == "call":
            from wrangler_spark.expression.functions import dispatch

            return dispatch(self, node[1], node[2], [self.translate(a) for a in node[3]], node[3])
        raise ExpressionError(f"unhandled AST node {node!r}")

    @staticmethod
    def _num_coerce(l: TC, r: TC) -> tuple[Column, Column]:
        """JEXL parity for mixed string/number arithmetic & comparison:
        the string side coerces to a number ("20.0" > 40 → 20.0 > 40).
        Legacy Spark promoted such mixes to double leniently; ANSI instead
        casts string → the numeric type strictly and CAST_INVALID_INPUT
        explodes on e.g. '20.0' vs BIGINT — so coerce explicitly with
        try_cast (malformed → null → 3VL, same as the legacy answer)."""
        lc, rc = l.col, r.col
        if l.kind == "str" and r.kind == "num":
            lc = lc.try_cast("double")
        elif r.kind == "str" and l.kind == "num":
            rc = rc.try_cast("double")
        return lc, rc

    def binop(self, op: str, ln, rn) -> TC:
        l = self.translate(ln)
        r = self.translate(rn)
        if op == "+":
            if l.kind == "str" or r.kind == "str":
                return TC(F.concat(l.col.cast("string"), r.col.cast("string")), "str")
            return TC(l.col + r.col, "num")
        if op in ("-", "*", "/", "%"):
            lc, rc = self._num_coerce(l, r)
            if l.kind == "str" and r.kind != "num":
                lc = lc.try_cast("double")
            if r.kind == "str" and l.kind != "num":
                rc = rc.try_cast("double")
            if op == "-":
                return TC(lc - rc, "num")
            if op == "*":
                return TC(lc * rc, "num")
            if op == "/":
                # JEXL/Java: int / int is integral division (truncating toward 0)
                if self.is_integral_expr(ln) and self.is_integral_expr(rn):
                    return TC((lc / rc).cast("long"), "num")
                return TC(lc / rc, "num")
            return TC(lc % rc, "num")
        if op in ("==", "!=", "<", "<=", ">", ">="):
            lc, rc = self._num_coerce(l, r)
            c = {
                "==": lc == rc, "!=": lc != rc,
                "<": lc < rc, "<=": lc <= rc, ">": lc > rc, ">=": lc >= rc,
            }[op]
            return TC(c, "bool")
        if op in ("=~", "!~"):
            # JEXL on strings: String.matches — full-anchored regex
            if rn[0] == "str":
                c = l.col.rlike(f"^(?:{rn[1]})$")
            else:  # dynamic pattern: anchor at runtime
                c = F.regexp_like(l.col, F.concat(F.lit("^(?:"), r.col, F.lit(")$")))
            return TC(~c if op == "!~" else c, "bool")
        if op == "=^":
            return TC(l.col.startswith(r.col), "bool")
        if op == "=$":
            return TC(l.col.endswith(r.col), "bool")
        if op == "&&":
            return TC(l.col.cast("boolean") & r.col.cast("boolean"), "bool")
        if op == "||":
            return TC(l.col.cast("boolean") | r.col.cast("boolean"), "bool")
        raise ExpressionError(f"unhandled operator {op!r}")


def compile_expression(text: str, df: DataFrame, variables: dict[str, TC] | None = None) -> Column:
    """Compile an ``exp:{...}`` body to a Spark Column."""
    ast = parse_expression(text)
    return Translator(df, variables).translate(ast).col


def compile_condition(text: str, df: DataFrame, variables: dict[str, TC] | None = None) -> Column:
    """Compile a boolean condition. Null handling is left to the caller via
    cond_true/cond_not_true — wrapping in coalesce() here would block
    parquet predicate pushdown for every compiled filter."""
    return compile_expression(text, df, variables).cast("boolean")


def cond_true(c: Column) -> Column:
    """Null-safe 'is true' (JEXL: null is not true) in a pushdown-friendly
    shape (no coalesce — Catalyst folds IsNotNull AND c into the scan)."""
    return c.isNotNull() & c


def cond_not_true(c: Column) -> Column:
    """Null-safe negation: true when c is null or false."""
    return c.isNull() | ~c
