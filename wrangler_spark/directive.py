"""Directive SPI: usage spec, argument binding, base class.

Parity with the reference SPI (``wrangler-api/.../Directive.java:54``:
``define() / initialize(Arguments) / execute(rows)``) re-shaped for Spark:
``usage`` declares the arg grammar (like ``UsageDefinition``), ``__init__``
binds args (like ``initialize``), and ``apply(ctx, df) -> df`` contributes a
DataFrame transformation instead of a row loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, ClassVar

from pyspark.sql import DataFrame

from wrangler_spark.errors import DirectiveParseError
from wrangler_spark.parser.tokens import Token, TokenType

# Widening conversions accepted during binding: a grammar slot of type X also
# accepts tokens of these kinds (e.g. a single :col satisfies COLUMN_LIST).
_COMPAT: dict[TokenType, tuple[TokenType, ...]] = {
    TokenType.COLUMN_LIST: (TokenType.COLUMN,),
    TokenType.TEXT_LIST: (TokenType.TEXT,),
    TokenType.NUMERIC_LIST: (TokenType.NUMERIC,),
    TokenType.TEXT: (TokenType.IDENTIFIER, TokenType.NUMERIC),
    # IDENTIFIER must NOT accept TEXT: optional identifier slots (e.g.
    # send-to-error's metric) would swallow a quoted message argument
    TokenType.IDENTIFIER: (TokenType.BOOL,),
    TokenType.EXPRESSION: (TokenType.TEXT,),
}


@dataclass(frozen=True)
class Arg:
    """One slot in a directive's usage grammar."""

    name: str
    type: TokenType
    optional: bool = False
    default: Any = None


class Arguments:
    """Bound name→value map (cf. ``wrangler-core/.../parser/MapArguments``)."""

    def __init__(self, values: dict[str, Any]):
        self._values = values

    def __contains__(self, name: str) -> bool:
        return self._values.get(name) is not None

    def value(self, name: str, default: Any = None) -> Any:
        v = self._values.get(name)
        return default if v is None else v

    def __getitem__(self, name: str) -> Any:
        return self._values[name]


def bind_arguments(name: str, usage: list[Arg], tokens: list[Token]) -> Arguments:
    """Positionally match tokens to the usage spec. Optional slots may be
    skipped only from the tail (same rule the reference applies)."""
    values: dict[str, Any] = {a.name: a.default for a in usage}
    ti = 0
    for ai, arg in enumerate(usage):
        if ti >= len(tokens):
            if arg.optional:
                continue
            raise DirectiveParseError(
                f"{name}: missing required argument '{arg.name}' ({arg.type.value})"
            )
        tok = tokens[ti]
        ok = tok.type is arg.type or tok.type in _COMPAT.get(arg.type, ())
        if not ok and arg.optional:
            continue  # token belongs to a later slot
        if not ok:
            raise DirectiveParseError(
                f"{name}: argument '{arg.name}' expects {arg.type.value}, got {tok!r}"
            )
        val = tok.value
        if arg.type is TokenType.COLUMN_LIST and tok.type is TokenType.COLUMN:
            val = [val]
        elif arg.type is TokenType.TEXT_LIST and tok.type is TokenType.TEXT:
            val = [val]
        elif arg.type is TokenType.NUMERIC_LIST and tok.type is TokenType.NUMERIC:
            val = [val]
        elif arg.type is TokenType.TEXT and tok.type is TokenType.NUMERIC:
            val = str(val)
        values[arg.name] = val
        ti += 1
    if ti < len(tokens):
        raise DirectiveParseError(
            f"{name}: unexpected extra argument {tokens[ti]!r} (usage: "
            + " ".join(f"[{a.name}]" if a.optional else a.name for a in usage)
            + ")"
        )
    return Arguments(values)


class Directive:
    """Base class for all directives.

    Subclasses set ``name`` + ``usage`` and implement ``apply``. The class
    is instantiated once per recipe statement (compile time); ``apply`` must
    be pure plan construction — no actions, no row loops.
    """

    name: ClassVar[str] = ""
    usage: ClassVar[list[Arg]] = []
    # directives that terminate/branch rows (filters, error routing)
    is_filter: ClassVar[bool] = False

    def __init__(self, args: Arguments, call: Any = None):
        self.args = args
        self.call = call  # DirectiveCall, for error messages / lineage

    def apply(self, ctx: "CompileContext", df: DataFrame) -> DataFrame:  # noqa: F821
        raise NotImplementedError

    def lineage(self) -> dict:
        """Field-level lineage record (parity: the reference's per-directive
        Mutation emitted in prepareRun, ``api/lineage/Mutation.java``).
        Default: directive name + the column arguments it touches."""
        cols: list[str] = []
        for a in self.usage:
            v = self.args.value(a.name)
            if a.type is TokenType.COLUMN and isinstance(v, str):
                cols.append(v)
            elif a.type is TokenType.COLUMN_LIST and isinstance(v, list):
                cols.extend(v)
        return {
            "directive": self.name,
            "columns": cols,
            "readable": f"{self.name} on {', '.join(cols) if cols else '(row)'}",
        }

    def __repr__(self) -> str:
        return f"<{type(self).__name__} {self.name}>"
