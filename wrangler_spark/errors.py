"""Engine exception hierarchy.

Mirrors the reference's split between compile-time and run-time failures
(``DirectiveParseException`` vs ``DirectiveExecutionException`` in
``wrangler-api``), plus a distinct recipe-syntax error.
"""

from __future__ import annotations


class WranglerError(Exception):
    """Base for all engine errors."""


class RecipeSyntaxError(WranglerError):
    """Recipe text failed to tokenize/parse (bad token, unbalanced braces...)."""

    def __init__(self, message: str, line_no: int | None = None, source: str | None = None):
        self.line_no = line_no
        self.source = source
        loc = f" (line {line_no}: {source!r})" if line_no is not None else ""
        super().__init__(message + loc)


class DirectiveParseError(WranglerError):
    """Directive name unknown or arguments don't match its usage."""


class DirectiveApplyError(WranglerError):
    """Directive could not be compiled against the incoming schema
    (missing column, wrong type...)."""


class ExpressionError(WranglerError):
    """JEXL-style expression failed to parse or translate."""


class PipelineAbortError(WranglerError):
    """Raised when a ``fail`` directive's condition matched rows at run time
    (parity: ``io.cdap.directives.row.Fail``)."""
