"""Lexer for the recipe expression language (JEXL-3 subset).

The reference evaluates ``exp:{...}`` blocks with Apache Commons JEXL 3
(``wrangler-core/.../expression/EL.java``). We translate the same surface
to Spark Column expressions instead of interpreting per row. Operators
covered: arithmetic, comparison, logical, ternary, and JEXL's string-match
operators ``=~ !~ =^ =$`` (tokenized by the reference grammar,
``Directives.g4:211-217``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from wrangler_spark.errors import ExpressionError

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+([eE][+-]?\d+)?[dDfF]?|\d+[eE][+-]?\d+|\d+[lLdDfF]?)
  | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|=~|!~|=\^|=\$|<<|>>|[-+*/%<>!?:(),.;={}\[\]])
    """,
    re.VERBOSE,
)

KEYWORDS = {"true", "false", "null", "and", "or", "not", "eq", "ne", "lt", "gt", "le", "ge"}


@dataclass(frozen=True)
class Tok:
    kind: str  # 'num' | 'str' | 'ident' | 'op' | 'eof'
    text: str
    pos: int


def lex(text: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ExpressionError(f"bad character {text[pos]!r} at {pos} in expression {text!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        toks.append(Tok(kind, m.group(0), m.start()))
    toks.append(Tok("eof", "", len(text)))
    return toks
