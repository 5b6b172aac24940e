"""Token model for the recipe grammar.

Token kinds mirror the reference grammar's lexical categories
(``wrangler-core/src/main/antlr4/.../Directives.g4:44-196`` — column refs,
quoted text, numbers, bools, lists thereof, code blocks ``exp:{}``,
properties ``prop:{}``, numeric ranges ``lo:hi=value``), re-expressed as a
small Python enum instead of ANTLR token classes
(cf. ``wrangler-api/.../parser/TokenType.java:51-155``).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Any


class TokenType(enum.Enum):
    DIRECTIVE_NAME = "directive-name"
    COLUMN = "column"            # :col                       -> str
    COLUMN_LIST = "column-list"  # :a,:b,:c                   -> list[str]
    TEXT = "text"                # 'quoted'                   -> str
    TEXT_LIST = "text-list"      # 'a','b'                    -> list[str]
    NUMERIC = "numeric"          # 12 / 3.5 / -7              -> int | float
    NUMERIC_LIST = "numeric-list"  # 1,2,3                    -> list
    BOOL = "bool"                # true / false               -> bool
    EXPRESSION = "expression"    # exp:{ ... }                -> str (raw body)
    PROPERTIES = "properties"    # prop:{k=v, ...}            -> dict[str, Any]
    RANGES = "ranges"            # 0:9=low,10:19=mid          -> list[(lo, hi, value)]
    IDENTIFIER = "identifier"    # bare word                  -> str


@dataclass(frozen=True)
class Token:
    type: TokenType
    value: Any

    def __repr__(self) -> str:  # compact for error messages
        return f"{self.type.value}({self.value!r})"
