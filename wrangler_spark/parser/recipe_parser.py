"""Recipe text → ordered list of DirectiveCall.

Splits a recipe into statements (';'-terminated or one per line, quote- and
brace-aware), strips ``//`` comments, collects ``#pragma`` lines, and
tokenizes each statement. This produces the engine's first IR — the
equivalent of the reference's ``RecipeSymbol`` token groups
(``wrangler-core/.../parser/RecipeVisitor.java:66-133``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from wrangler_spark.errors import RecipeSyntaxError
from wrangler_spark.parser.tokenizer import tokenize_statement
from wrangler_spark.parser.tokens import Token, TokenType


@dataclass
class DirectiveCall:
    name: str
    args: list[Token]
    source: str
    line_no: int


@dataclass
class ParsedRecipe:
    calls: list[DirectiveCall]
    pragmas: dict[str, list[str]] = field(default_factory=dict)


_EXPR_CONTINUATION = set("=+-*/%?.([<>!&|,)]}~^")


def _starts_directive(text: str, i: int) -> bool:
    """Does text[i:] (up to end-of-line) look like a new directive rather
    than the continuation of a JEXL expression? A directive is an
    identifier followed by end/args (':col', quotes, digits, another
    word); an expression continuation follows the identifier with an
    operator ('=', '+', '(' …)."""
    n = len(text)
    while i < n and text[i] in " \t":
        i += 1
    if i >= n or text[i] == "\n":
        return True  # trailing ';'
    if text[i] == "#":
        return True  # comment/pragma line
    j = i
    while j < n and (text[j].isalnum() or text[j] in "-_"):
        j += 1
    if j == i:
        return False  # ';' followed by an operator/paren — expression
    if j < n and text[j] == ":":
        return False  # 'ns:fn(...)' namespace call — expression ('drop :c'
        # has a space before the ':')
    while j < n and text[j] in " \t":
        j += 1
    if j >= n or text[j] == "\n":
        return True  # bare no-arg directive … unless it was a final expr var —
        # a directive name is the likelier read at statement level
    return text[j] not in _EXPR_CONTINUATION


def _split_statements(text: str) -> list[tuple[str, int]]:
    """Split on ';' and newlines outside quotes/braces. Returns (stmt, line_no)."""
    statements: list[tuple[str, int]] = []
    cur: list[str] = []
    cur_line = 1
    line = 1
    depth = 0
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch in ("'", '"'):
            j = i + 1
            while j < n and text[j] != ch:
                if text[j] == "\\":
                    j += 1
                if j < n and text[j] == "\n":
                    line += 1
                j += 1
            cur.append(text[i : j + 1])
            i = j + 1
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "/" and i + 1 < n and text[i + 1] == "/" and depth == 0:
            while i < n and text[i] != "\n":
                i += 1
            continue
        if ch == ";" and depth == 0 and not _starts_directive(text, i + 1):
            # a ';' inside a bare V1 expression (e.g. `set column x var y;
            # y = ...; y + 1`) — JEXL statement separator, not a directive
            # terminator; keep it in the current statement
            cur.append(ch)
            i += 1
            continue
        if (ch == ";" and depth == 0) or (ch == "\n" and depth == 0):
            stmt = "".join(cur).strip()
            if stmt:
                statements.append((stmt, cur_line))
            cur = []
            if ch == "\n":
                line += 1
            cur_line = line
            i += 1
            continue
        if ch == "\n":
            line += 1
        cur.append(ch)
        i += 1
    stmt = "".join(cur).strip()
    if stmt:
        statements.append((stmt, cur_line))
    return statements


def split_statements(text: str) -> list[tuple[str, int]]:
    """Public statement splitter (used by the V1-migration fallback)."""
    return _split_statements(text)


def parse_statement(stmt: str, line_no: int = 1) -> DirectiveCall:
    tokens = tokenize_statement(stmt, line_no)
    if not tokens or tokens[0].type is not TokenType.DIRECTIVE_NAME:
        raise RecipeSyntaxError("statement must start with a directive name", line_no, stmt)
    return DirectiveCall(tokens[0].value, tokens[1:], stmt, line_no)


def parse_recipe(text: str) -> ParsedRecipe:
    calls: list[DirectiveCall] = []
    pragmas: dict[str, list[str]] = {}
    for stmt, line_no in _split_statements(text):
        if stmt.startswith("#pragma"):
            parts = stmt[len("#pragma") :].strip().split(None, 1)
            if parts:
                key = parts[0]
                vals = [v.strip() for v in (parts[1].split(",") if len(parts) > 1 else [])]
                pragmas.setdefault(key, []).extend(v for v in vals if v)
            continue
        if stmt.startswith("#"):
            continue  # plain comment
        tokens = tokenize_statement(stmt, line_no)
        if not tokens or tokens[0].type is not TokenType.DIRECTIVE_NAME:
            raise RecipeSyntaxError("statement must start with a directive name", line_no, stmt)
        calls.append(DirectiveCall(tokens[0].value, tokens[1:], stmt, line_no))
    return ParsedRecipe(calls, pragmas)
