"""Character-level tokenizer for one directive statement.

Hand-written scanner covering the reference grammar's lexical surface
(``Directives.g4``): ``:column`` refs and lists, single/double-quoted text
and text lists, numbers and numeric lists, booleans, ``exp:{...}`` code
blocks (nested braces, quote-aware), ``prop:{k=v,...}`` property maps, and
``lo:hi=value`` range lists.
"""

from __future__ import annotations

import re
from typing import Any

from wrangler_spark.errors import RecipeSyntaxError
from wrangler_spark.parser.tokens import Token, TokenType

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*")
_COLUMN_RE = re.compile(r":([A-Za-z0-9_\-$.\[\]]+)")
_NUMBER_RE = re.compile(r"-?\d+(\.\d+)?([eE][+-]?\d+)?")
# lo:hi=value — value runs to the next comma or end (reference: Quantization ranges)
_RANGE_ITEM_RE = re.compile(r"(-?\d+(?:\.\d+)?):(-?\d+(?:\.\d+)?)=([^,]+)")


class _Scanner:
    def __init__(self, text: str, line_no: int | None = None):
        self.text = text
        self.pos = 0
        self.line_no = line_no

    def error(self, msg: str) -> RecipeSyntaxError:
        return RecipeSyntaxError(msg, self.line_no, self.text)

    def eof(self) -> bool:
        return self.pos >= len(self.text)

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def skip_ws(self) -> None:
        while not self.eof() and self.text[self.pos].isspace():
            self.pos += 1

    # --- lexeme readers -------------------------------------------------

    def read_quoted(self) -> str:
        quote = self.text[self.pos]
        self.pos += 1
        out: list[str] = []
        while True:
            if self.eof():
                raise self.error("unterminated string literal")
            ch = self.text[self.pos]
            if ch == "\\" and self.pos + 1 < len(self.text):
                nxt = self.text[self.pos + 1]
                # only the quote char and backslash are escape-collapsed;
                # anything else (regex escapes like \d, \|) passes through
                if nxt == quote or nxt == "\\":
                    out.append(nxt)
                else:
                    out.append(ch)
                    out.append(nxt)
                self.pos += 2
                continue
            if ch == quote:
                self.pos += 1
                return "".join(out)
            out.append(ch)
            self.pos += 1

    def read_braced(self) -> str:
        """Read a `{...}` block starting at '{'; returns inner text.
        Brace counting skips quoted sections so `exp:{ a == '}' }` works."""
        assert self.text[self.pos] == "{"
        self.pos += 1
        depth = 1
        out: list[str] = []
        while True:
            if self.eof():
                raise self.error("unterminated { ... } block")
            ch = self.text[self.pos]
            if ch in ("'", '"'):
                start = self.pos
                self.read_quoted()
                out.append(self.text[start : self.pos])
                continue
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return "".join(out)
            out.append(ch)
            self.pos += 1


def _parse_prop_body(body: str, scanner: _Scanner) -> dict[str, Any]:
    props: dict[str, Any] = {}
    for item in _split_top_level_commas(body):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise scanner.error(f"bad property {item!r}: expected k=v")
        k, v = item.split("=", 1)
        props[k.strip()] = _coerce_scalar(v.strip())
    return props


def _split_top_level_commas(s: str) -> list[str]:
    parts, depth, cur, i = [], 0, [], 0
    while i < len(s):
        ch = s[i]
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        elif ch in ("'", '"'):
            j = i + 1
            while j < len(s) and s[j] != ch:
                j += 2 if s[j] == "\\" else 1
            cur.append(s[i : j + 1])
            i = j + 1
            continue
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _coerce_scalar(s: str):
    if len(s) >= 2 and s[0] in "'\"" and s[-1] == s[0]:
        return s[1:-1]
    low = s.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def tokenize_statement(text: str, line_no: int | None = None) -> list[Token]:
    """Tokenize one directive statement into `[DIRECTIVE_NAME, arg tokens...]`."""
    sc = _Scanner(text, line_no)
    sc.skip_ws()
    m = _IDENT_RE.match(sc.text, sc.pos)
    if not m:
        raise sc.error("expected a directive name")
    sc.pos = m.end()
    tokens = [Token(TokenType.DIRECTIVE_NAME, m.group(0).lower())]

    while True:
        sc.skip_ws()
        if sc.eof():
            return tokens
        ch = sc.peek()

        if ch == ":":  # column or column list
            cols = []
            while True:
                cm = _COLUMN_RE.match(sc.text, sc.pos)
                if not cm:
                    raise sc.error("expected column name after ':'")
                cols.append(cm.group(1))
                sc.pos = cm.end()
                save = sc.pos
                sc.skip_ws()
                if sc.peek() == ",":
                    sc.pos += 1
                    sc.skip_ws()
                    if sc.peek() == ":":
                        continue
                sc.pos = save
                break
            if len(cols) == 1:
                tokens.append(Token(TokenType.COLUMN, cols[0]))
            else:
                tokens.append(Token(TokenType.COLUMN_LIST, cols))
            continue

        if ch in ("'", '"'):  # text or text list
            texts = [sc.read_quoted()]
            while True:
                save = sc.pos
                sc.skip_ws()
                if sc.peek() == ",":
                    sc.pos += 1
                    sc.skip_ws()
                    if sc.peek() in ("'", '"'):
                        texts.append(sc.read_quoted())
                        continue
                sc.pos = save
                break
            if len(texts) == 1:
                tokens.append(Token(TokenType.TEXT, texts[0]))
            else:
                tokens.append(Token(TokenType.TEXT_LIST, texts))
            continue

        if ch.isdigit() or (ch == "-" and sc.pos + 1 < len(sc.text) and sc.text[sc.pos + 1].isdigit()):
            # RANGES look like 0:9=low,... — try them before plain numbers
            rm = _RANGE_ITEM_RE.match(sc.text, sc.pos)
            if rm:
                ranges = []
                while True:
                    rm = _RANGE_ITEM_RE.match(sc.text, sc.pos)
                    if not rm:
                        raise sc.error("bad range item; expected lo:hi=value")
                    lo, hi, val = rm.groups()
                    ranges.append((float(lo), float(hi), _coerce_scalar(val.strip())))
                    sc.pos = rm.end()
                    save = sc.pos
                    sc.skip_ws()
                    if sc.peek() == ",":
                        sc.pos += 1
                        sc.skip_ws()
                        if _RANGE_ITEM_RE.match(sc.text, sc.pos):
                            continue
                    sc.pos = save
                    break
                tokens.append(Token(TokenType.RANGES, ranges))
                continue
            nums = []
            while True:
                nm = _NUMBER_RE.match(sc.text, sc.pos)
                if not nm:
                    raise sc.error("expected a number")
                lit = nm.group(0)
                nums.append(float(lit) if ("." in lit or "e" in lit or "E" in lit) else int(lit))
                sc.pos = nm.end()
                save = sc.pos
                sc.skip_ws()
                if sc.peek() == ",":
                    sc.pos += 1
                    sc.skip_ws()
                    nxt = sc.peek()
                    if nxt.isdigit() or nxt == "-":
                        continue
                sc.pos = save
                break
            if len(nums) == 1:
                tokens.append(Token(TokenType.NUMERIC, nums[0]))
            else:
                tokens.append(Token(TokenType.NUMERIC_LIST, nums))
            continue

        m = _IDENT_RE.match(sc.text, sc.pos)
        if m:
            word = m.group(0)
            after = sc.text[m.end() : m.end() + 2]
            if word in ("exp", "condition") and after.startswith(":{"):
                sc.pos = m.end() + 1  # at '{'
                tokens.append(Token(TokenType.EXPRESSION, sc.read_braced().strip()))
                continue
            if word == "prop" and after.startswith(":{"):
                sc.pos = m.end() + 1
                tokens.append(Token(TokenType.PROPERTIES, _parse_prop_body(sc.read_braced(), sc)))
                continue
            sc.pos = m.end()
            if word.lower() in ("true", "false"):
                tokens.append(Token(TokenType.BOOL, word.lower() == "true"))
            else:
                tokens.append(Token(TokenType.IDENTIFIER, word))
            continue

        raise sc.error(f"unexpected character {ch!r}")
