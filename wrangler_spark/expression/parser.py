"""Pratt/recursive-descent parser for the expression language → AST tuples.

AST nodes:
  ('num', v) ('str', s) ('bool', b) ('null',)
  ('var', name)                       # column or transient variable
  ('un', op, x)                       # '-' '!'
  ('bin', op, l, r)
  ('ternary', cond, a, b)
  ('elvis', a, b)                     # a ?: b
  ('call', namespace|None, fname, [args])
  ('field', obj, name)                # struct field / property access
  ('index', obj, idx)                 # array / map element
  ('array', [items])                  # JEXL array literal [1, 2, 3]
  ('let', [(name, expr), ...], final) # script block: a = 1; b = a + 2; final
  ('if', cond, then, else)            # if (c) { x } else { y } expression
"""

from __future__ import annotations

from wrangler_spark.errors import ExpressionError
from wrangler_spark.expression.lexer import Tok, lex

_WORD_OPS = {"and": "&&", "or": "||", "eq": "==", "ne": "!=", "lt": "<", "gt": ">", "le": "<=", "ge": ">="}


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = lex(text)
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise ExpressionError(f"expected {text!r}, got {t.text!r} in {self.text!r}")
        return t

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        if t.kind == "op" and t.text in ops:
            return True
        return t.kind == "ident" and _WORD_OPS.get(t.text) in ops

    def take_op(self) -> str:
        t = self.next()
        return _WORD_OPS.get(t.text, t.text)

    # precedence: ternary < || < && < equality < relational < additive <
    # multiplicative < unary < postfix < primary
    def parse(self):
        node = self.script()
        if self.peek().kind != "eof":
            raise ExpressionError(f"unexpected {self.peek().text!r} in {self.text!r}")
        return node

    def script(self):
        """JEXL script: optional ``{ ... }`` wrapper around ``;``-separated
        local assignments followed by the result expression (the shape the
        reference's function tests use: ``{ a = 5.0; number:AsDouble(a/2) }``)."""
        if self.peek().text == "{":
            self.next()
            node = self.script()
            self.expect("}")
            return node
        bindings = []
        while True:
            t = self.peek()
            if (
                t.kind == "ident"
                and t.text == "var"
                and self.toks[self.i + 1].kind == "ident"
            ):
                # JEXL declaration: 'var x;' or 'var x = expr;'
                self.next()
                name = self.next().text
                if self.peek().text == "=":
                    self.next()
                    bindings.append((name, self.ternary()))
                else:
                    bindings.append((name, ("null",)))
                self.expect(";")
                continue
            if (
                t.kind == "ident"
                and self.toks[self.i + 1].kind == "op"
                and self.toks[self.i + 1].text == "="
            ):
                name = self.next().text
                self.next()  # '='
                bindings.append((name, self.ternary()))
                self.expect(";")
                continue
            break
        final = self.ternary()
        if self.peek().text == ";":  # tolerate a trailing ';'
            self.next()
        return ("let", bindings, final) if bindings else final

    def ternary(self):
        cond = self.or_()
        if self.at_op("?"):
            self.next()
            if self.at_op(":"):  # elvis a ?: b
                self.next()
                return ("elvis", cond, self.ternary())
            a = self.ternary()
            self.expect(":")
            b = self.ternary()
            return ("ternary", cond, a, b)
        return cond

    def or_(self):
        n = self.and_()
        while self.at_op("||"):
            self.next()
            n = ("bin", "||", n, self.and_())
        return n

    def and_(self):
        n = self.equality()
        while self.at_op("&&"):
            self.next()
            n = ("bin", "&&", n, self.equality())
        return n

    def equality(self):
        n = self.relational()
        while self.at_op("==", "!=", "=~", "!~", "=^", "=$"):
            op = self.take_op()
            n = ("bin", op, n, self.relational())
        return n

    def relational(self):
        n = self.additive()
        while self.at_op("<", ">", "<=", ">="):
            op = self.take_op()
            n = ("bin", op, n, self.additive())
        return n

    def additive(self):
        n = self.multiplicative()
        while self.at_op("+", "-"):
            op = self.take_op()
            n = ("bin", op, n, self.multiplicative())
        return n

    def multiplicative(self):
        n = self.unary()
        while self.at_op("*", "/", "%"):
            op = self.take_op()
            n = ("bin", op, n, self.unary())
        return n

    def unary(self):
        if self.at_op("-"):
            self.next()
            return ("un", "-", self.unary())
        if self.at_op("!") or (self.peek().kind == "ident" and self.peek().text == "not"):
            self.next()
            return ("un", "!", self.unary())
        return self.postfix()

    def postfix(self):
        n = self.primary()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text == ".":
                self.next()
                name = self.next()
                if name.kind != "ident":
                    raise ExpressionError(f"expected field name after '.' in {self.text!r}")
                if self.peek().text == "(":  # method call sugar: obj.fn(args)
                    args = self.call_args()
                    n = ("call", None, name.text, [n, *args])
                else:
                    n = ("field", n, name.text)
                continue
            if t.kind == "op" and t.text == "[":
                self.next()
                idx = self.ternary()
                self.expect("]")
                n = ("index", n, idx)
                continue
            break
        return n

    def _if_expr(self):
        """``if (cond) { a } else { b }`` used as an expression (JEXL
        scripts return the last evaluated value; without else → null)."""
        self.expect("(")
        cond = self.ternary()
        self.expect(")")
        self.expect("{")
        then = self.ternary()
        self.expect("}")
        els = ("null",)
        if self.peek().kind == "ident" and self.peek().text == "else":
            self.next()
            if self.peek().kind == "ident" and self.peek().text == "if":
                self.next()
                els = self._if_expr()
            else:
                self.expect("{")
                els = self.ternary()
                self.expect("}")
        return ("if", cond, then, els)

    def call_args(self):
        self.expect("(")
        args = []
        if self.peek().text != ")":
            args.append(self.ternary())
            while self.peek().text == ",":
                self.next()
                args.append(self.ternary())
        self.expect(")")
        return args

    def primary(self):
        t = self.next()
        if t.kind == "num":
            lit = t.text
            suffix = lit[-1] if lit[-1] in "lLdDfF" else ""
            if suffix:
                lit = lit[:-1]
            if "." in lit or "e" in lit or "E" in lit or (suffix and suffix in "dDfF"):
                return ("num", float(lit))
            return ("num", int(lit))
        if t.kind == "str":
            body = t.text[1:-1]
            out, i = [], 0
            while i < len(body):
                if body[i] == "\\" and i + 1 < len(body):
                    esc = body[i + 1]
                    out.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
                    i += 2
                else:
                    out.append(body[i])
                    i += 1
            return ("str", "".join(out))
        if t.kind == "ident":
            word = t.text
            if word == "true":
                return ("bool", True)
            if word == "false":
                return ("bool", False)
            if word == "null":
                return ("null",)
            if word == "if" and self.peek().text == "(":
                return self._if_expr()
            # namespace call ns:fn(...) — lookahead for ':' ident '('
            if (
                self.peek().text == ":"
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1].kind == "ident"
                and self.i + 2 < len(self.toks)
                and self.toks[self.i + 2].text == "("
            ):
                self.next()  # ':'
                fname = self.next().text
                return ("call", word, fname, self.call_args())
            if self.peek().text == "(":
                return ("call", None, word, self.call_args())
            return ("var", word)
        if t.kind == "op" and t.text == "(":
            n = self.ternary()
            self.expect(")")
            return n
        if t.kind == "op" and t.text == "[":
            # JEXL array literal: [1, 2, 3]
            items = []
            if self.peek().text != "]":
                items.append(self.ternary())
                while self.peek().text == ",":
                    self.next()
                    items.append(self.ternary())
            self.expect("]")
            return ("array", items)
        raise ExpressionError(f"unexpected token {t.text!r} in {self.text!r}")


def parse_expression(text: str):
    return _Parser(text).parse()
