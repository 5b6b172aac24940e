"""EL function namespaces → native Spark Column implementations.

Parity surface: the JEXL namespaces the reference registers in
``wrangler-core/.../expression/EL.java:137-160`` — ``Global`` (default
namespace, ``functions/Global.java``), ``math:`` (java.lang.Math),
``string:`` (commons-lang StringUtils), ``strings:`` (guava Strings),
``date:`` (``functions/Dates.java``), ``datetime:``
(``functions/DateAndTime.java``), ``json:``, ``dq:``
(``functions/DataQuality.java``), ``number:``, ``logical:``, ``bytes:``.

Everything here is a *compile-time* rewrite to built-in pyspark.sql
functions (including higher-order array functions for checksum math like
Luhn/ISBN) — no Python runs per row. Functions not covered raise
ExpressionError naming the gap, never silently doing the wrong thing.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from wrangler_spark.errors import ExpressionError
from wrangler_spark.expression.translator import TC, Translator

# ---------------------------------------------------------------------------
# helpers

_MAXLEN = 2147483647


def _java_substring(s: Column, start: Column, end: Column | None = None) -> Column:
    """commons-lang StringUtils.substring: negative indexes count from the
    end; out-of-range clamps; start>end → ''."""
    ln = F.length(s)
    sp = F.when(start < 0, F.greatest(ln + start, F.lit(0))).otherwise(F.least(start, ln))
    if end is None:
        return s.substr((sp + 1).cast("int"), F.lit(_MAXLEN))
    ep = F.when(end < 0, F.greatest(ln + end, F.lit(0))).otherwise(F.least(end, ln))
    return F.when(sp >= ep, F.lit("")).otherwise(s.substr((sp + 1).cast("int"), (ep - sp).cast("int")))


def _digits(c: Column) -> Column:
    """string → array<int> of its digit characters."""
    return F.transform(F.split(F.regexp_replace(c.cast("string"), "[^0-9]", ""), ""), lambda x: x.cast("int"))


def _luhn(c: Column) -> Column:
    """Luhn checksum (commons-validator parity for dq:isCreditCard),
    entirely JVM-side via higher-order array functions."""
    clean = F.regexp_replace(c.cast("string"), "[^0-9]", "")
    rev = F.transform(F.reverse(F.split(clean, "")), lambda x: x.cast("int"))
    doubled = F.zip_with(
        rev,
        F.sequence(F.lit(0), F.length(clean) - 1),
        lambda d, i: F.when(i % 2 == 1, F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d),
    )
    total = F.aggregate(doubled, F.lit(0), lambda acc, x: acc + x)
    return (F.length(clean) >= 12) & (F.length(clean) <= 19) & (total % 10 == 0)


_EMAIL_RE = r"^[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$"
_IPV4_RE = r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
_IPV6_RE = (
    r"^([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}$|^::$|^::1$|^([0-9a-fA-F]{1,4}:){1,7}:$"
    r"|^:(:[0-9a-fA-F]{1,4}){1,7}$|^([0-9a-fA-F]{1,4}:){1,6}(:[0-9a-fA-F]{1,4}){1,6}$"
)
_URL_RE = r"^(https?|ftp)://[^\s/$.?#].[^\s]*$"
_DOMAIN_RE = r"^([A-Za-z0-9]([A-Za-z0-9\-]{0,61}[A-Za-z0-9])?\.)+[A-Za-z]{2,}$"

_CARD_RES = {
    "isamex": r"^3[47][0-9]{13}$",
    "isvisa": r"^4[0-9]{12}(?:[0-9]{3})?$",
    "ismaster": r"^(5[1-5][0-9]{14}|2(2[2-9][0-9]{12}|[3-6][0-9]{13}|7[01][0-9]{12}|720[0-9]{12}))$",
    "isdiner": r"^3(?:0[0-5]|[68][0-9])[0-9]{11}$",
    "isdiscover": r"^6(?:011|5[0-9]{2})[0-9]{12}$",
    "isvpay": r"^4[0-9]{12,18}$",
}

# ---------------------------------------------------------------------------
# namespaces — each entry: callable(translator, args: list[TC]) -> TC


def _global_fns():
    def concat(tr, a):
        if len(a) == 3:  # Global.concat(a, delim, b)
            return TC(F.concat(a[0].col.cast("string"), a[1].col.cast("string"), a[2].col.cast("string")), "str")
        return TC(F.concat(a[0].col.cast("string"), a[1].col.cast("string")), "str")

    return {
        "todouble": lambda tr, a: TC(a[0].col.cast("double"), "num"),
        "tofloat": lambda tr, a: TC(a[0].col.cast("float"), "num"),
        "tolong": lambda tr, a: TC(a[0].col.cast("long"), "num"),
        "tointeger": lambda tr, a: TC(a[0].col.cast("int"), "num"),
        "toshort": lambda tr, a: TC(a[0].col.cast("short"), "num"),
        "tostring": lambda tr, a: TC(a[0].col.cast("string"), "str"),
        "tobytes": lambda tr, a: TC(a[0].col.cast("binary"), "bin"),
        "concat": concat,
        "coalesce": lambda tr, a: TC(F.coalesce(*[x.col for x in a]), a[0].kind),
        "rcoalesce": lambda tr, a: TC(F.coalesce(*[x.col for x in reversed(a)]), a[0].kind),
        "format": lambda tr, a: TC(F.format_string(_lit_str(a[0]), *[x.col for x in a[1:]]), "str"),
        "padatstart": lambda tr, a: TC(F.lpad(a[0].col.cast("string"), _lit_int(a[1]), _lit_str(a[2])), "str"),
        "padatend": lambda tr, a: TC(F.rpad(a[0].col.cast("string"), _lit_int(a[1]), _lit_str(a[2])), "str"),
        "repeat": lambda tr, a: TC(F.repeat(a[0].col, a[1].col.cast("int")), "str"),
        "unquote": lambda tr, a: TC(F.regexp_replace(a[0].col, "^[\"']|[\"']$", ""), "str"),
        "isnotnull": lambda tr, a: TC(a[0].col.isNotNull(), "bool"),
        "isnull": lambda tr, a: TC(a[0].col.isNull(), "bool"),
        "nulltoempty": lambda tr, a: TC(F.coalesce(a[0].col.cast("string"), F.lit("")), "str"),
        "nulltozero": lambda tr, a: TC(F.coalesce(a[0].col, F.lit(0)), "num"),
        "nulltovalue": lambda tr, a: TC(F.coalesce(a[0].col, a[1].col), a[0].kind),
    }


def _lit_int(a: TC) -> int:
    v = _literal_value(a)
    if not isinstance(v, (int, float)):
        raise ExpressionError("expected a literal integer argument")
    return int(v)


def _lit_str(a: TC) -> str:
    v = _literal_value(a)
    if not isinstance(v, str):
        raise ExpressionError("expected a literal string argument")
    return v


def _literal_value(a: TC):
    # Translated literals carry their python value on the TC (set by translator)
    if getattr(a, "lit", None) is not None:
        return a.lit
    raise ExpressionError("expected a literal argument")


def _math_fns():
    simple = {
        "abs": F.abs, "ceil": F.ceil, "floor": F.floor, "sqrt": F.sqrt, "cbrt": F.cbrt,
        "exp": F.exp, "expm1": F.expm1, "log": F.log, "log10": F.log10, "log1p": F.log1p,
        "sin": F.sin, "cos": F.cos, "tan": F.tan, "asin": F.asin, "acos": F.acos,
        "atan": F.atan, "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
        "signum": F.signum, "todegrees": F.degrees, "toradians": F.radians,
    }
    out = {name: (lambda fn: lambda tr, a: TC(fn(a[0].col), "num"))(fn) for name, fn in simple.items()}
    out.update(
        {
            "max": lambda tr, a: TC(F.greatest(*[x.col for x in a]), "num"),
            "min": lambda tr, a: TC(F.least(*[x.col for x in a]), "num"),
            "pow": lambda tr, a: TC(F.pow(a[0].col, a[1].col), "num"),
            "atan2": lambda tr, a: TC(F.atan2(a[0].col, a[1].col), "num"),
            "hypot": lambda tr, a: TC(F.hypot(a[0].col, a[1].col), "num"),
            # Math.round: half-up to long
            "round": lambda tr, a: TC(F.floor(a[0].col + 0.5).cast("long"), "num"),
            "rint": lambda tr, a: TC(F.round(a[0].col, 0), "num"),
            "random": lambda tr, a: TC(F.rand(), "num"),
            "floordiv": lambda tr, a: TC(F.floor(a[0].col / a[1].col).cast("long"), "num"),
            "floormod": lambda tr, a: TC(((a[0].col % a[1].col) + a[1].col) % a[1].col, "num"),
        }
    )
    return out


def _string_fns():
    def substring(tr, a):
        if len(a) == 2:
            return TC(_java_substring(a[0].col, a[1].col), "str")
        return TC(_java_substring(a[0].col, a[1].col, a[2].col), "str")

    def count_matches(tr, a):
        s, sub = a[0].col, a[1].col
        return TC(
            F.when(sub.isNull() | (F.length(sub) == 0), F.lit(0))
            .otherwise(((F.length(s) - F.length(F.replace(s, sub, F.lit("")))) / F.length(sub)).cast("int")),
            "num",
        )

    def swapcase(tr, a):
        return TC(
            F.concat_ws(
                "",
                F.transform(
                    F.split(a[0].col, ""),
                    lambda ch: F.when((ch == F.upper(ch)) & (ch != F.lower(ch)), F.lower(ch))
                    .when((ch == F.lower(ch)) & (ch != F.upper(ch)), F.upper(ch))
                    .otherwise(ch),
                ),
            ),
            "str",
        )

    return {
        "substring": substring,
        "capitalize": lambda tr, a: TC(F.concat(F.upper(F.left(a[0].col, F.lit(1))), F.substring(a[0].col, 2, _MAXLEN)), "str"),
        "uncapitalize": lambda tr, a: TC(F.concat(F.lower(F.left(a[0].col, F.lit(1))), F.substring(a[0].col, 2, _MAXLEN)), "str"),
        "uppercase": lambda tr, a: TC(F.upper(a[0].col), "str"),
        "lowercase": lambda tr, a: TC(F.lower(a[0].col), "str"),
        "reverse": lambda tr, a: TC(F.reverse(a[0].col), "str"),
        "trim": lambda tr, a: TC(F.trim(a[0].col), "str"),
        "strip": lambda tr, a: TC(F.trim(a[0].col), "str"),
        "isempty": lambda tr, a: TC(a[0].col.isNull() | (F.length(a[0].col) == 0), "bool"),
        "isnotempty": lambda tr, a: TC(a[0].col.isNotNull() & (F.length(a[0].col) > 0), "bool"),
        "isblank": lambda tr, a: TC(a[0].col.isNull() | (F.length(F.trim(a[0].col)) == 0), "bool"),
        "isnotblank": lambda tr, a: TC(a[0].col.isNotNull() & (F.length(F.trim(a[0].col)) > 0), "bool"),
        "length": lambda tr, a: TC(F.length(a[0].col), "num"),
        "left": lambda tr, a: TC(F.left(a[0].col, a[1].col), "str"),
        "right": lambda tr, a: TC(F.right(a[0].col, a[1].col), "str"),
        "mid": lambda tr, a: TC(_java_substring(a[0].col, a[1].col, a[1].col + a[2].col), "str"),
        "contains": lambda tr, a: TC(a[0].col.contains(a[1].col), "bool"),
        "startswith": lambda tr, a: TC(a[0].col.startswith(a[1].col), "bool"),
        "endswith": lambda tr, a: TC(a[0].col.endswith(a[1].col), "bool"),
        "startswithignorecase": lambda tr, a: TC(F.lower(a[0].col).startswith(F.lower(a[1].col)), "bool"),
        "endswithignorecase": lambda tr, a: TC(F.lower(a[0].col).endswith(F.lower(a[1].col)), "bool"),
        "indexof": lambda tr, a: TC(F.coalesce(F.instr(a[0].col, a[1].col) - 1, F.lit(-1)), "num"),
        "replace": lambda tr, a: TC(F.replace(a[0].col, a[1].col, a[2].col), "str"),
        "replacechars": lambda tr, a: TC(F.translate(a[0].col, _lit_str(a[1]), _lit_str(a[2])), "str"),
        "remove": lambda tr, a: TC(F.replace(a[0].col, a[1].col, F.lit("")), "str"),
        "repeat": lambda tr, a: TC(F.repeat(a[0].col, a[1].col.cast("int")), "str"),
        "leftpad": lambda tr, a: TC(F.lpad(a[0].col, _lit_int(a[1]), _lit_str(a[2]) if len(a) > 2 else " "), "str"),
        "rightpad": lambda tr, a: TC(F.rpad(a[0].col, _lit_int(a[1]), _lit_str(a[2]) if len(a) > 2 else " "), "str"),
        "deletewhitespace": lambda tr, a: TC(F.regexp_replace(a[0].col, r"\s+", ""), "str"),
        "countmatches": count_matches,
        "defaultifempty": lambda tr, a: TC(F.when(a[0].col.isNull() | (F.length(a[0].col) == 0), a[1].col).otherwise(a[0].col), "str"),
        "defaultifblank": lambda tr, a: TC(F.when(a[0].col.isNull() | (F.length(F.trim(a[0].col)) == 0), a[1].col).otherwise(a[0].col), "str"),
        "defaultstring": lambda tr, a: TC(F.coalesce(a[0].col, a[1].col if len(a) > 1 else F.lit("")), "str"),
        "swapcase": swapcase,
        "abbreviate": lambda tr, a: TC(
            F.when(F.length(a[0].col) <= a[1].col, a[0].col).otherwise(F.concat(F.left(a[0].col, a[1].col - 3), F.lit("..."))), "str"
        ),
        "chomp": lambda tr, a: TC(F.regexp_replace(a[0].col, r"(\r\n|\r|\n)$", ""), "str"),
        "chop": lambda tr, a: TC(
            F.when(a[0].col.endswith("\r\n"), F.left(a[0].col, F.length(a[0].col) - 2))
            .otherwise(F.left(a[0].col, F.greatest(F.length(a[0].col) - 1, F.lit(0)))),
            "str",
        ),
        "getlevenshteindistance": lambda tr, a: TC(F.levenshtein(a[0].col, a[1].col), "num"),
        "split": lambda tr, a: TC(F.split(a[0].col, a[1].col, -1), "array"),
        "join": lambda tr, a: TC(F.concat_ws("", *[x.col.cast("string") for x in a]), "str"),
        "substringafter": lambda tr, a: TC(
            F.when(F.instr(a[0].col, a[1].col) == 0, F.lit("")).otherwise(
                F.substring(a[0].col, F.instr(a[0].col, a[1].col) + F.length(a[1].col), F.lit(_MAXLEN))
            ),
            "str",
        ),
        "substringbefore": lambda tr, a: TC(
            F.when(F.instr(a[0].col, a[1].col) == 0, a[0].col).otherwise(F.left(a[0].col, F.instr(a[0].col, a[1].col) - 1)),
            "str",
        ),
        "substringafterlast": lambda tr, a: TC(
            F.when(F.instr(a[0].col, a[1].col) == 0, F.lit("")).otherwise(
                F.substring(
                    a[0].col,
                    _last_index_0b(a[0].col, a[1].col) + F.length(a[1].col) + 1,
                    F.lit(_MAXLEN),
                )
            ),
            "str",
        ),
        "substringbeforelast": lambda tr, a: TC(
            F.when(F.instr(a[0].col, a[1].col) == 0, a[0].col).otherwise(
                F.left(a[0].col, _last_index_0b(a[0].col, a[1].col))
            ),
            "str",
        ),
        "removestart": lambda tr, a: TC(
            F.when(a[0].col.startswith(a[1].col), F.substring(a[0].col, F.length(a[1].col) + 1, F.lit(_MAXLEN))).otherwise(a[0].col),
            "str",
        ),
        "removeend": lambda tr, a: TC(
            F.when(a[0].col.endswith(a[1].col), F.left(a[0].col, F.length(a[0].col) - F.length(a[1].col))).otherwise(a[0].col),
            "str",
        ),
        "prependifmissing": lambda tr, a: TC(
            F.when(a[0].col.startswith(a[1].col), a[0].col).otherwise(F.concat(a[1].col, a[0].col)), "str"
        ),
        "appendifmissing": lambda tr, a: TC(
            F.when(a[0].col.endswith(a[1].col), a[0].col).otherwise(F.concat(a[0].col, a[1].col)), "str"
        ),
        "wrap": lambda tr, a: TC(F.concat(a[1].col, a[0].col, a[1].col), "str"),
        "unwrap": lambda tr, a: TC(
            F.when(
                a[0].col.startswith(a[1].col) & a[0].col.endswith(a[1].col) & (F.length(a[0].col) >= 2 * F.length(a[1].col)),
                F.substring(a[0].col, F.length(a[1].col) + 1, F.lit(_MAXLEN)).substr(
                    F.lit(1), F.length(a[0].col) - 2 * F.length(a[1].col)
                ),
            ).otherwise(a[0].col),
            "str",
        ),
        "truncate": lambda tr, a: TC(F.left(a[0].col, a[1].col), "str"),
        "center": lambda tr, a: TC(
            # pad left to (size+len)//2 then right-pad to size (StringUtils.center)
            F.rpad(
                F.lpad(
                    a[0].col,
                    ((a[1].col + F.length(a[0].col)) / 2).cast("int"),
                    _lit_str(a[2]) if len(a) > 2 else " ",
                ),
                _lit_int(a[1]),
                _lit_str(a[2]) if len(a) > 2 else " ",
            ),
            "str",
        ),
        "rotate": lambda tr, a: TC(
            F.concat(
                F.right(a[0].col, ((a[1].col % F.length(a[0].col)) + F.length(a[0].col)) % F.length(a[0].col)),
                F.left(a[0].col, F.length(a[0].col) - (((a[1].col % F.length(a[0].col)) + F.length(a[0].col)) % F.length(a[0].col))),
            ),
            "str",
        ),
        "initials": lambda tr, a: TC(
            F.concat_ws("", F.transform(F.split(a[0].col, " "), lambda w: F.left(w, F.lit(1)))), "str"
        ),
        "difference": lambda tr, a: TC(
            F.when(a[0].col == a[1].col, F.lit("")).otherwise(a[1].col), "str"
        ),
        # --- commons-lang parity tail (StringUtils members) ---
        "equals": lambda tr, a: TC(a[0].col.eqNullSafe(a[1].col), "bool"),
        "equalsignorecase": lambda tr, a: TC(F.lower(a[0].col).eqNullSafe(F.lower(a[1].col)), "bool"),
        "containsignorecase": lambda tr, a: TC(F.lower(a[0].col).contains(F.lower(a[1].col)), "bool"),
        "indexofignorecase": lambda tr, a: TC(F.instr(F.lower(a[0].col), F.lower(a[1].col)) - 1, "num"),
        "lastindexof": _last_index_of,
        "isalpha": lambda tr, a: TC(a[0].col.rlike(r"^\p{L}+$"), "bool"),
        "isnumeric": lambda tr, a: TC(a[0].col.rlike(r"^\p{Nd}+$"), "bool"),
        "isalphanumeric": lambda tr, a: TC(a[0].col.rlike(r"^[\p{L}\p{Nd}]+$"), "bool"),
        "isalphaspace": lambda tr, a: TC(a[0].col.rlike(r"^[\p{L} ]*$"), "bool"),
        "isnumericspace": lambda tr, a: TC(a[0].col.rlike(r"^[\p{Nd} ]*$"), "bool"),
        "iswhitespace": lambda tr, a: TC(a[0].col.rlike(r"^\s*$"), "bool"),
        "isalluppercase": lambda tr, a: TC(a[0].col.rlike(r"^\p{Lu}+$"), "bool"),
        "isalllowercase": lambda tr, a: TC(a[0].col.rlike(r"^\p{Ll}+$"), "bool"),
        "ismixedcase": lambda tr, a: TC(
            a[0].col.rlike(r"\p{Lu}") & a[0].col.rlike(r"\p{Ll}"), "bool"
        ),
        "stripstart": lambda tr, a: TC(
            F.regexp_replace(a[0].col, "^[" + _re_escape_cls(_lit_str(a[1])) + "]+", "")
            if len(a) > 1 else F.ltrim(a[0].col),
            "str",
        ),
        "stripend": lambda tr, a: TC(
            F.regexp_replace(a[0].col, "[" + _re_escape_cls(_lit_str(a[1])) + "]+$", "")
            if len(a) > 1 else F.rtrim(a[0].col),
            "str",
        ),
        "striptonull": lambda tr, a: TC(
            F.when(F.length(F.trim(a[0].col)) == 0, F.lit(None)).otherwise(F.trim(a[0].col)), "str"
        ),
        "striptoempty": lambda tr, a: TC(F.coalesce(F.trim(a[0].col), F.lit("")), "str"),
        "normalizespace": lambda tr, a: TC(
            F.regexp_replace(F.trim(a[0].col), r"\s+", " "), "str"
        ),
        "getdigits": lambda tr, a: TC(F.regexp_replace(a[0].col, r"[^0-9]", ""), "str"),
        "overlay": _overlay,
        "replaceonce": _replace_once,
        "replaceignorecase": lambda tr, a: TC(
            F.regexp_replace(a[0].col, "(?i)" + _re_quote(_lit_str(a[1])), _re_quote_repl(_lit_str(a[2]))), "str"
        ),
        "removeignorecase": lambda tr, a: TC(
            F.regexp_replace(a[0].col, "(?i)" + _re_quote(_lit_str(a[1])), ""), "str"
        ),
        "containsany": lambda tr, a: TC(
            F.length(F.translate(a[0].col, _lit_str(a[1]), "")) < F.length(a[0].col), "bool"
        ),
        "containsnone": lambda tr, a: TC(
            F.length(F.translate(a[0].col, _lit_str(a[1]), "")) == F.length(a[0].col), "bool"
        ),
        "containsonly": lambda tr, a: TC(
            F.length(F.translate(a[0].col, _lit_str(a[1]), "")) == 0, "bool"
        ),
        "abbreviatemiddle": _abbreviate_middle,
    }


def _re_escape_cls(chars: str) -> str:
    """Escape characters for use inside a regex character class."""
    return re.sub(r"([\\\]\[\^\-])", r"\\\1", chars)


def _re_quote(s: str) -> str:
    """Quote a literal string for use as a regex pattern (Pattern.quote)."""
    return re.escape(s)


def _re_quote_repl(s: str) -> str:
    """Escape $ and \\ in a regexp_replace replacement (Java Matcher rules)."""
    return s.replace("\\", "\\\\").replace("$", r"\$")


def _last_index_0b(s: Column, sub: Column) -> Column:
    """0-based index of the LAST occurrence of sub in s, -1 if absent —
    via instr on the reversed strings (substring_index needs a literal
    delimiter, so it can't take a Column here)."""
    p = F.instr(F.reverse(s), F.reverse(sub))
    return F.when(p == 0, F.lit(-1)).otherwise(F.length(s) - p + 1 - F.length(sub))


def _last_index_of(tr, a):
    """StringUtils.lastIndexOf: 0-based index of last occurrence; -1 if
    absent or either side null (commons-lang is null-safe here)."""
    return TC(F.coalesce(_last_index_0b(a[0].col, a[1].col), F.lit(-1)), "num")


def _overlay(tr, a):
    """StringUtils.overlay(str, overlay, start, end): replace [start,end)."""
    s, ov, start, end = a[0].col, a[1].col, a[2].col, a[3].col
    n = F.length(s)
    start = F.least(F.greatest(start, F.lit(0)), n)
    end = F.least(F.greatest(end, F.lit(0)), n)
    lo = F.least(start, end)
    hi = F.greatest(start, end)
    return TC(
        F.concat(F.left(s, lo), ov, F.substring(s, hi + 1, F.lit(_MAXLEN))), "str"
    )


def _replace_once(tr, a):
    """StringUtils.replaceOnce: first occurrence only."""
    s, find, rep = a[0].col, a[1].col, a[2].col
    i = F.instr(s, find)
    return TC(
        F.when((i == 0) | (F.length(find) == 0), s).otherwise(
            F.concat(F.left(s, i - 1), rep, F.substring(s, i + F.length(find), F.lit(_MAXLEN)))
        ),
        "str",
    )


def _abbreviate_middle(tr, a):
    """StringUtils.abbreviateMiddle(str, middle, length): 'abcdef','.',4 → 'ab.f'."""
    s, mid, length = a[0].col, a[1].col, a[2].col
    target = length - F.length(mid)
    start_off = (target / 2).cast("int") + (target % 2).cast("int")
    end_off = F.length(s) - (target / 2).cast("int")
    abbreviated = F.concat(F.left(s, start_off), mid, F.substring(s, end_off + 1, F.lit(_MAXLEN)))
    return TC(
        F.when(
            (F.length(s) <= length) | (length < F.length(mid) + 2) | (F.length(s) - length <= 0),
            s,
        ).otherwise(abbreviated),
        "str",
    )


def _strings_fns():
    return {
        "isnullorempty": lambda tr, a: TC(a[0].col.isNull() | (F.length(a[0].col) == 0), "bool"),
        "nulltoempty": lambda tr, a: TC(F.coalesce(a[0].col, F.lit("")), "str"),
        "emptytonull": lambda tr, a: TC(F.when(F.length(a[0].col) == 0, F.lit(None)).otherwise(a[0].col), "str"),
        "padstart": lambda tr, a: TC(F.lpad(a[0].col, _lit_int(a[1]), _lit_str(a[2])), "str"),
        "padend": lambda tr, a: TC(F.rpad(a[0].col, _lit_int(a[1]), _lit_str(a[2])), "str"),
        "repeat": lambda tr, a: TC(F.repeat(a[0].col, a[1].col.cast("int")), "str"),
    }


def _date_fns():
    # functions/Dates.java — inputs are timestamp columns (reference ZonedDateTime)
    return {
        "unixtimestamp_millis": lambda tr, a: TC(F.unix_millis(a[0].col), "num"),
        "unixtimestamp_seconds": lambda tr, a: TC(F.unix_seconds(a[0].col), "num"),
        "month": lambda tr, a: TC(F.month(a[0].col), "num"),
        "month_short": lambda tr, a: TC(F.date_format(a[0].col, "MMM"), "str"),
        "month_long": lambda tr, a: TC(F.date_format(a[0].col, "MMMM"), "str"),
        "year": lambda tr, a: TC(F.year(a[0].col), "num"),
        "day": lambda tr, a: TC(F.dayofmonth(a[0].col), "num"),
        "day_of_week": lambda tr, a: TC(F.dayofweek(a[0].col), "num"),
        "day_of_week_short": lambda tr, a: TC(F.date_format(a[0].col, "EEE"), "str"),
        "day_of_week_long": lambda tr, a: TC(F.date_format(a[0].col, "EEEE"), "str"),
        "day_of_year": lambda tr, a: TC(F.dayofyear(a[0].col), "num"),
        "hour": lambda tr, a: TC(F.hour(a[0].col), "num"),
        "minute": lambda tr, a: TC(F.minute(a[0].col), "num"),
        "second": lambda tr, a: TC(F.second(a[0].col), "num"),
        "week": lambda tr, a: TC(F.weekofyear(a[0].col), "num"),
        "days_between": lambda tr, a: TC(F.datediff(a[0].col.cast("date"), a[1].col.cast("date")), "num"),
        "days_between_now": lambda tr, a: TC(F.datediff(F.current_date(), a[0].col.cast("date")), "num"),
        "seconds_to_days": lambda tr, a: TC((a[0].col / 86400).cast("int"), "num"),
        "seconds_to_hours": lambda tr, a: TC((a[0].col / 3600).cast("int"), "num"),
        "seconds_to_minutes": lambda tr, a: TC((a[0].col / 60).cast("int"), "num"),
        "seconds_to_weeks": lambda tr, a: TC((a[0].col / 604800).cast("int"), "num"),
        "era": lambda tr, a: TC(F.when(F.year(a[0].col) > 0, 1).otherwise(0), "num"),
        "era_short": lambda tr, a: TC(F.when(F.year(a[0].col) > 0, "AD").otherwise("BC"), "str"),
        "era_long": lambda tr, a: TC(F.when(F.year(a[0].col) > 0, "Anno Domini").otherwise("Before Christ"), "str"),
        "isdate": lambda tr, a: TC(F.coalesce(F.try_to_timestamp(a[0].col).isNotNull(), F.lit(False)), "bool"),
    }


def _dq_fns():
    def _regex_bool(pattern):
        return lambda tr, a: TC(F.coalesce(a[0].col.rlike(pattern), F.lit(False)), "bool")

    def _isbn10(c: Column) -> Column:
        clean = F.regexp_replace(c, "[ -]", "")
        body = F.transform(F.split(F.left(clean, F.lit(9)), ""), lambda x: x.cast("int"))
        weighted = F.zip_with(body, F.sequence(F.lit(10), F.lit(2)), lambda d, w: d * w)
        total = F.aggregate(weighted, F.lit(0), lambda s, x: s + x) + F.when(
            F.upper(F.right(clean, F.lit(1))) == "X", F.lit(10)
        ).otherwise(F.right(clean, F.lit(1)).cast("int"))
        return clean.rlike("^[0-9]{9}[0-9Xx]$") & (total % 11 == 0)

    def _isbn13(c: Column) -> Column:
        clean = F.regexp_replace(c, "[ -]", "")
        ds = F.transform(F.split(clean, ""), lambda x: x.cast("int"))
        weighted = F.zip_with(ds, F.sequence(F.lit(0), F.lit(12)), lambda d, i: d * F.when(i % 2 == 0, 1).otherwise(3))
        total = F.aggregate(weighted, F.lit(0), lambda s, x: s + x)
        return clean.rlike("^[0-9]{13}$") & (total % 10 == 0)

    def hascolumn(tr, a):
        # dq:hascolumn(row, 'name') — schema is static, so this folds to a
        # literal at compile time (ref signature takes the Row object)
        name = a[-1].lit
        if name is None:
            raise ExpressionError("dq:hascolumn needs a literal column name")
        return TC(F.lit(str(name).lower() in {f.lower() for f in tr.df.columns}), "bool", None)

    out = {
        "columns": lambda tr, a: TC(F.lit(len(tr.df.columns)), "num", len(tr.df.columns)),
        "hascolumn": hascolumn,
        "inrange": lambda tr, a: TC(a[0].col.between(a[1].col, a[2].col), "bool"),
        "strlen": lambda tr, a: TC(F.length(a[0].col), "num"),
        "isnull": lambda tr, a: TC(a[0].col.isNull(), "bool"),
        "isempty": lambda tr, a: TC(F.length(a[0].col) == 0, "bool"),
        "isdate": lambda tr, a: TC(
            F.coalesce(
                (F.try_to_timestamp(a[0].col, a[1].col) if len(a) > 1 else F.try_to_timestamp(a[0].col)).isNotNull(),
                F.lit(False),
            ),
            "bool",
        ),
        "istime": lambda tr, a: TC(F.coalesce(a[0].col.rlike(r"^\d{1,2}:\d{2}(:\d{2})?(\s?[AaPp][Mm])?$"), F.lit(False)), "bool"),
        "isnumber": lambda tr, a: TC(F.coalesce(a[0].col.cast("double").isNotNull(), F.lit(False)), "bool"),
        "isboolean": lambda tr, a: TC(F.coalesce(F.lower(a[0].col).isin("true", "false"), F.lit(False)), "bool"),
        "isip": lambda tr, a: TC(F.coalesce(a[0].col.rlike(_IPV4_RE) | a[0].col.rlike(_IPV6_RE), F.lit(False)), "bool"),
        "isipv4": _regex_bool(_IPV4_RE),
        "isipv6": _regex_bool(_IPV6_RE),
        "isemail": _regex_bool(_EMAIL_RE),
        "isurl": _regex_bool(_URL_RE),
        "isdomainname": _regex_bool(_DOMAIN_RE),
        "isdomaintld": lambda tr, a: TC(F.coalesce(a[0].col.rlike(r"^[A-Za-z]{2,}$"), F.lit(False)), "bool"),
        "isgenerictld": lambda tr, a: TC(
            F.coalesce(F.lower(a[0].col).isin("com", "org", "net", "info", "biz", "name", "pro", "int", "edu", "gov", "mil"), F.lit(False)),
            "bool",
        ),
        "iscountrytld": lambda tr, a: TC(F.coalesce(a[0].col.rlike(r"^[A-Za-z]{2}$"), F.lit(False)), "bool"),
        "isisbn10": lambda tr, a: TC(F.coalesce(_isbn10(a[0].col), F.lit(False)), "bool"),
        "isisbn13": lambda tr, a: TC(F.coalesce(_isbn13(a[0].col), F.lit(False)), "bool"),
        "isisbn": lambda tr, a: TC(F.coalesce(_isbn10(a[0].col) | _isbn13(a[0].col), F.lit(False)), "bool"),
        "iscreditcard": lambda tr, a: TC(F.coalesce(_luhn(a[0].col), F.lit(False)), "bool"),
    }
    for name, pat in _CARD_RES.items():
        out[name] = _regex_bool(pat)
    return out


def _json_fns():
    def _jsonpath(a: TC) -> Column:
        return F.when(a.col.startswith("$"), a.col).otherwise(F.concat(F.lit("$."), a.col))

    return {
        "select": lambda tr, a: TC(
            F.get_json_object(a[0].col, (lambda p: p if p.startswith("$") else "$." + p)(_lit_str(a[1]))), "str"
        ),
        "parse": lambda tr, a: TC(a[0].col, "str"),
        "stringify": lambda tr, a: TC(a[0].col.cast("string"), "str"),
        "isvalid": lambda tr, a: TC(F.coalesce(F.get_json_object(a[0].col, "$").isNotNull() | F.json_array_length(a[0].col).isNotNull(), F.lit(False)), "bool"),
        "isnull": lambda tr, a: TC(a[0].col.isNull() | (F.trim(a[0].col) == "null"), "bool"),
        "isobject": lambda tr, a: TC(F.coalesce(F.trim(a[0].col).startswith("{"), F.lit(False)), "bool"),
        "isarray": lambda tr, a: TC(F.coalesce(F.trim(a[0].col).startswith("["), F.lit(False)), "bool"),
        "arraylength": lambda tr, a: TC(F.json_array_length(a[0].col), "num"),
        # FLAT-object ops via map<string,string> round-trip. Limitations
        # (documented divergence from gson's typed tree): scalar values
        # re-serialize as strings ("87"), and nested object/array values
        # get re-escaped — use only on flat JSON objects.
        "drop": lambda tr, a: TC(
            F.to_json(
                F.map_filter(
                    F.from_json(a[0].col, "map<string,string>"),
                    lambda k, v: ~k.isin([_lit_str(x) for x in a[1:]]),
                )
            ),
            "str",
        ),
        "keystolower": lambda tr, a: TC(
            F.to_json(F.transform_keys(F.from_json(a[0].col, "map<string,string>"), lambda k, v: F.lower(k))),
            "str",
        ),
    }


def _number_fns():
    return {
        "asdouble": lambda tr, a: TC(a[0].col.cast("double"), "num"),
        "asfloat": lambda tr, a: TC(a[0].col.cast("float"), "num"),
        "asinteger": lambda tr, a: TC(a[0].col.cast("int"), "num"),
        "mantissa": lambda tr, a: TC(a[0].col - F.floor(a[0].col), "num"),
    }


def _logical_fns():
    def set_bit(tr, a):
        """logical:SetBit(value, [positions], bit) — 1-based positions from
        the LSB (ref: functions/Logical.java:193-206)."""
        value = a[0].col.cast("long")
        positions = a[1].col
        bit_on = a[2].col.cast("int") > 0
        # 2^(p-1) via pow: exact for p ≤ 53, matching the reference's `1 <<
        # position` int-shift range
        mask = lambda p: F.pow(F.lit(2.0), p.cast("int") - 1).cast("long")  # noqa: E731
        return TC(
            F.aggregate(
                positions,
                value,
                lambda acc, p: F.when(bit_on, acc.bitwiseOR(mask(p))).otherwise(
                    acc.bitwiseAND(F.bitwise_not(mask(p)))
                ),
            ),
            "num",
        )

    return {
        "bitand": lambda tr, a: TC(a[0].col.bitwiseAND(a[1].col), "num"),
        "bitor": lambda tr, a: TC(a[0].col.bitwiseOR(a[1].col), "num"),
        "bitxor": lambda tr, a: TC(a[0].col.bitwiseXOR(a[1].col), "num"),
        "not": lambda tr, a: TC(
            F.when(F.coalesce(a[0].col.cast("double"), F.lit(0.0)) != 0, 0).otherwise(1), "num"
        ),
        # binary string ↔ long (ref: Logical.java:171-183)
        "bitcompress": lambda tr, a: TC(F.conv(a[0].col.cast("string"), 2, 10).cast("long"), "num"),
        "bitexpand": lambda tr, a: TC(F.conv(a[0].col.cast("string"), 10, 2), "str"),
        "setbit": set_bit,
    }


def _ddl_select(tr, a):
    """ddl:select(record, 'path') — path syntax per DDL.select
    (ref: functions/DDL.java, DDLTest.java:71-94): dotted fields
    ('rec1.s'), array indexes ('a[0]'), map keys ('m[rec2]')."""
    path = _lit_str(a[1])
    col = a[0].col
    for part in path.split("."):
        m = re.match(r"([A-Za-z0-9_]*)((?:\[[^\]]+\])*)$", part)
        if m is None:
            raise ExpressionError(f"bad ddl:select path segment {part!r}")
        name, idxs = m.group(1), m.group(2)
        if name:
            col = col.getField(name)
        for idx in re.findall(r"\[([^\]]+)\]", idxs):
            col = col.getItem(int(idx)) if idx.lstrip("-").isdigit() else col.getItem(idx)
    return TC(col, "unknown")


def _ddl_fns():
    """ddl: — schema/struct operations (ref: functions/DDL.java; CDAP
    StructuredRecord ops → Spark struct Column ops)."""
    return {
        "select": _ddl_select,
        "drop": lambda tr, a: TC(a[0].col.dropFields(*[_lit_str(x) for x in a[1:]]), "struct"),
        "json": lambda tr, a: TC(F.to_json(a[0].col), "str"),
        "parse": lambda tr, a: TC(a[0].col, "unknown"),  # schema is static here
    }


def _arith_fns():
    """arithmetic: — type-preserving ops (ref: utils/ArithmeticOperations.java:
    add/minus/multiply/divideq (quotient)/divider (remainder)/pow over
    Integer/Float/Double/BigDecimal)."""
    return {
        "add": lambda tr, a: TC(a[0].col + a[1].col, "num"),
        "minus": lambda tr, a: TC(a[0].col - a[1].col, "num"),
        "multiply": lambda tr, a: TC(a[0].col * a[1].col, "num"),
        "divideq": lambda tr, a: TC(a[0].col / a[1].col, "num"),
        "divider": lambda tr, a: TC(a[0].col % a[1].col, "num"),
        "pow": lambda tr, a: TC(F.pow(a[0].col, a[1].col), "num"),
        "lcm": lambda tr, a: TC(
            (a[0].col * a[1].col)
            / F.aggregate(
                F.sequence(F.lit(1), F.least(F.abs(a[0].col), F.abs(a[1].col)).cast("int")),
                F.lit(1),
                lambda acc, i: F.when(((a[0].col % i) == 0) & ((a[1].col % i) == 0), i).otherwise(acc),
            ),
            "num",
        ),
    }


def _decimal_fns():
    """decimal: — BigDecimal ops (ref: utils/DecimalTransform.java) on
    DecimalType columns."""
    return {
        "add": lambda tr, a: TC(a[0].col + a[1].col, "num"),
        "subtract": lambda tr, a: TC(a[0].col - a[1].col, "num"),
        "multiply": lambda tr, a: TC(a[0].col * a[1].col, "num"),
        "divide": lambda tr, a: TC(a[0].col / a[1].col, "num"),
        "abs": lambda tr, a: TC(F.abs(a[0].col), "num"),
        "negate": lambda tr, a: TC(-a[0].col, "num"),
        "pow": lambda tr, a: TC(F.pow(a[0].col, a[1].col), "num"),
        "decimal_left": lambda tr, a: TC(a[0].col * F.pow(F.lit(10), a[1].col), "num"),
        "decimal_right": lambda tr, a: TC(a[0].col / F.pow(F.lit(10), a[1].col), "num"),
        "precision": lambda tr, a: TC(
            F.length(F.regexp_replace(F.abs(a[0].col).cast("string"), r"[.]", "")), "num"
        ),
        "scale": lambda tr, a: TC(
            F.when(
                a[0].col.cast("string").contains("."),
                F.length(F.substring_index(a[0].col.cast("string"), ".", -1)),
            ).otherwise(0),
            "num",
        ),
        "unscaled": lambda tr, a: TC(
            F.regexp_replace(a[0].col.cast("string"), r"[.]", "").cast("long"), "num"
        ),
    }


def _bytes_fns():
    return {
        "tostring": lambda tr, a: TC(a[0].col.cast("string"), "str"),
        "tobytes": lambda tr, a: TC(a[0].col.cast("binary"), "bin"),
        "tohexstring": lambda tr, a: TC(F.lower(F.hex(a[0].col)), "str"),
        "toint": lambda tr, a: TC(a[0].col.cast("int"), "num"),
        "tolong": lambda tr, a: TC(a[0].col.cast("long"), "num"),
    }


_NAMESPACES: dict[str | None, dict] = {}


def _build():
    if _NAMESPACES:
        return
    _NAMESPACES[None] = _global_fns()
    _NAMESPACES["math"] = _math_fns()
    _NAMESPACES["string"] = _string_fns()
    _NAMESPACES["strings"] = _strings_fns()
    _NAMESPACES["date"] = _date_fns()
    _NAMESPACES["dq"] = _dq_fns()
    _NAMESPACES["json"] = _json_fns()
    _NAMESPACES["number"] = _number_fns()
    _NAMESPACES["logical"] = _logical_fns()
    _NAMESPACES["bytes"] = _bytes_fns()
    _NAMESPACES["ddl"] = _ddl_fns()
    _NAMESPACES["arithmetic"] = _arith_fns()
    _NAMESPACES["decimal"] = _decimal_fns()
    from wrangler_spark.expression.datetime_fns import datetime_fns
    from wrangler_spark.expression.geo_escape_fns import escape_fns, geo_fns

    _NAMESPACES["datetime"] = datetime_fns()
    _NAMESPACES["geo"] = geo_fns()
    _NAMESPACES["escape"] = escape_fns()


def dispatch(tr: Translator, ns: str | None, name: str, args: list[TC], raw_args) -> TC:
    _build()
    table = _NAMESPACES.get(ns)
    if table is None:
        raise ExpressionError(f"unknown EL namespace '{ns}:'")
    fn = table.get(name.lower())
    if fn is None:
        raise ExpressionError(f"unknown EL function {ns + ':' if ns else ''}{name}()")
    return fn(tr, args)
