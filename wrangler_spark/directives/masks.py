"""Masking directives.

mask-number compiles the reference's pattern walk
(``transformation/MaskNumber.java:121-147``) into a JVM-side
``aggregate`` over the pattern characters — no Python per row. The walk
keeps a (value-index, output) accumulator because literal pattern chars
consume a value char only when it matches.

mask-shuffle (``transformation/MaskShuffle.java:80``) replaces consonants/
vowels/digits with a java.util.Random(seed=0) draw from the same class —
we replicate Java's LCG exactly in an Arrow-batched pandas UDF for value
parity with the reference.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from wrangler_spark.context import CompileContext
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive


@directive
class MaskNumber(Directive):
    """mask-number :col 'pattern' — '#' keeps the digit, 'x'/'X' masks,
    other chars are literals that consume a matching value char."""

    name = "mask-number"
    usage = [Arg("column", TokenType.COLUMN), Arg("pattern", TokenType.TEXT)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        pattern = self.args["pattern"]
        value = F.col(col).cast("string")

        # fast path: patterns of only '#'/'x' are purely positional — the
        # cursor equals the pattern index, so the walk collapses to a
        # concat of substrings and literal runs (no aggregate state)
        if set(pattern) <= {"#", "x", "X"}:
            parts = []
            i = 0
            while i < len(pattern):
                ch = pattern[i]
                j = i
                while j < len(pattern) and pattern[j] == ch:
                    j += 1
                run = j - i
                if ch == "#":
                    parts.append(F.coalesce(value.substr(i + 1, run), F.lit("")))
                else:
                    parts.append(F.lit("x" * run))
                i = j
            masked = F.concat(*parts)
            # both CASE branches must be STRING: under ANSI (driver default)
            # when(null, numeric_col).otherwise(string) coerces string→numeric
            # and CAST_INVALID_INPUT explodes on 'x'-masked output.
            return df.withColumn(col, F.when(value.isNull(), value).otherwise(masked))

        # accumulator: struct(i: value cursor, s: output string)
        def step(acc, pc):
            i, s = acc.getField("i"), acc.getField("s")
            cur = value.substr(i + 1, F.lit(1))
            is_hash = pc == "#"
            is_x = (pc == "x") | (pc == "X")
            in_range = i < F.length(value)
            ni = (
                F.when(is_hash & in_range, i + 1)
                .when(is_hash, i)
                .when(is_x, i + 1)
                .when(in_range & (cur == pc), i + 1)
                .otherwise(i)
            )
            ns = (
                F.when(is_hash & in_range, F.concat(s, cur))
                .when(is_hash, s)
                .when(is_x, F.concat(s, F.lit("x")))
                .otherwise(F.concat(s, pc))
            )
            return F.struct(ni.alias("i"), ns.alias("s"))

        masked = F.aggregate(
            F.array(*[F.lit(ch) for ch in pattern]),
            F.struct(F.lit(0).alias("i"), F.lit("").alias("s")),
            step,
            lambda acc: acc.getField("s"),
        )
        # reference: null value → row untouched; missing column → empty string.
        # null branch uses the string-cast value (not F.col) — see fast path.
        return df.withColumn(col, F.when(value.isNull(), value).otherwise(masked))


# --- java.util.Random replication (seed fixed at 0 by the reference) -------

_CONS = "bcdfghjklmnpqrstvwxz"
_VOWEL = "aeiouy"
_DIGIT = "0123456789"


class _JavaRandom:
    """Bit-exact java.util.Random (public LCG: seed*0x5DEECE66D+0xB mod 2^48)."""

    def __init__(self, seed: int):
        self.seed = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError
        if (bound & -bound) == bound:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) < (1 << 31):
                return val


def _mask_shuffle_value(s: str) -> str:
    rng = _JavaRandom(0)
    out = []
    for ch in s:
        ln = ch.lower()
        if ln in _CONS:
            c = _CONS[rng.next_int(len(_CONS))]
            out.append(c.upper() if ln != ch else c)
        elif ln in _VOWEL:
            c = _VOWEL[rng.next_int(len(_VOWEL))]
            out.append(c.upper() if ln != ch else c)
        elif ln in _DIGIT:
            c = _DIGIT[rng.next_int(len(_DIGIT))]
            out.append(c.upper() if ln != ch else c)
        else:
            out.append(ch)
    return "".join(out)


@pandas_udf(StringType())
def _mask_shuffle_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else _mask_shuffle_value(str(v)))


@directive
class MaskShuffle(Directive):
    """mask-shuffle :col — deterministic per-char class shuffle
    (ref: transformation/MaskShuffle.java:80, Random seed 0)."""

    name = "mask-shuffle"
    usage = [Arg("column", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        return df.withColumn(col, _mask_shuffle_udf(F.col(col).cast("string")))
