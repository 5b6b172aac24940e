"""Encode/decode/hash/charset directives (SURVEY §2.6) — native where Spark
has the codec (base64/hex/sha/md5), tiny Arrow UDF for base32 only.
"""

from __future__ import annotations

import base64

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from wrangler_spark.context import CompileContext
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.errors import DirectiveApplyError
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive


@pandas_udf(StringType())
def _b32_encode(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else base64.b32encode(str(v).encode()).decode())


@pandas_udf(StringType())
def _b32_decode(s: pd.Series) -> pd.Series:
    def dec(v):
        if v is None:
            return None
        try:
            return base64.b32decode(str(v)).decode(errors="replace")
        except Exception:
            return None

    return s.map(dec)


@directive
class Encode(Directive):
    """encode base32|base64|hex :col → adds col_encode_<method>
    (ref: transformation/Encode.java:104)."""

    name = "encode"
    usage = [Arg("method", TokenType.IDENTIFIER), Arg("column", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        method = str(self.args["method"]).lower()
        c = F.col(col).cast("string")
        if method == "base64":
            out = F.base64(c.cast("binary"))
        elif method == "hex":
            out = F.lower(F.hex(c))
        elif method == "base32":
            out = _b32_encode(c)
        else:
            raise DirectiveApplyError(f"unknown encode method '{method}'")
        return df.withColumn(f"{col}_encode_{method}", out)


@directive
class Decode(Directive):
    """decode base32|base64|hex :col → adds col_decode_<method>
    (ref: transformation/Decode.java:104)."""

    name = "decode"
    usage = [Arg("method", TokenType.IDENTIFIER), Arg("column", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        method = str(self.args["method"]).lower()
        c = F.col(col).cast("string")
        if method == "base64":
            out = F.unbase64(c).cast("string")
        elif method == "hex":
            out = F.unhex(c).cast("string")
        elif method == "base32":
            out = _b32_decode(c)
        else:
            raise DirectiveApplyError(f"unknown decode method '{method}'")
        return df.withColumn(f"{col}_decode_{method}", out)


@directive
class MessageHash(Directive):
    """hash :col algo [encode] — digest the column in place
    (ref: transformation/MessageHash.java:157). Native: MD5/SHA-1/SHA-2
    family/CRC32; others raise (hashlib UDF can be added per algo).
    encode=true (default) → hex string; false → binary."""

    name = "hash"
    usage = [
        Arg("column", TokenType.COLUMN),
        Arg("algo", TokenType.IDENTIFIER),
        Arg("encode", TokenType.BOOL, optional=True, default=True),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        algo = str(self.args["algo"]).upper().replace("_", "-")
        c = F.col(col).cast("string")
        if algo == "MD5":
            hexed = F.md5(c)
        elif algo == "SHA-1" or algo == "SHA1":
            hexed = F.sha1(c)
        elif algo in ("SHA-224", "SHA-256", "SHA-384", "SHA-512"):
            hexed = F.sha2(c, int(algo.split("-")[1]))
        elif algo == "CRC32":
            hexed = F.lower(F.hex(F.crc32(c.cast("binary"))))
        else:
            raise DirectiveApplyError(
                f"hash algorithm '{algo}' not supported natively "
                "(MD5, SHA-1, SHA-224/256/384/512, CRC32 are)"
            )
        out = hexed if self.args["encode"] else F.unhex(hexed)
        return df.withColumn(col, out)


@directive
class SetCharset(Directive):
    """set-charset :col 'charset' — decode binary → string
    (ref: language/SetCharset.java:77)."""

    name = "set-charset"
    usage = [Arg("column", TokenType.COLUMN), Arg("charset", TokenType.TEXT)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        return df.withColumn(col, F.decode(F.col(col), self.args["charset"]))
