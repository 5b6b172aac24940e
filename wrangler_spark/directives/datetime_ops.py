"""Date/time column directives (SURVEY §2.6 datetime rows) — all native.

Type mapping pinned per SURVEY §1.5: ZonedDateTime → TimestampType (UTC
session zone), LocalDateTime → TimestampNTZType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrangler_spark.context import CompileContext
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive


@directive
class FormatDate(Directive):
    """format-date :col 'fmt' — timestamp → formatted string
    (ref: date/FormatDate.java:78)."""

    name = "format-date"
    usage = [Arg("column", TokenType.COLUMN), Arg("format", TokenType.TEXT)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        return df.withColumn(col, F.date_format(F.col(col), self.args["format"]))


@directive
class FormatDateTime(Directive):
    """format-datetime :col 'fmt' — datetime (NTZ) → string
    (ref: datetime/FormatDateTime.java:77)."""

    name = "format-datetime"
    usage = [Arg("column", TokenType.COLUMN), Arg("format", TokenType.TEXT)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        return df.withColumn(col, F.date_format(F.col(col), self.args["format"]))


@directive
class DiffDate(Directive):
    """diff-date :col1 :col2 :dst — milliseconds between two timestamps
    (ref: date/DiffDate.java:79)."""

    name = "diff-date"
    usage = [
        Arg("col1", TokenType.COLUMN),
        Arg("col2", TokenType.COLUMN),
        Arg("destination", TokenType.COLUMN),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        c1 = ctx.resolve(df, self.args["col1"])
        c2 = ctx.resolve(df, self.args["col2"])
        return df.withColumn(
            self.args["destination"], F.unix_millis(F.col(c1)) - F.unix_millis(F.col(c2))
        )


@directive
class DatetimeToTimestamp(Directive):
    """datetime-to-timestamp :col [zone] — NTZ datetime + zone → UTC
    timestamp (ref: datetime/DateTimeToTimeStamp.java:82)."""

    name = "datetime-to-timestamp"
    usage = [Arg("column", TokenType.COLUMN), Arg("zone", TokenType.TEXT, optional=True, default="UTC")]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        return df.withColumn(col, F.to_utc_timestamp(F.col(col), self.args["zone"]))


@directive
class TimestampToDatetime(Directive):
    """timestamp-to-datetime :col — timestamp → NTZ datetime
    (ref: datetime/TimestampToDateTime.java:63)."""

    name = "timestamp-to-datetime"
    usage = [Arg("column", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        return df.withColumn(col, F.col(col).cast("timestamp_ntz"))


@directive
class CurrentDatetime(Directive):
    """current-datetime :col [zone] — now() per run
    (ref: datetime/CurrentDateTime.java:82)."""

    name = "current-datetime"
    usage = [Arg("column", TokenType.COLUMN), Arg("zone", TokenType.TEXT, optional=True, default="UTC")]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        zone = self.args["zone"]
        ts = F.from_utc_timestamp(F.current_timestamp(), zone).cast("timestamp_ntz")
        return df.withColumn(self.args["column"], ts)
