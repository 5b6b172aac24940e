"""Output formatters — serialize rows/columns into a string cell
(SURVEY §2.2). Sinks proper are `df.write`/connectors, outside the recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrangler_spark.context import CompileContext
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive


@directive
class WriteAsCSV(Directive):
    """write-as-csv :col — whole row as one CSV line
    (ref: writer/WriteAsCSV.java:74)."""

    name = "write-as-csv"
    usage = [Arg("column", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        cols = [F.col(c).cast("string") for c in df.columns]
        return df.withColumn(self.args["column"], F.to_csv(F.struct(*cols)))


@directive
class WriteAsJsonMap(Directive):
    """write-as-json-map :col — whole row as a JSON object
    (ref: writer/WriteAsJsonMap.java:73)."""

    name = "write-as-json-map"
    usage = [Arg("column", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        return df.withColumn(self.args["column"], F.to_json(F.struct(*[F.col(c) for c in df.columns])))


@directive
class WriteAsJsonObject(Directive):
    """write-as-json-object :dst :c1[,:c2...] — selected columns as a JSON
    object in dst (ref: writer/WriteAsJsonObject.java:78)."""

    name = "write-as-json-object"
    usage = [Arg("destination", TokenType.COLUMN), Arg("columns", TokenType.COLUMN_LIST)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        cols = ctx.resolve_all(df, self.args["columns"])
        return df.withColumn(self.args["destination"], F.to_json(F.struct(*[F.col(c) for c in cols])))
