"""Transient-variable directives (SURVEY §2.8) — the compat subset.

The reference's TransientStore is per-batch mutable state; the pipeline
plugin resets it per record (``Wrangler.java:377-379``), so cross-record
accumulation only ever worked on the single-batch service path. Our
distributed semantics (documented):

- ``increment-variable var n exp:{cond}`` → the FINAL value is the sum of
  n over rows matching cond, computed via ``df.observe`` (zero extra pass,
  metrics surface on the first action) and also exposed through
  ``CompileContext.observations``.
- ``set-variable var exp:{...}`` → recorded as a named expression usable in
  later expressions of the same recipe (per-row, stateless) — matches the
  LOCAL-scope behavior, not order-dependent GLOBAL mutation, which has no
  scalable equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrangler_spark.context import CompileContext
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive


@directive
class SetVariable(Directive):
    """set-variable var exp:{...} (ref: aggregates/SetTransientVariable.java:82)."""

    name = "set-variable"
    usage = [Arg("variable", TokenType.IDENTIFIER), Arg("expression", TokenType.EXPRESSION)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.expression import compile_expression
        from wrangler_spark.expression.translator import TC

        col = compile_expression(self.args["expression"], df, ctx.variables)
        ctx.variables[self.args["variable"]] = TC(col, "unknown")
        return df


@directive
class IncrementVariable(Directive):
    """increment-variable var n exp:{cond}
    (ref: aggregates/IncrementTransientVariable.java:79)."""

    name = "increment-variable"
    usage = [
        Arg("variable", TokenType.IDENTIFIER),
        Arg("amount", TokenType.NUMERIC),
        Arg("condition", TokenType.EXPRESSION),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from pyspark.sql import Observation

        from wrangler_spark.expression import compile_condition

        var = self.args["variable"]
        cond = compile_condition(self.args["condition"], df, ctx.variables)
        cond = cond.isNotNull() & cond
        metric = F.sum(F.when(cond, F.lit(self.args["amount"])).otherwise(F.lit(0))).alias(var)
        obs = Observation(f"wrangler_{var}")
        ctx.observations[var] = obs  # read via PipelineResult.variable(var)
        return df.observe(obs, metric)
