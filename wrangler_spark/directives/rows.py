"""Row-level directives: filters, error routing, row generators
(SURVEY §2.4, §2.5).

Filters compile to `df.filter` so Catalyst can push them toward the scan.
The error channel is a plan split (ctx.route_errors), not a per-row catch —
parity with ``RecipePipelineExecutor.java:134-149`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrangler_spark.context import CompileContext, FailCheck
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive, registry


@directive
class FilterRow(Directive):
    """filter-row exp:{...} [true|false] — row is REMOVED when the
    condition is true (flag false inverts)
    (ref: row/RecordConditionFilter.java:90)."""

    name = "filter-row"
    is_filter = True
    usage = [
        Arg("condition", TokenType.EXPRESSION),
        Arg("type", TokenType.BOOL, optional=True, default=True),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.expression import compile_condition

        cond = compile_condition(self.args["condition"], df, ctx.variables)
        # SQL three-valued semantics: a null condition drops the row in both
        # directions. The reference would NPE on a null JEXL boolean
        # (RecordConditionFilter unboxes getBoolean()), so no behavior is
        # being silently changed — and plain NOT(cond) lets Catalyst push
        # the conjuncts all the way into the parquet scan.
        return df.filter(~cond if self.args["type"] else cond)


registry.alias("filter-row-if-true", "filter-row")
registry.alias("filter-rows-on", "filter-row")


@directive
class FilterByRegex(Directive):
    """filter-by-regex if-matched|if-not-matched :col 'regex' — anchored
    full match (Java String.matches) drops the row
    (ref: row/RecordRegexFilter.java:92)."""

    name = "filter-by-regex"
    is_filter = True
    usage = [
        Arg("mode", TokenType.IDENTIFIER),
        Arg("column", TokenType.COLUMN),
        Arg("regex", TokenType.TEXT),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        mode = str(self.args["mode"]).lower()
        regex = self.args["regex"]
        if regex == "null":
            matched = F.col(col).isNull()
        else:
            matched = F.coalesce(F.col(col).cast("string").rlike(f"^(?:{regex})$"), F.lit(False))
        if mode == "if-matched":
            return df.filter(~matched)
        if mode == "if-not-matched":
            return df.filter(matched)
        from wrangler_spark.errors import DirectiveApplyError

        raise DirectiveApplyError("mode must be if-matched or if-not-matched")


@directive
class FilterEmptyOrNull(Directive):
    """filter-empty-or-null :c1[,:c2...] — drop row when ALL listed columns
    are null/empty (ref: row/RecordMissingOrNullFilter.java:70)."""

    name = "filter-empty-or-null"
    is_filter = True
    usage = [Arg("columns", TokenType.COLUMN_LIST)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        cols = ctx.resolve_all(df, self.args["columns"])
        all_missing = None
        for c in cols:
            miss = F.col(c).isNull() | (F.trim(F.col(c).cast("string")) == "")
            all_missing = miss if all_missing is None else (all_missing & miss)
        return df.filter(~all_missing) if all_missing is not None else df


@directive
class SendToError(Directive):
    """send-to-error exp:{...} [metric] [message] — matching rows leave the
    clean flow and land on the error channel
    (ref: row/SendToError.java:99)."""

    name = "send-to-error"
    is_filter = True
    usage = [
        Arg("condition", TokenType.EXPRESSION),
        Arg("metric", TokenType.IDENTIFIER, optional=True),
        Arg("message", TokenType.TEXT, optional=True),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.expression import compile_expression

        cond = compile_expression(self.args["condition"], df, ctx.variables)
        msg = self.args.value("message") or self.args["condition"]
        return ctx.route_errors(df, cond, self.name, msg)


@directive
class SendToErrorAndContinue(Directive):
    """send-to-error-and-continue exp:{...} — copy matching rows to the
    error channel, keep processing them (ref: row/SendToErrorAndContinue.java:99)."""

    name = "send-to-error-and-continue"
    usage = [
        Arg("condition", TokenType.EXPRESSION),
        Arg("metric", TokenType.IDENTIFIER, optional=True),
        Arg("message", TokenType.TEXT, optional=True),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.expression import compile_expression

        cond = compile_expression(self.args["condition"], df, ctx.variables)
        msg = self.args.value("message") or self.args["condition"]
        return ctx.copy_errors(df, cond, self.name, msg)


@directive
class Fail(Directive):
    """fail exp:{...} — abort the run when any row matches
    (ref: row/Fail.java:81). Deferred to PipelineResult.check()."""

    name = "fail"
    usage = [Arg("condition", TokenType.EXPRESSION), Arg("message", TokenType.TEXT, optional=True)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.expression import compile_condition

        from wrangler_spark.expression.translator import cond_true as _ct

        cond = _ct(compile_condition(self.args["condition"], df, ctx.variables))
        msg = self.args.value("message") or self.args["condition"]
        ctx.fail_checks.append(FailCheck(self.name, msg, df, cond))
        return df


@directive
class Flatten(Directive):
    """flatten :c1[,:c2...] — index-aligned zip-explode of array columns to
    the max length; scalars copied; short arrays padded with null
    (ref: row/Flatten.java:78-155). Implemented with arrays_zip + explode —
    a narrow transformation, no shuffle."""

    name = "flatten"
    usage = [Arg("columns", TokenType.COLUMN_LIST)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        cols = ctx.resolve_all(df, self.args["columns"])
        dtypes = dict(df.dtypes)
        arr_cols = [c for c in cols if dtypes[c].startswith("array")]
        if not arr_cols:
            return df
        if len(arr_cols) == 1:
            c = arr_cols[0]
            # explode_outer keeps rows whose array is null/empty (ref: max==0 row kept)
            return df.withColumn(c, F.explode_outer(c))
        zipped = F.arrays_zip(*[F.col(c) for c in arr_cols])
        tmp = "__flat"
        out = df.withColumn(tmp, F.explode_outer(zipped))
        for c in arr_cols:
            out = out.withColumn(c, F.col(tmp).getField(c))
        return out.drop(tmp)


@directive
class SplitToRows(Directive):
    """split-to-rows :col 'regex' — one row per split part
    (ref: row/SplitToRows.java:75)."""

    name = "split-to-rows"
    usage = [Arg("column", TokenType.COLUMN), Arg("regex", TokenType.TEXT)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        col = ctx.resolve(df, self.args["column"])
        return df.withColumn(col, F.explode(F.split(F.col(col), self.args["regex"], -1)))


@directive
class SetRecordDelim(Directive):
    """set-record-delim :col 'delimiter' [limit] — split a column into one
    row per segment (ref: row/SetRecordDelimiter.java:82)."""

    name = "set-record-delim"
    usage = [
        Arg("column", TokenType.COLUMN),
        Arg("delimiter", TokenType.TEXT),
        Arg("limit", TokenType.NUMERIC, optional=True, default=-1),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        import re as _re

        col = ctx.resolve(df, self.args["column"])
        limit = int(self.args["limit"])
        parts = F.split(F.col(col), _re.escape(self.args["delimiter"]), limit if limit > 0 else -1)
        return df.withColumn(col, F.explode(parts))
