"""Recipe-surface wrappers for the datapipe operators, so the
training-data ops are usable as one-line directives alongside the
reference-parity set."""

from __future__ import annotations

from pyspark.sql import DataFrame

from wrangler_spark.context import CompileContext
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive


@directive
class DedupExact(Directive):
    """dedup-exact :id :text — hash-groupBy exact dedup on normalized text;
    result is (id, n_dups) per distinct content."""

    name = "dedup-exact"
    usage = [Arg("id", TokenType.COLUMN), Arg("text", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.datapipe.dedup import exact_dedup

        return exact_dedup(df, ctx.resolve(df, self.args["id"]), ctx.resolve(df, self.args["text"]))


@directive
class LangId(Directive):
    """langid :text — stopword-density language heuristic → lang_pred."""

    name = "langid"
    usage = [Arg("text", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.datapipe.text import langid

        return langid(df, ctx.resolve(df, self.args["text"]))


@directive
class QualityScore(Directive):
    """quality-score :text — composite corpus-quality score → quality."""

    name = "quality-score"
    usage = [Arg("text", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.datapipe.text import quality_score

        return quality_score(df, ctx.resolve(df, self.args["text"]))


@directive
class TokenCount(Directive):
    """token-count :text — whitespace + regex-subword token counts →
    n_tokens_ws, n_tokens."""

    name = "token-count"
    usage = [Arg("text", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.datapipe.text import token_count

        return token_count(df, ctx.resolve(df, self.args["text"]))


@directive
class Fingerprint(Directive):
    """fingerprint :text — sorted-distinct-token md5 fingerprint →
    fingerprint."""

    name = "fingerprint"
    usage = [Arg("text", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.datapipe.text import fingerprint

        return fingerprint(df, ctx.resolve(df, self.args["text"]))


@directive
class RepetitionStats(Directive):
    """repetition-stats :text — within-document repetition ratios
    (Gopher A1.1): dup_line_ratio, dup_line_char_ratio, dup_word_ratio."""

    name = "repetition-stats"
    usage = [Arg("text", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.datapipe.text import repetition_stats

        return repetition_stats(df, ctx.resolve(df, self.args["text"]))


@directive
class GopherQuality(Directive):
    """gopher-quality :text — Gopher/MassiveText quality-rule flags
    (g_word_count, g_mean_word_len, g_symbol_ratio, g_bullet_ratio,
    g_ellipsis_ratio, g_alpha_ratio, g_stopwords) + gopher_pass."""

    name = "gopher-quality"
    usage = [Arg("text", TokenType.COLUMN)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.datapipe.text import gopher_quality

        return gopher_quality(df, ctx.resolve(df, self.args["text"]))
