"""Text-analysis operators for corpus curation: language-ID heuristic,
quality scoring, token counting, document fingerprinting.

All native Column expressions. Tokenization is staged as its own
projection (`__words`) before any expression that references it more than
once — Spark does not common-subexpression-eliminate inside higher-order
lambdas, so an inlined split+regex would re-run per reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wrangler_spark.datapipe.constants import EN_STOPWORDS

# GPT-2-ish pre-tokenizer approximation: letter runs, digit runs,
# punctuation runs (kept regex-dialect-neutral so the DuckDB oracle
# counts identically).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"

_W = "__words"


def _with_words(df: DataFrame, text_col: str) -> DataFrame:
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(_W, F.split(norm, " "))


def _stopword_ratio() -> Column:
    words = F.col(_W)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_sw = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    return F.round(n_sw.cast("double") / F.greatest(F.size(words), F.lit(1)).cast("double"), 6)


def langid(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Stopword-density language heuristic: en if ≥ 5% of tokens are
    English stopwords (the classic cheap n-gram/stopword LID baseline)."""
    staged = _with_words(df, text_col)
    out = staged.withColumn(
        out_col, F.when(_stopword_ratio() >= 0.05, F.lit("en")).otherwise(F.lit("unknown"))
    )
    return out.drop(_W)


def quality_score(df: DataFrame, text_col: str, out_col: str = "quality") -> DataFrame:
    """Composite [0,1] quality score: length, stopword density, alpha ratio,
    mean word length — the usual cheap pretraining-corpus filters."""
    c = F.col(text_col)
    staged = _with_words(df, text_col)
    n_chars = F.length(c).cast("double")
    n_words = F.size(F.col(_W)).cast("double")
    mean_wlen = F.round(n_chars / F.greatest(n_words, F.lit(1.0)), 6)
    alpha_ratio = F.round(
        F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
        / F.greatest(n_chars, F.lit(1.0)),
        6,
    )
    len_score = F.least(n_chars / 500.0, F.lit(1.0))
    sw_score = F.least(_stopword_ratio() * 5.0, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0).otherwise(0.5)
    score = F.round(0.3 * len_score + 0.3 * sw_score + 0.2 * alpha_ratio + 0.2 * wlen_score, 6)
    return staged.withColumn(out_col, score).drop(_W)


def token_count(df: DataFrame, text_col: str, out_col: str = "n_tokens") -> DataFrame:
    """Whitespace word count + regex sub-word token count."""
    c = F.col(text_col)
    df = df.withColumn(f"{out_col}_ws", F.size(F.split(F.trim(c), r"\s+")).cast("long"))
    return df.withColumn(out_col, F.regexp_count(c, F.lit(TOKEN_RE)).cast("long"))


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set (the OpenRefine 'fingerprint' method)."""
    staged = _with_words(df, text_col)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.col(_W)))))
    return staged.withColumn(out_col, fp).drop(_W)
