"""Structured Streaming support.

The reference engine is record-at-a-time and stateless per record
(SURVEY §2.12), so a compiled recipe applies to a streaming DataFrame
unchanged — the same directive chain becomes `readStream → plan →
writeStream`. The deltas handled here:

- parse directives that sample at compile time get a static ``sample_df``
  (a stream can't be collected) — same answer the reference's workspace
  sample provides its service path;
- ``fail`` checks and ``observe``-based transient variables are rejected
  up front with clear errors where Structured Streaming can't express
  them;
- windowed aggregation + watermark helpers cover the streaming-native
  surface (late data, sessionization, streaming dedup) the reference
  lacks but a Spark user expects.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wrangler_spark.context import CompileContext
from wrangler_spark.errors import WranglerError
from wrangler_spark.pipeline import Pipeline, PipelineResult


def transform_stream(
    pipeline: Pipeline,
    stream_df: DataFrame,
    sample_df: DataFrame | None = None,
) -> PipelineResult:
    """Apply a compiled recipe to a streaming DataFrame. ``sample_df`` is a
    static frame with the same schema used for compile-time schema
    sampling (CSV arity, JSON schema inference...)."""
    if not stream_df.isStreaming:
        raise WranglerError("transform_stream expects a streaming DataFrame")
    ctx = CompileContext(environment="streaming", sample_df=sample_df)
    result = pipeline.transform(stream_df, ctx)
    if ctx.fail_checks:
        raise WranglerError(
            "the 'fail' directive requires a blocking count and cannot run on "
            "a stream — use send-to-error to route bad rows instead"
        )
    return result


def with_watermark(df: DataFrame, ts_col: str, delay: str = "10 minutes") -> DataFrame:
    return df.withWatermark(ts_col, delay)


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window: str,
    aggs: dict[str, Column],
    slide: str | None = None,
    watermark: str | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling/sliding window aggregation with optional watermark — the
    canonical late-data-tolerant streaming rollup."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    group_cols = [w] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*group_cols).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in (keys or [])],
        *[F.col(n) for n in aggs],
    )


def streaming_dedup(
    df: DataFrame, keys: list[str], ts_col: str | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key streaming dedup; with a watermark the state
    store stays bounded (keys older than the watermark are dropped)."""
    if ts_col:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def streaming_near_dedup(
    df: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    watermark: str = "1 hour",
    bits: int = 32,
    prefix_bits: int = 16,
) -> DataFrame:
    """Streaming NEAR-dedup: the first document per SimHash-prefix bucket
    (within the watermark) survives; later documents whose simhash agrees
    on the top ``prefix_bits`` collapse onto it. All columns pass through
    plus the computed ``simhash``.

    Why this shape for streams: the batch near-dup paths (MinHash band
    pairing, ngram prefix joins) need self-joins or multi-op stateful
    chains that Structured Streaming restricts; a SimHash prefix bucket
    needs exactly ONE stateful operator (dropDuplicatesWithinWatermark on
    the bucket), the signature itself is pure scan-side expression work,
    and the state store holds one row per bucket bounded by the
    watermark. The trade, documented: granularity is the bucket — two
    docs collapse iff their top prefix_bits agree (coarser than a
    Hamming-distance test; raise prefix_bits to split more, lower it to
    collapse more). Works identically on a batch frame (plain
    dropDuplicates) for backfill/testing parity."""
    from wrangler_spark.datapipe.dedup import _hash28, normalize_text, simhash_expr

    staged = df.withColumn(
        "__h",
        F.transform(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " ")), _hash28
        ),
    )
    out = staged.withColumn("simhash", simhash_expr(F.col("__h"), bits)).withColumn(
        "__bucket", F.shiftright(F.col("simhash"), bits - int(prefix_bits))
    )
    if ts_col and out.isStreaming:
        out = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["__bucket"])
    else:
        out = out.dropDuplicates(["__bucket"])
    return out.drop("__h", "__bucket")


def run_to_memory(df: DataFrame, name: str, timeout: int = 60, output_mode: str | None = None):
    """Test helper: drain all available input into an in-memory table.
    Windowed aggregations need output_mode='complete' to see the still-open
    last window (append mode only emits watermark-closed windows)."""
    w = df.writeStream.format("memory").queryName(name).trigger(availableNow=True)
    if output_mode:
        w = w.outputMode(output_mode)
    q = w.start()
    q.awaitTermination(timeout)
    return q


def streaming_near_dedup_against(
    stream_df: DataFrame,
    static_old: DataFrame,
    text_col: str,
    old_text_col: str | None = None,
    bits: int = 32,
    prefix_bits: int = 16,
) -> DataFrame:
    """Streaming INCREMENTAL near-dedup: flag each arriving document
    whose SimHash-prefix bucket already exists in a STATIC accumulated
    corpus — the streaming counterpart of minhash_pairs_against, with the
    same granularity trade as streaming_near_dedup (bucket = top
    ``prefix_bits`` of the simhash; raise to split more). Adds
    ``simhash`` and ``is_dup`` to the stream, all rows pass through.

    Why this shape: a stream cannot self-join or run LSH band pairing
    (multi-stateful-op restriction), but a stream-STATIC equi-join is
    unrestricted and stateless — the old corpus collapses to its DISTINCT
    bucket ids once (materialize that frame across batches in
    production), and each micro-batch is a scan-side signature + one
    broadcast-or-hash join. Works identically on a batch frame for
    backfill parity (tested both ways)."""
    from wrangler_spark.datapipe.dedup import _hash28, normalize_text, simhash_expr

    def bucket_of(c):
        h = F.transform(F.array_distinct(F.split(normalize_text(c), " ")), _hash28)
        return F.shiftright(simhash_expr(h, bits), bits - int(prefix_bits))

    old_buckets = (
        static_old.select(bucket_of(F.col(old_text_col or text_col)).alias("__bucket"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    staged = stream_df.withColumn(
        "__h",
        F.transform(
            F.array_distinct(F.split(normalize_text(F.col(text_col)), " ")), _hash28
        ),
    ).withColumn("simhash", simhash_expr(F.col("__h"), bits)).withColumn(
        "__bucket", F.shiftright(F.col("simhash"), bits - int(prefix_bits))
    )
    return (
        staged.join(old_buckets, "__bucket", "left")
        .withColumn("is_dup", F.col("__hit").isNotNull())
        .drop("__h", "__bucket", "__hit")
    )


def ingest_monitor(
    stream_df: DataFrame,
    static_old: DataFrame,
    ts_col: str,
    text_col: str,
    window: str = "1 minute",
    watermark: str = "5 minutes",
    old_text_col: str | None = None,
) -> DataFrame:
    """Live ingestion health: per event-time window, how many documents
    arrived and how many exactly duplicate the ACCUMULATED corpus —
    (window_start, window_end, n_docs, n_dups, dup_rate). The streaming
    dashboard feed of an incremental pipeline: a dup_rate spike means a
    re-crawl/replay is flooding the ingest and downstream dedup is about
    to pay for it.

    Plan shape: scan-side md5 key, stream-static LEFT join against the
    old corpus' distinct key set (stateless per micro-batch), then ONE
    watermarked tumbling-window aggregate — a single stateful operator,
    state bounded by the watermark. Works on a batch frame identically
    for backfill."""
    from wrangler_spark.datapipe.dedup import normalize_text

    key = F.md5(normalize_text(F.col(text_col)))
    old_keys = (
        static_old.select(
            F.md5(normalize_text(F.col(old_text_col or text_col))).alias("__k")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    keyed = stream_df.withColumn("__k", key).join(old_keys, "__k", "left")
    if keyed.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
    agg = keyed.groupBy(F.window(F.col(ts_col), window)).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count("__hit").cast("long").alias("n_dups"),
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_docs",
        "n_dups",
        F.round(F.col("n_dups") / F.greatest(F.col("n_docs"), F.lit(1)), 6).alias("dup_rate"),
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    lower: str = "0 seconds",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked STREAM-STREAM equi-join with a time-interval bound —
    the click-attribution shape: each right-side row (click) joins
    left-side rows (impressions) with the same ``on`` key whose
    ``left_ts`` lies in ``[right_ts - upper, right_ts - lower]``.

    The interval condition is what makes unbounded stream-stream state
    finite: with both sides watermarked, Spark can expire an impression
    once the watermark passes ``left_ts + upper`` — without it the join
    would buffer both streams forever (and Spark rejects it). State per
    key ≈ rows inside one interval window, independent of stream age —
    the property that survives a month-long run at production rates.

    ``how``: "inner", or "leftOuter"/"rightOuter" toward the side whose
    unmatched rows you need (emitted only when the watermark CLOSES the
    interval — a one-shot availableNow run that ends before the
    watermark advances may hold them back; that is Structured
    Streaming's documented outer-join semantics, not row loss). Both
    inputs must be streaming frames; use a plain join (or asof_join)
    when one side is static."""
    allowed = ("inner", "leftOuter", "left_outer", "rightOuter", "right_outer")
    if how not in allowed:
        raise ValueError(f"how must be one of {allowed}, got {how!r}")
    if not (left.isStreaming and right.isStreaming):
        raise ValueError(
            "interval_join_stream needs two STREAMING frames — with a "
            "static side use a plain broadcast join (no state to bound)")
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"l.{left_ts}") >= F.expr(f"r.{right_ts} - INTERVAL {upper}"))
        & (F.col(f"l.{left_ts}") <= F.expr(f"r.{right_ts} - INTERVAL {lower}"))
    )
    return lw.join(rw, cond, how)
