"""Sessionization — group per-key events into sessions split by an
inactivity gap. Beyond-reference extension (SURVEY §2.12): the reference
engine has no cross-row state at all; this is the canonical stateful
operator a training-data/event pipeline needs.

Two implementations with identical semantics:

- ``sessionize`` (batch): pure window functions — ``lag`` to detect gap
  starts, running ``sum`` to number sessions. One shuffle on the key
  column; at 100 TB this is a single hash-partitioned sort per key group,
  no UDFs, fully codegen'd, and the plan is DuckDB-oracle-able.
- ``sessionize_stream`` (streaming): ``applyInPandasWithState`` with an
  event-time timeout — state per key is (session_start, last_ts, count),
  bounded by the watermark; closed sessions are emitted when the timeout
  fires. Arrow-batched, one state row per live key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from wrangler_spark.datapipe.events import _umicros  # NTZ-tolerant micros


def sessionize(
    df: DataFrame, key_col: str, ts_col: str, gap_minutes: float = 30.0
) -> DataFrame:
    """Batch sessionization: assign ``session_id`` (per-key, 1-based) and
    per-session aggregates. A new session starts when the time since the
    previous event of the same key exceeds ``gap_minutes``.

    Returns one row per session: (key, session_id, session_start,
    session_end, n_events).
    """
    gap_us = int(gap_minutes * 60) * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | (_umicros(F.col(ts_col)) - _umicros(prev) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    numbered = df.select(
        F.col(key_col), F.col(ts_col), is_new.alias("__new")
    ).withColumn(
        "session_id",
        F.sum("__new").over(
            Window.partitionBy(key_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        numbered.groupBy(key_col, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            key_col,
            F.col("session_id").cast("long").alias("session_id"),
            "session_start",
            "session_end",
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


def sessionize_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    Emits one row per CLOSED session (closed by a gap within the batch or
    by event-time timeout once the watermark passes last_ts + gap). State
    per key: the open session's (start, last_ts, count).
    """
    import pandas as pd  # noqa: F401 — worker-side dependency, imported eagerly to fail fast
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = int(gap_minutes * 60)

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("count", LongType()),
        ]
    )

    def fn(key, pdf_iter, state: GroupState):
        import datetime as _dt

        import pandas as pd

        def _us(ts) -> int:
            # pandas Timestamp → epoch micros (naive = UTC here)
            return int(ts.value // 1000)

        def _ts(us: int):
            return _dt.datetime.utcfromtimestamp(us / 1_000_000)

        closed = []
        if state.hasTimedOut:
            start_us, last_us, count = state.get
            closed.append((str(key[0]), _ts(start_us), _ts(last_us), count))
            state.remove()
        else:
            ts_all = []
            for pdf in pdf_iter:
                ts_all.append(pdf["__ts"])
            ts = pd.concat(ts_all).sort_values()
            if state.exists:
                start_us, last_us, count = state.get
            else:
                start_us = last_us = _us(ts.iloc[0])
                count = 0
            for t in ts:
                t_us = _us(t)
                if t_us - last_us > gap_s * 1_000_000:
                    closed.append((str(key[0]), _ts(start_us), _ts(last_us), count))
                    start_us, count = t_us, 0
                last_us = t_us
                count += 1
            state.update((start_us, last_us, count))
            # close the open session once event time passes last_ts + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_s * 1000)
        if closed:
            yield pd.DataFrame(
                closed, columns=["key", "session_start", "session_end", "n_events"]
            )

    prepared = stream.select(
        F.col(key_col).cast("string").alias("__key"), F.col(ts_col).alias("__ts")
    ).withWatermark("__ts", watermark)
    return prepared.groupBy("__key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def session_stats(
    df: DataFrame, key_col: str, ts_col: str, gap_minutes: float = 30.0,
    exact: bool = True, accuracy: int = 10000,
) -> DataFrame:
    """One-row engagement scorecard over :func:`sessionize` output —
    the numbers a product dashboard opens with: (n_sessions, n_users,
    avg_events, avg_duration_sec, p50_duration_sec, bounce_rate) where
    bounce_rate = single-event sessions / all sessions (the classic
    definition) and durations are last-minus-first event per session.

    Determinism: durations are integer MICROSECONDS (unix_micros
    diffs); averages and the bounce fraction are integer/integer
    divisions rounded 6dp; the median is the exact interpolated
    percentile over those integers (quantile_cont arithmetic shared
    with the oracle — the funnel_latencies contract). One aggregate
    over the session frame (itself one per-key window + hash
    aggregate); everything after sessionize is session-count-sized.

    ``exact=False`` switches the median to ``percentile_approx`` with
    ``accuracy`` (the funnel_latencies knob): the exact percentile
    buffers EVERY session's duration in one aggregation buffer — fine
    for a dashboard scorecard over millions of sessions, an OOM hazard
    at billions; the approx sketch is bounded-memory mergeable."""
    s = sessionize(df, key_col, ts_col, gap_minutes)
    dur = (
        _umicros(F.col("session_end"))
        - _umicros(F.col("session_start"))
    )
    staged = s.select(
        F.col(key_col).alias("__k"),
        F.col("n_events").alias("__ev"),
        dur.alias("__dur"),
    )
    return _session_scorecard(staged, exact, accuracy)


def _session_scorecard(staged: DataFrame, exact: bool, accuracy: int,
                       by: str | None = None) -> DataFrame:
    """The shared aggregate tail of session_stats / session_stats_by
    over a staged (__k, __ev, __dur [, __g]) session frame."""
    n = F.count("*")
    aggs = [
        n.cast("long").alias("n_sessions"),
        F.count_distinct(F.col("__k")).cast("long").alias("n_users"),
        F.round(F.sum("__ev") / n, 6).alias("avg_events"),
        F.round(F.sum("__dur") / (n * F.lit(1e6)), 6).alias("avg_duration_sec"),
        F.round(
            (F.expr("percentile(__dur, 0.5)") if exact
             else F.expr(f"percentile_approx(__dur, 0.5, {int(accuracy)})"))
            / F.lit(1e6), 6
        ).alias("p50_duration_sec"),
        F.round(
            F.sum(F.when(F.col("__ev") == 1, 1).otherwise(0)) / n, 6
        ).alias("bounce_rate"),
    ]
    if by is None:
        return staged.agg(*aggs)
    return staged.groupBy(F.col("__g").alias(by)).agg(*aggs)


def session_stats_by(
    df: DataFrame, key_col: str, ts_col: str, by: str,
    gap_minutes: float = 30.0, exact: bool = True, accuracy: int = 10000,
) -> DataFrame:
    """Per-group engagement scorecard — the A/B family's third leg
    (funnel_steps_by compares conversion, retention_cohorts_by compares
    stickiness, this compares ENGAGEMENT): one :func:`session_stats`
    row per ``by`` value, each user attributed to the value carried by
    their FIRST event (min (epoch-micros, value) struct — the
    funnel_steps_by / retention_cohorts_by attribution contract; NULL
    values never attribute, so an unlabeled user's sessions drop).
    Returns (group, n_sessions, n_users, avg_events, avg_duration_sec,
    p50_duration_sec, bounce_rate).

    Scale shape: the sessionizer's per-key window is the event-volume
    shuffle; attribution is one more user-keyed hash aggregate and the
    join back rides the same key, so the grouped variant adds no new
    event-volume exchange — the final aggregate is groups-sized. The
    ``exact`` knob follows session_stats (exact percentile buffers a
    GROUP's durations in one buffer; use exact=False at billions)."""
    s = sessionize(df, key_col, ts_col, gap_minutes)
    u, t, g = F.col(key_col), F.col(ts_col), F.col(by)
    attr = (
        df.filter(u.isNotNull() & t.isNotNull() & g.isNotNull())
        .groupBy(u.alias("__u"))
        .agg(F.min(F.struct(
            _umicros(t).alias("t"), g.cast("string").alias("g")
        ))["g"].alias("__g"))
    )
    dur = _umicros(F.col("session_end")) - _umicros(F.col("session_start"))
    staged = (
        s.join(attr, s[key_col] == attr["__u"])
        .select("__g",
                F.col(key_col).alias("__k"),
                F.col("n_events").alias("__ev"),
                dur.alias("__dur"))
    )
    return _session_scorecard(staged, exact, accuracy, by=by)
