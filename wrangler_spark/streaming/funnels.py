"""Streaming event analytics — the stream forms of
``datapipe.events`` funnels (funnel_stream, same greedy
earliest-anchor semantics) and Markov transitions (transitions_stream),
via ``applyInPandasWithState``.

State per user is exactly the funnel chain: k epoch-micro timestamps
(t1..tk, unset = missing) — a few dozen bytes per live user, nothing
event-sized. An arriving event folds in event-time order within the
micro-batch and fills the FIRST unset slot i whose step type matches,
provided t_{i-1} is set and ts > t_{i-1} (strictly — the batch
contract), and, when ``within_minutes`` is given, ts <= t1 + within.
Because later events can never improve an already-set earlier slot,
in-event-time-order arrival reproduces the batch op exactly; a late
event that belonged BEFORE a filled slot cannot retroactively lower it
(the same in-order discipline sessionize_stream documents — exact
under ordered arrival, watermark-bounded otherwise).

Emits one row per newly filled slot: (key, step, event_type, step_ts).
Downstream per-step user counts (count by step) equal
``funnel_steps``'s users column. With ``within_minutes`` set the state
GCs itself via event-time timeout once the anchor window closes (no
further progress is possible); without it, state is k longs per user
for the stream's lifetime — size that consciously.

Windowed-restart semantics: after a user's window closes and its state
is GC'd, a LATER step-1 event starts a fresh funnel window and emits
step-1 again — per-window counting, the streaming convention. The
batch op's one-anchor-per-user convention corresponds to a stream that
never GCs (within_minutes=None); consumers needing strict
once-per-user counts should aggregate count(DISTINCT key) per step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def funnel_stream(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_minutes: float | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    if len(steps) < 2:
        raise ValueError("funnel_stream needs at least two steps")
    import pandas as pd  # noqa: F401 — worker-side dependency, fail fast

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(steps)
    within_us = None if within_minutes is None else int(within_minutes * 60) * 1_000_000

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("step", IntegerType()),
            StructField("event_type", StringType()),
            StructField("step_ts", TimestampType()),
        ]
    )
    # one slot per step; 0 = unset (epoch-micros are never 0 for real data,
    # and a literal 1970-01-01T00:00:00.000000 event would be below any
    # sane watermark anyway)
    state_schema = StructType(
        [StructField(f"t{i + 1}", LongType()) for i in range(k)]
    )

    def fn(key, pdf_iter, state: GroupState):
        import datetime as _dt

        import pandas as pd

        if state.hasTimedOut:
            # anchor window closed — every reachable slot was already
            # emitted incrementally; drop the chain
            state.remove()
            return
        slots = list(state.get) if state.exists else [0] * k
        fills = []
        frames = [pdf[["__ts", "__e"]] for pdf in pdf_iter]
        ev = pd.concat(frames).sort_values("__ts", kind="mergesort")
        for ts, et in zip(ev["__ts"], ev["__e"]):
            t_us = int(ts.value // 1000)
            for i in range(k):
                if slots[i]:
                    continue
                if steps[i] != et:
                    continue
                if i > 0 and (not slots[i - 1] or t_us <= slots[i - 1]):
                    continue
                if within_us is not None and i > 0 and t_us > slots[0] + within_us:
                    continue
                slots[i] = t_us
                fills.append(
                    (str(key[0]), i + 1, et,
                     _dt.datetime.utcfromtimestamp(t_us / 1_000_000))
                )
                break
        state.update(tuple(slots))
        if within_us is not None and slots[0]:
            # no slot can fill after t1 + within — schedule the GC. Spark
            # clears a key's timeout on every invocation with data, so it
            # must be re-set each batch; if the window end is already
            # BELOW the watermark the set throws — and in that case the
            # window is provably closed (any future event is above the
            # watermark, hence outside the window), so dropping the state
            # is exactly the GC the timeout would have performed
            try:
                state.setTimeoutTimestamp((slots[0] + within_us) // 1000)
            except Exception:
                state.remove()
        if fills:
            yield pd.DataFrame(fills, columns=["key", "step", "event_type", "step_ts"])

    prepared = (
        stream.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).cast("string").alias("__key"),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__e"),
        )
        .withWatermark("__ts", watermark)
    )
    return prepared.groupBy("__key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if within_us is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def transitions_stream(
    stream: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming Markov-transition emitter — the stream form of
    ``datapipe.events.event_transitions``'s pair extraction. State per
    user is ONE (last_ts, last_type) tuple; each event folded in
    event-time order within the micro-batch emits the consecutive pair
    (key, from_type, to_type, to_ts) and replaces the state. Counting /
    row-normalizing is the consumer's aggregation (a streaming
    ``groupBy(from_type, to_type).count()`` or a batch rollup of the
    emitted pairs) — this op is the stateful pair extraction only.

    Same in-order exactness contract as funnel_stream / sessionize:
    pairs are exact under event-time-ordered arrival; a late event that
    belonged between two already-paired events cannot retroactively
    split their pair."""
    import pandas as pd  # noqa: F401 — worker-side dependency, fail fast

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("from_type", StringType()),
            StructField("to_type", StringType()),
            StructField("to_ts", TimestampType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_us", LongType()), StructField("last_type", StringType())]
    )

    def fn(key, pdf_iter, state: GroupState):
        import datetime as _dt

        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        frames = [pdf[["__ts", "__e"]] for pdf in pdf_iter]
        ev = pd.concat(frames).sort_values("__ts", kind="mergesort")
        last_us, last_type = state.get if state.exists else (None, None)
        pairs = []
        for ts, et in zip(ev["__ts"], ev["__e"]):
            t_us = int(ts.value // 1000)
            if last_type is not None:
                pairs.append(
                    (str(key[0]), last_type, et,
                     _dt.datetime.utcfromtimestamp(t_us / 1_000_000))
                )
            last_us, last_type = t_us, et
        state.update((last_us, last_type))
        if pairs:
            yield pd.DataFrame(
                pairs, columns=["key", "from_type", "to_type", "to_ts"]
            )

    prepared = (
        stream.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).cast("string").alias("__key"),
            F.col(ts_col).alias("__ts"),
            F.col(type_col).alias("__e"),
        )
        .withWatermark("__ts", watermark)
    )
    return prepared.groupBy("__key").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
