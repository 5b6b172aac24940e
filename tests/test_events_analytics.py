"""funnel_steps / retention_cohorts — event-analytics extensions
(datapipe/events.py). Hand-computed fixtures exercise the ordering,
anchor-window, null, and denominator contracts the sf0.01 oracle can't
isolate."""

import datetime as dt

import pytest

from wrangler_spark.datapipe import events as events_mod
from wrangler_spark.datapipe.events import funnel_steps, retention_cohorts
from wrangler_spark.datapipe._layout import resolve as _ixroot


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_order_and_conversion(spark):
    df = _events(
        spark,
        [
            # u1 completes a->b->c in order
            (1, _ts(1, 0), "a"), (1, _ts(1, 1), "b"), (1, _ts(1, 2), "c"),
            # u2: b before a, never after -> stops at step 1
            (2, _ts(1, 1), "b"), (2, _ts(1, 2), "a"),
            # u3: a then c (no b) -> stops at step 1
            (3, _ts(1, 0), "a"), (3, _ts(1, 5), "c"),
        ],
    )
    got = {
        r["step"]: (r["event_type"], r["users"], r["conversion"])
        for r in funnel_steps(df, "user_id", "ts", "event_type", ["a", "b", "c"]).collect()
    }
    assert got == {
        1: ("a", 3, 1.0),
        2: ("b", 1, round(1 / 3, 6)),
        3: ("c", 1, round(1 / 3, 6)),
    }


def test_funnel_equal_timestamp_not_counted(spark):
    # strictly-after contract: b at the same instant as a does not advance
    df = _events(spark, [(1, _ts(1, 0), "a"), (1, _ts(1, 0), "b")])
    got = {r["step"]: r["users"] for r in
           funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"]).collect()}
    assert got == {1: 1, 2: 0}


def test_funnel_within_anchored_at_greedy_first_step(spark):
    # u1's greedy anchor is day-1 a; its only b is outside the 60-min
    # window even though a later a (day 2) would anchor a valid chain —
    # the documented earliest-anchor convention counts u1 out
    df = _events(
        spark,
        [
            (1, _ts(1, 0), "a"), (1, _ts(2, 0), "a"), (1, _ts(2, 0, 30), "b"),
            # u2 converts inside the window
            (2, _ts(1, 0), "a"), (2, _ts(1, 0, 30), "b"),
        ],
    )
    got = {r["step"]: r["users"] for r in
           funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"],
                        within_minutes=60).collect()}
    assert got == {1: 2, 2: 1}
    # without the bound the late chain counts
    got2 = {r["step"]: r["users"] for r in
            funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"]).collect()}
    assert got2 == {1: 2, 2: 2}


def test_funnel_no_first_step_users_all_zero(spark):
    df = _events(spark, [(1, _ts(1), "b")])
    rows = funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"]).collect()
    assert [(r["users"], r["conversion"]) for r in rows] == [(0, 0.0), (0, 0.0)]


def test_funnel_null_user_and_ts_dropped(spark):
    df = _events(
        spark,
        [(None, _ts(1), "a"), (1, None, "a"), (1, _ts(1), "a"), (1, _ts(2), "b")],
    )
    got = {r["step"]: r["users"] for r in
           funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"]).collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_rejects_single_step(spark):
    df = _events(spark, [(1, _ts(1), "a")])
    with pytest.raises(ValueError):
        funnel_steps(df, "user_id", "ts", "event_type", ["a"])


def test_retention_offsets_and_denominator(spark):
    # weekly periods from the epoch: 2024-01-01 is day 19723 -> bucket 2817
    # (19723 = 2817*7 + 4), so the bucket containing it starts 2023-12-28
    df = _events(
        spark,
        [
            # u1 active in weeks 0,1,3; u2 only week 0; u3 weeks 0,1
            (1, _ts(1), "a"), (1, _ts(8), "a"), (1, _ts(22), "a"),
            (2, _ts(2), "a"),
            (3, _ts(3), "a"), (3, _ts(9), "a"), (3, _ts(9, 5), "a"),
        ],
    )
    rows = retention_cohorts(df, "user_id", "ts", period_days=7, max_periods=8).collect()
    got = {r["period_offset"]: (r["active_users"], r["retention"]) for r in rows}
    assert all(str(r["cohort_start"]) == "2023-12-28" for r in rows)
    assert got == {0: (3, 1.0), 1: (2, round(2 / 3, 6)), 3: (1, round(1 / 3, 6))}


def test_retention_max_periods_drops_tail(spark):
    df = _events(spark, [(1, _ts(1), "a"), (1, _ts(29), "a")])  # offsets 0 and 4
    rows = retention_cohorts(df, "user_id", "ts", period_days=7, max_periods=2).collect()
    assert sorted(r["period_offset"] for r in rows) == [0]


def test_retention_two_cohorts_independent_denominators(spark):
    df = _events(
        spark,
        [
            (1, _ts(1), "a"), (2, _ts(2), "a"),   # cohort week 0: u1,u2
            (1, _ts(8), "a"),                      # u1 retained
            (3, _ts(8), "a"),                      # cohort week 1: u3 alone
        ],
    )
    rows = retention_cohorts(df, "user_id", "ts", period_days=7).collect()
    by = {(str(r["cohort_start"]), r["period_offset"]): r for r in rows}
    assert by[("2023-12-28", 0)]["active_users"] == 2
    assert by[("2023-12-28", 1)]["retention"] == 0.5
    assert by[("2024-01-04", 0)]["active_users"] == 1
    assert by[("2024-01-04", 0)]["retention"] == 1.0


def test_retention_rejects_bad_period(spark):
    df = _events(spark, [(1, _ts(1), "a")])
    with pytest.raises(ValueError):
        retention_cohorts(df, "user_id", "ts", period_days=0)


def test_directive_surface(spark):
    from wrangler_spark import Pipeline

    df = _events(
        spark, [(1, _ts(1, 0), "a"), (1, _ts(1, 1), "b"), (2, _ts(1), "a")]
    )
    r = Pipeline.compile("funnel :user_id :ts :event_type 'a,b'").apply(df)
    assert {x["step"]: x["users"] for x in r.collect()} == {1: 2, 2: 1}
    r2 = Pipeline.compile("retention-cohorts :user_id :ts 7 4").apply(df)
    assert r2.count() == 1  # single cohort, offset 0 only


def _events_with_id(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def test_transitions_counts_and_row_normalization(spark):
    from wrangler_spark.datapipe.events import event_transitions

    df = _events_with_id(
        spark,
        [
            # u1: a->b->a->c   (a->b, b->a, a->c)
            (1, 1, _ts(1, 0), "a"), (2, 1, _ts(1, 1), "b"),
            (3, 1, _ts(1, 2), "a"), (4, 1, _ts(1, 3), "c"),
            # u2: a->b          (a->b)
            (5, 2, _ts(1, 0), "a"), (6, 2, _ts(1, 1), "b"),
        ],
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in event_transitions(df, "user_id", "ts", "event_type", "event_id").collect()
    }
    # from 'a': 2x a->b, 1x a->c; from 'b': 1x b->a
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_transitions_tie_col_orders_equal_timestamps(spark):
    from wrangler_spark.datapipe.events import event_transitions

    # both events at the same instant: tie on event_id makes a->b, never b->a
    df = _events_with_id(
        spark, [(1, 1, _ts(1, 0), "a"), (2, 1, _ts(1, 0), "b")]
    )
    rows = event_transitions(df, "user_id", "ts", "event_type", "event_id").collect()
    assert [(r["from_type"], r["to_type"]) for r in rows] == [("a", "b")]


def test_transitions_no_cross_user_pairs(spark):
    from wrangler_spark.datapipe.events import event_transitions

    df = _events_with_id(spark, [(1, 1, _ts(1, 0), "a"), (2, 2, _ts(1, 1), "b")])
    assert event_transitions(df, "user_id", "ts", "event_type", "event_id").count() == 0


def test_paths_trim_and_tiebreak(spark):
    from wrangler_spark.datapipe.events import event_paths_topk

    df = _events_with_id(
        spark,
        [
            # u1 and u2 share path a>b ; u3 has b>a ; u4 has a>b>c trimmed to 2 -> a>b
            (1, 1, _ts(1, 0), "a"), (2, 1, _ts(1, 1), "b"),
            (3, 2, _ts(1, 0), "a"), (4, 2, _ts(1, 1), "b"),
            (5, 3, _ts(1, 0), "b"), (6, 3, _ts(1, 1), "a"),
            (7, 4, _ts(1, 0), "a"), (8, 4, _ts(1, 1), "b"), (9, 4, _ts(1, 2), "c"),
        ],
    )
    rows = event_paths_topk(
        df, "user_id", "ts", "event_type", k=10, max_len=2, tie_col="event_id"
    ).collect()
    assert [(r["path"], r["n_users"]) for r in rows] == [("a>b", 3), ("b>a", 1)]
    # k truncates deterministically: ties broken by path asc
    one = event_paths_topk(
        df, "user_id", "ts", "event_type", k=1, max_len=1, tie_col="event_id"
    ).collect()
    # max_len=1 paths: 'a' x3, 'b' x1 -> top-1 is 'a'
    assert [(r["path"], r["n_users"]) for r in one] == [("a", 3)]


def test_paths_custom_separator(spark):
    from wrangler_spark.datapipe.events import event_paths_topk

    df = _events_with_id(spark, [(1, 1, _ts(1, 0), "x"), (2, 1, _ts(1, 1), "y")])
    rows = event_paths_topk(
        df, "user_id", "ts", "event_type", tie_col="event_id", sep="->"
    ).collect()
    assert rows[0]["path"] == "x->y"


def test_events_directive_surface_transitions_paths(spark):
    from wrangler_spark import Pipeline

    df = _events_with_id(
        spark, [(1, 1, _ts(1, 0), "a"), (2, 1, _ts(1, 1), "b")]
    )
    r = Pipeline.compile("event-transitions :user_id :ts :event_type :event_id").apply(df)
    assert [(x["from_type"], x["to_type"], x["n"]) for x in r.collect()] == [("a", "b", 1)]
    r2 = Pipeline.compile("event-paths :user_id :ts :event_type 5 3 :event_id").apply(df)
    assert r2.collect()[0]["path"] == "a>b"


def test_retention_state_incremental_equals_batch(spark, tmp_path_factory):
    """write-state + N update folds == retention_cohorts over the union:
    the persisted pairs table is a sufficient statistic, and re-ingesting
    overlapping events never double-counts (anti-join append)."""
    from wrangler_spark.datapipe.events import (
        retention_cohorts, retention_grid_from_state,
        retention_update_state, retention_write_state,
    )

    b1 = _events(spark, [(1, _ts(1), "a"), (2, _ts(2), "a"), (1, _ts(8), "a")])
    b2 = _events(spark, [(3, _ts(8), "a"), (1, _ts(8, 3), "a")])   # u1 wk1 repeats
    b3 = _events(spark, [(1, _ts(22), "a"), (2, _ts(2), "a")])     # u2 wk0 re-ingested
    path = str(tmp_path_factory.mktemp("ret_state") / "idx")

    retention_write_state(b1, path, "user_id", "ts", period_days=7)
    retention_update_state(b2, path, "user_id", "ts")
    retention_update_state(b3, path, "user_id", "ts")

    inc = retention_grid_from_state(spark, path, max_periods=8)
    full = retention_cohorts(
        b1.unionByName(b2).unionByName(b3), "user_id", "ts", 7, 8
    )
    key = lambda r: (str(r["cohort_start"]), r["period_offset"])  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))
    gi = {key(r): (r["active_users"], r["retention"]) for r in inc.collect()}
    gf = {key(r): (r["active_users"], r["retention"]) for r in full.collect()}
    assert gi == gf
    # pairs table stayed minimal: distinct (user, bucket) only
    n_pairs = spark.read.parquet(_ixroot(spark, path) + "/pairs").count()
    assert n_pairs == spark.read.parquet(_ixroot(spark, path) + "/pairs").distinct().count()


def test_retention_state_meta_pins_period(spark, tmp_path_factory):
    from wrangler_spark.datapipe.events import (
        retention_update_state, retention_write_state,
    )

    path = str(tmp_path_factory.mktemp("ret_state2") / "idx")
    retention_write_state(
        _events(spark, [(1, _ts(1), "a")]), path, "user_id", "ts", period_days=1
    )
    meta = spark.read.parquet(_ixroot(spark, path) + "/meta").collect()[0]
    assert meta["period_days"] == 1
    # updates bucket with the STORED period (daily): day-2 activity is a
    # new bucket even though a weekly caller would fold it into bucket 0
    retention_update_state(
        _events(spark, [(1, _ts(2), "a")]), path, "user_id", "ts"
    )
    bks = {r["__b"] for r in spark.read.parquet(_ixroot(spark, path) + "/pairs").collect()}
    assert len(bks) == 2


def test_funnel_anchor_any_counts_late_chains(spark):
    """anchor='any' is the exact windowed count: u1's day-2 anchor chain
    completes inside its own 60-min window even though the greedy
    first-anchor chain (day 1) does not."""
    df = _events(
        spark,
        [
            (1, _ts(1, 0), "a"), (1, _ts(2, 0), "a"), (1, _ts(2, 0, 30), "b"),
            (2, _ts(1, 0), "a"), (2, _ts(1, 0, 30), "b"),
            (3, _ts(1, 0), "a"),  # never reaches b under any anchor
        ],
    )
    any_ = {r["step"]: r["users"] for r in
            funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"],
                         within_minutes=60, anchor="any").collect()}
    first = {r["step"]: r["users"] for r in
             funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"],
                          within_minutes=60, anchor="first").collect()}
    assert any_ == {1: 3, 2: 2}
    assert first == {1: 3, 2: 1}


def test_funnel_anchor_modes_agree_without_bound(spark):
    """With no time bound the greedy chain exists iff any chain does —
    the two modes must count identically on random streams."""
    import datetime as dt
    import random

    rng = random.Random(7)
    rows = [
        (rng.randint(0, 15),
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randint(0, 5000)),
         rng.choice(["a", "b", "c", "x"]))
        for _ in range(600)
    ]
    df = _events(spark, rows)
    got = {}
    for mode in ("first", "any"):
        got[mode] = {r["step"]: r["users"] for r in
                     funnel_steps(df, "user_id", "ts", "event_type",
                                  ["a", "b", "c"], anchor=mode).collect()}
    assert got["first"] == got["any"]


def test_funnel_anchor_any_dominates_first(spark):
    """Windowed: the exact count is never below the greedy count, and
    step-1 counts always agree (every step-1 event is its own anchor)."""
    import datetime as dt
    import random

    rng = random.Random(13)
    rows = [
        (rng.randint(0, 20),
         dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randint(0, 3000)),
         rng.choice(["a", "b", "c"]))
        for _ in range(800)
    ]
    df = _events(spark, rows)
    any_ = {r["step"]: r["users"] for r in
            funnel_steps(df, "user_id", "ts", "event_type", ["a", "b", "c"],
                         within_minutes=45, anchor="any").collect()}
    first = {r["step"]: r["users"] for r in
             funnel_steps(df, "user_id", "ts", "event_type", ["a", "b", "c"],
                          within_minutes=45, anchor="first").collect()}
    assert any_[1] == first[1]
    assert all(any_[s] >= first[s] for s in any_)


def test_funnel_rejects_bad_anchor(spark):
    df = _events(spark, [(1, _ts(1), "a"), (1, _ts(2), "b")])
    with pytest.raises(ValueError):
        funnel_steps(df, "user_id", "ts", "event_type", ["a", "b"], anchor="last")


def test_retention_calendar_month_cohorts(spark):
    """calendar='month': cohorts are true calendar months (Jan 31 and
    Feb 1 are different buckets; Dec->Jan crosses the year boundary),
    cohort_start is the month's first day, offsets count months."""
    from wrangler_spark.datapipe.events import retention_cohorts

    rows = [
        (1, dt.datetime(2023, 12, 31), "a"),  # u1 cohort 2023-12
        (1, dt.datetime(2024, 1, 1), "a"),    # ... active the next month
        (2, dt.datetime(2024, 1, 31), "a"),   # u2 cohort 2024-01
        (2, dt.datetime(2024, 2, 1), "a"),    # ... active in Feb
        (3, dt.datetime(2024, 1, 2), "a"),    # u3 cohort 2024-01, Jan only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        (str(r["cohort_start"]), r["period_offset"]): (r["active_users"], r["retention"])
        for r in retention_cohorts(df, "user_id", "ts", calendar="month").collect()
    }
    assert got == {
        ("2023-12-01", 0): (1, 1.0),
        ("2023-12-01", 1): (1, 1.0),
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
    }


def test_retention_rejects_bad_calendar(spark):
    from wrangler_spark.datapipe.events import retention_cohorts

    df = _events(spark, [(1, _ts(1), "a")])
    with pytest.raises(ValueError):
        retention_cohorts(df, "user_id", "ts", calendar="week").collect()


def test_directive_funnel_anchor_arg(spark):
    from wrangler_spark import Pipeline

    df = _events(
        spark,
        [
            (1, _ts(1, 0), "a"), (1, _ts(2, 0), "a"), (1, _ts(2, 0, 30), "b"),
        ],
    )
    r = Pipeline.compile("funnel :user_id :ts :event_type 'a,b' 60 'any'").apply(df)
    assert {x["step"]: x["users"] for x in r.collect()} == {1: 1, 2: 1}
    r2 = Pipeline.compile("funnel :user_id :ts :event_type 'a,b' 60").apply(df)
    assert {x["step"]: x["users"] for x in r2.collect()} == {1: 1, 2: 0}


def test_retention_state_updates_from_stream(spark, tmp_path_factory):
    """The state lifecycle wired to a stream: foreachBatch folds each
    micro-batch with retention_update_state, and the resulting grid
    equals the batch computation over everything the stream delivered —
    the nightly-ingest shape end to end."""
    import shutil as _sh

    from wrangler_spark.datapipe.events import (
        retention_cohorts, retention_grid_from_state,
        retention_update_state, retention_write_state,
    )

    src = str(tmp_path_factory.mktemp("ret_stream_src"))
    state = str(tmp_path_factory.mktemp("ret_stream_state") / "idx")
    seed = _events(spark, [(1, _ts(1), "a"), (2, _ts(2), "a")])
    retention_write_state(seed, state, "user_id", "ts", period_days=7)

    newer = _events(
        spark, [(1, _ts(8), "a"), (3, _ts(9), "a"), (2, _ts(2), "a")]  # one re-ingest
    )
    newer.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(newer.schema).parquet(src)
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", src + "_chk")
        .foreachBatch(
            lambda batch, _id: retention_update_state(batch, state, "user_id", "ts")
        )
        .start()
    )
    q.awaitTermination(120)

    inc = retention_grid_from_state(spark, state)
    full = retention_cohorts(seed.unionByName(newer), "user_id", "ts", 7)
    key = lambda r: (str(r["cohort_start"]), r["period_offset"],
                     r["active_users"], r["retention"])  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))
    _sh.rmtree(src, ignore_errors=True)


def test_active_users_hand_computed(spark):
    """u1 active day1+day3, u2 day1, u3 day8: DAU counts exact per day,
    WAU slides (day 8 window [2..8] holds u1(d3)+u3(d8) = 2), the grid
    is dense (day 5 exists with au_1d 0), and null user/ts rows drop."""
    from wrangler_spark.datapipe.events import active_users

    df = _events(
        spark,
        [(1, _ts(1), "a"), (1, _ts(1), "b"), (1, _ts(3), "a"),
         (2, _ts(1), "a"), (3, _ts(8), "a")],
    )
    out = {str(r["day"]): r for r in active_users(df, "user_id", "ts", (1, 7)).collect()}
    assert len(out) == 8                                  # dense day 1..8 grid
    d = sorted(out)
    assert [out[k]["au_1d"] for k in d] == [2, 0, 1, 0, 0, 0, 0, 1]
    assert out[d[0]]["au_7d"] == 2                        # day1: u1, u2
    assert out[d[2]]["au_7d"] == 2                        # day3 window [d-6..d3]
    assert out[d[6]]["au_7d"] == 2                        # day7: u1+u2 (day1) still in
    assert out[d[7]]["au_7d"] == 2                        # day8: u1(d3) + u3(d8); day1 aged out
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 1"):
        active_users(df, "user_id", "ts", (0,))
    # directive surface
    from wrangler_spark import Pipeline

    rows = Pipeline.compile("active-users :user_id :ts").apply(df).collect()
    assert len(rows) == 8 and {"au_1d", "au_7d", "au_30d"} <= set(rows[0].asDict())


def test_active_users_from_state(spark, tmp_path_factory):
    """A day-bucketed retention state (period_days=1) holds exactly
    active_users' sufficient statistic: the from-state grid equals the
    batch op over everything folded in; coarser states are rejected."""
    from wrangler_spark.datapipe.events import (
        active_users, active_users_from_state,
        retention_update_state, retention_write_state,
    )

    seed = _events(spark, [(1, _ts(1), "a"), (1, _ts(3), "b"), (2, _ts(1), "a")])
    newer = _events(spark, [(3, _ts(8), "a"), (1, _ts(3), "b")])  # one re-ingest
    state = str(tmp_path_factory.mktemp("au_state")) + "/st"
    retention_write_state(seed, state, "user_id", "ts", period_days=1)
    retention_update_state(newer, state, "user_id", "ts")

    key = lambda r: tuple(map(str, r))  # noqa: E731
    inc = sorted(map(key, active_users_from_state(spark, state, (1, 7)).collect()))
    full = sorted(map(key, active_users(
        seed.unionByName(newer), "user_id", "ts", (1, 7)).collect()))
    assert inc == full and len(inc) == 8

    # a weekly state cannot answer daily windows — loud, never silent
    weekly = str(tmp_path_factory.mktemp("au_state_w")) + "/st"
    retention_write_state(seed, weekly, "user_id", "ts", period_days=7)
    with pytest.raises(ValueError, match="period_days=1"):
        active_users_from_state(spark, weekly, (1, 7))


def test_funnel_latencies_hand_computed(spark):
    from wrangler_spark.datapipe.events import funnel_latencies

    df = _events(
        spark,
        [
            # u1: a@0 -> b@10min -> c@30min   (b lat 600s, c lat 1200s)
            (1, _ts(1, 0, 0), "a"), (1, _ts(1, 0, 10), "b"), (1, _ts(1, 0, 30), "c"),
            # u2: a@0 -> b@30min              (b lat 1800s)
            (2, _ts(1, 0, 0), "a"), (2, _ts(1, 0, 30), "b"),
            # u3: a only
            (3, _ts(1, 0, 0), "a"),
        ],
    )
    got = {r["step"]: r for r in
           funnel_latencies(df, "user_id", "ts", "event_type", ["a", "b", "c"]).collect()}
    assert set(got) == {2, 3}
    assert got[2]["users"] == 2 and got[2]["avg_sec"] == 1200.0 and got[2]["p50_sec"] == 1200.0
    assert got[3]["users"] == 1 and got[3]["avg_sec"] == 1200.0 and got[3]["p50_sec"] == 1200.0
    # approx mode agrees on small data
    approx = {r["step"]: r["p50_sec"] for r in
              funnel_latencies(df, "user_id", "ts", "event_type",
                               ["a", "b", "c"], exact=False).collect()}
    assert approx[3] == 1200.0


def test_directive_funnel_latency(spark):
    from wrangler_spark import Pipeline

    df = _events(
        spark, [(1, _ts(1, 0, 0), "a"), (1, _ts(1, 0, 10), "b")]
    )
    r = Pipeline.compile("funnel-latency :user_id :ts :event_type 'a,b'").apply(df)
    rows = r.collect()
    assert len(rows) == 1 and rows[0]["avg_sec"] == 600.0


def test_retention_state_month_calendar_roundtrip(spark, tmp_path_factory):
    from wrangler_spark.datapipe.events import (
        retention_cohorts, retention_grid_from_state,
        retention_update_state, retention_write_state,
    )

    path = str(tmp_path_factory.mktemp("ret_month") / "idx")
    b1 = _events(spark, [(1, dt.datetime(2023, 12, 15), "a"),
                         (2, dt.datetime(2024, 1, 5), "a")])
    b2 = _events(spark, [(1, dt.datetime(2024, 1, 20), "a")])
    retention_write_state(b1, path, "user_id", "ts", calendar="month")
    retention_update_state(b2, path, "user_id", "ts")
    inc = retention_grid_from_state(spark, path)
    full = retention_cohorts(b1.unionByName(b2), "user_id", "ts", calendar="month")
    key = lambda r: (str(r["cohort_start"]), r["period_offset"],
                     r["active_users"], r["retention"])  # noqa: E731
    got = sorted(map(key, inc.collect()))
    assert got == sorted(map(key, full.collect()))
    assert got[0][0] == "2023-12-01"  # true month boundary, not epoch-day math


def test_retention_stream_fold_equals_batch_grid(spark, tmp_path_factory):
    """The stream edge of the batch/stream/state triangle: folding the
    event stream through retention_update_stream's foreachBatch sink
    yields EXACTLY the retention grid (and active-user counts) a batch
    computation over the same events produces — mirroring the
    incremental == batch contract of the update-state path. Also proves
    the fold starts from NOTHING (meta-only init, no pairs dataset) and
    that re-running the same data is idempotent at the pair level."""
    import shutil as _sh

    from wrangler_spark.datapipe.events import (
        active_users, active_users_from_state, retention_cohorts,
        retention_grid_from_state, retention_update_state, retention_update_stream,
    )

    rows = [
        (1, _ts(1), "a"), (2, _ts(2), "a"), (1, _ts(8), "a"),
        (3, _ts(8), "a"), (1, _ts(8, 3), "a"), (2, _ts(16), "a"),
        (3, _ts(2), "a"), (1, _ts(22), "a"),
    ]
    df = _events(spark, rows)
    src = str(tmp_path_factory.mktemp("ret_stream_src"))
    chk = str(tmp_path_factory.mktemp("ret_stream_chk"))
    path = str(tmp_path_factory.mktemp("ret_stream_state") / "st")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long, ts timestamp, event_type string").parquet(src)
    q = retention_update_stream(stream, path, "user_id", "ts", chk, period_days=1)
    q.awaitTermination(120)

    key = lambda r: (str(r["cohort_start"]), r["period_offset"],  # noqa: E731
                     r["active_users"], r["retention"])
    got = sorted(map(key, retention_grid_from_state(spark, path, max_periods=30).collect()))
    want = sorted(map(key, retention_cohorts(df, "user_id", "ts", 1, 30).collect()))
    assert got == want and len(got) > 0

    # the day-bucketed state also serves the rolling active-user grid
    akey = lambda r: (str(r["day"]), r["au_1d"], r["au_7d"])  # noqa: E731
    got_au = sorted(map(akey, active_users_from_state(spark, path, (1, 7)).collect()))
    want_au = sorted(map(akey, active_users(df, "user_id", "ts", (1, 7)).collect()))
    assert got_au == want_au

    # replay idempotence: folding the SAME events again appends nothing
    n_before = spark.read.parquet(_ixroot(spark, path) + "/pairs").count()
    retention_update_state(df, path, "user_id", "ts")
    assert spark.read.parquet(_ixroot(spark, path) + "/pairs").count() == n_before
    _sh.rmtree(src, ignore_errors=True)


def test_active_users_wide_window_guard_and_sketch_path(spark):
    """sum(windows) past the exact-path explode budget raises with a
    pointer to approx=True; the sketch path serves (90, 365) dashboards
    with per-day HLLs (no pair explode) and matches the exact counts at
    small cohort sizes (HLL is exact in sparse mode)."""
    import pytest as _pytest

    rows = [(u, _ts(1 + (u * 7 + d) % 28, 3), "a")
            for u in range(40) for d in range(3)]
    df = _events(spark, rows)
    with _pytest.raises(ValueError, match="approx=True"):
        events_mod.active_users(df, "user_id", "ts", (90, 365))

    # sketch path vs exact path on windows the exact path allows
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    exact = sorted(map(key, events_mod.active_users(df, "user_id", "ts", (1, 7, 30)).collect()))
    approx = sorted(map(key, events_mod.active_users(
        df, "user_id", "ts", (1, 7, 30), approx=True).collect()))
    assert approx == exact  # sparse-mode HLL: exact at this cohort size

    # wide windows run under approx and produce a sane dense grid
    wide = events_mod.active_users(df, "user_id", "ts", (90,), approx=True).collect()
    # dense grid: activity days are 1 + (7u+d) % 28 for d in 0..2 ->
    # residues {0..2, 7..9, 14..16, 21..23}, so the grid spans day 1..24
    assert len(wide) == 24
    last = max(wide, key=lambda r: str(r["day"]))
    assert last["au_90d"] == 40                 # window covers all activity


def test_active_users_from_state_approx_and_guard(spark, tmp_path_factory):
    """The state-served grid honors the same wide-window contract as the
    batch op: the exact path rejects a (90, 365) request, approx serves
    it from per-day sketches, and approx == exact on narrow windows at
    small cohort size."""
    from wrangler_spark.datapipe.events import (
        active_users, active_users_from_state, retention_write_state,
    )

    rows = [(u, _ts(1 + (u + d) % 20), "a") for u in range(25) for d in range(3)]
    df = _events(spark, rows)
    path = str(tmp_path_factory.mktemp("au_state") / "st")
    retention_write_state(df, path, "user_id", "ts", period_days=1)

    with pytest.raises(ValueError, match="approx=True"):
        active_users_from_state(spark, path, (90, 365))
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    exact = sorted(map(key, active_users_from_state(spark, path, (1, 7)).collect()))
    approx = sorted(map(key, active_users_from_state(spark, path, (1, 7), approx=True).collect()))
    assert approx == exact
    wide = active_users_from_state(spark, path, (120,), approx=True)
    got = sorted(map(key, wide.collect()))
    want = sorted(map(key, active_users(df, "user_id", "ts", (120,), approx=True).collect()))
    assert got == want and len(got) > 0


def test_active_users_stickiness(spark):
    """stickiness = narrowest/widest window count per day (DAU/MAU),
    NULL-safe on empty wide windows, exact ratio on a hand grid."""
    df = _events(spark, [(1, _ts(1), "a"), (2, _ts(1), "a"), (1, _ts(2), "a")])
    out = {str(r["day"]): r for r in events_mod.active_users(
        df, "user_id", "ts", (1, 7), stickiness=True).collect()}
    assert out["2024-01-01"]["stickiness"] == 1.0          # 2/2
    assert out["2024-01-02"]["stickiness"] == 0.5          # 1/2
    # single-window request: no ratio column
    one = events_mod.active_users(df, "user_id", "ts", (7,), stickiness=True)
    assert "stickiness" not in one.columns


def test_funnel_state_incremental_equals_batch(spark, tmp_path_factory):
    """init + N event-time-ordered folds == funnel_steps over the union
    (both with and without a within-window): the per-user slot chain is
    the greedy funnel's sufficient statistic, multi-step advances land
    in ONE fold (a user can enter at step 1 and reach step 3 in the
    same batch), a replayed batch_id is a NO-OP, and compaction
    preserves both the summary and the batch-id ledger."""
    from wrangler_spark.datapipe.events import (
        funnel_from_state, funnel_init_state, funnel_steps, funnel_update_state,
    )
    from wrangler_spark.datapipe.maintenance import compact_index

    rows1 = [
        (1, _ts(1, 0), "a"), (1, _ts(1, 1), "b"),                  # u1 -> step 2
        (2, _ts(1, 2), "a"),                                        # u2 -> step 1
        (3, _ts(1, 0), "b"),                                        # b before any a: nothing
        (4, _ts(1, 0), "a"), (4, _ts(1, 1), "b"), (4, _ts(1, 2), "c"),  # u4 all 3 in ONE batch
    ]
    rows2 = [
        (1, _ts(2, 0), "c"),                                        # u1 completes
        (2, _ts(2, 0), "c"),                                        # c without b: stuck at 1
        (3, _ts(2, 0), "a"),                                        # u3 enters late
        (5, _ts(2, 0), "a"), (5, _ts(2, 1), "b"),                   # new user mid-history
    ]
    rows3 = [
        (3, _ts(3, 0), "b"), (3, _ts(3, 1), "c"),                   # u3 finishes
        (2, _ts(3, 0), "b"),                                        # u2 -> step 2 at last
    ]
    batches = [_events(spark, r) for r in (rows1, rows2, rows3)]
    full = batches[0].unionByName(batches[1]).unionByName(batches[2])
    key = lambda r: (r["step"], r["event_type"], r["users"], r["conversion"])  # noqa: E731

    for within in (None, 1440.0):
        path = str(tmp_path_factory.mktemp("fun_state") / "st")
        funnel_init_state(spark, path, ["a", "b", "c"], within)
        for i, b in enumerate(batches):
            funnel_update_state(b, path, "user_id", "ts", "event_type", f"b{i}")
        inc = sorted(map(key, funnel_from_state(spark, path).collect()))
        want = sorted(map(key, funnel_steps(
            full, "user_id", "ts", "event_type", ["a", "b", "c"], within
        ).collect()))
        assert inc == want and inc[0][2] > 0, (within, inc, want)

        # replayed batch_id: NO-OP even though the events would re-fold
        n = spark.read.parquet(_ixroot(spark, path) + "/rows").count()
        funnel_update_state(batches[1], path, "user_id", "ts", "event_type", "b1")
        assert spark.read.parquet(_ixroot(spark, path) + "/rows").count() == n

        # compaction: one row per user + ledger; summary identical
        compact_index(spark, path)
        assert sorted(map(key, funnel_from_state(spark, path).collect())) == want
        rows = spark.read.parquet(_ixroot(spark, path) + "/rows")
        data = rows.filter(rows["__u"].isNotNull())
        assert data.count() == data.select("__u").distinct().count()
        ledger_ids = sorted(
            r["batch_id"] for r in rows.filter(rows["__u"].isNull()).collect()
        )
        assert ledger_ids == ["b0", "b1", "b2"]
        # replay AFTER compaction still a NO-OP (the ledger preserves ids)
        funnel_update_state(batches[2], path, "user_id", "ts", "event_type", "b2")
        assert sorted(map(key, funnel_from_state(spark, path).collect())) == want


def test_funnel_state_within_window_bounds_chain(spark, tmp_path_factory):
    """The pinned within-window is enforced across folds: a step-2 event
    arriving (in a later batch) past anchor+within does NOT advance the
    chain, matching the batch funnel on the union."""
    from wrangler_spark.datapipe.events import (
        funnel_from_state, funnel_init_state, funnel_steps, funnel_update_state,
    )

    b1 = _events(spark, [(1, _ts(1, 0), "a"), (2, _ts(1, 0), "a")])
    b2 = _events(spark, [(1, _ts(1, 1), "b"),            # inside 60 min: counts
                         (2, _ts(3, 0), "b")])           # 2 days later: outside
    path = str(tmp_path_factory.mktemp("fun_state_w") / "st")
    funnel_init_state(spark, path, ["a", "b"], within_minutes=60)
    funnel_update_state(b1, path, "user_id", "ts", "event_type", "b1")
    funnel_update_state(b2, path, "user_id", "ts", "event_type", "b2")
    key = lambda r: (r["step"], r["users"], r["conversion"])  # noqa: E731
    got = sorted(map(key, funnel_from_state(spark, path).collect()))
    want = sorted(map(key, funnel_steps(
        b1.unionByName(b2), "user_id", "ts", "event_type", ["a", "b"], 60
    ).collect()))
    assert got == want == [(1, 2, 1.0), (2, 1, 0.5)]


def test_funnel_stream_fold_equals_batch(spark, tmp_path_factory):
    """The stream edge: funnel_update_stream's foreachBatch fold over a
    parquet-source stream reproduces funnel_steps exactly, starting
    from nothing (meta-only init inside the wrapper)."""
    import shutil as _sh

    from wrangler_spark.datapipe.events import (
        funnel_from_state, funnel_steps, funnel_update_stream,
    )

    rows = [
        (1, _ts(1, 0), "a"), (1, _ts(1, 1), "b"), (1, _ts(1, 2), "c"),
        (2, _ts(1, 0), "a"), (2, _ts(1, 1), "b"),
        (3, _ts(1, 0), "c"), (3, _ts(1, 1), "a"),
        (4, _ts(2, 0), "a"), (4, _ts(2, 1), "b"), (4, _ts(2, 2), "c"),
    ]
    df = _events(spark, rows)
    src = str(tmp_path_factory.mktemp("fun_stream_src"))
    chk = str(tmp_path_factory.mktemp("fun_stream_chk"))
    path = str(tmp_path_factory.mktemp("fun_stream_state") / "st")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(src)
    q = funnel_update_stream(
        stream, path, "user_id", "ts", "event_type", chk,
        steps=["a", "b", "c"], within_minutes=1440,
    )
    q.awaitTermination(120)
    key = lambda r: (r["step"], r["event_type"], r["users"], r["conversion"])  # noqa: E731
    got = sorted(map(key, funnel_from_state(spark, path).collect()))
    want = sorted(map(key, funnel_steps(
        df, "user_id", "ts", "event_type", ["a", "b", "c"], 1440
    ).collect()))
    assert got == want and len(got) == 3
    _sh.rmtree(src, ignore_errors=True)


def test_funnel_steps_by_arms(spark):
    from pyspark.sql import functions as F

    from wrangler_spark.datapipe.events import funnel_steps, funnel_steps_by

    def ts(m):
        return f"1970-01-01 00:{m:02d}:00"

    rows = [
        ("u1", ts(1), "view", "A"), ("u1", ts(2), "click", "A"),
        ("u2", ts(1), "view", "A"),
        ("u3", ts(1), "view", "B"), ("u3", ts(3), "click", "B"),
        # u4's FIRST view carries a null arm -> attributed from the
        # later labeled view
        ("u4", ts(1), "view", None), ("u4", ts(2), "view", "B"),
    ]
    df = spark.createDataFrame(
        rows, "u string, t string, e string, arm string"
    ).select("u", F.col("t").cast("timestamp").alias("t"), "e", "arm")
    got = {(r["arm"], r["step"]): r for r in
           funnel_steps_by(df, "u", "t", "e", ["view", "click"], "arm").collect()}
    assert (got[("A", 1)]["users"], got[("A", 2)]["users"]) == (2, 1)
    assert got[("A", 2)]["conversion"] == 0.5
    assert got[("B", 2)]["conversion"] == 0.5  # u3 converts, u4 doesn't
    assert got[("B", 1)]["users"] == 2
    # arm totals == the ungrouped funnel (attribution never drops a
    # labeled user)
    total = {r["step"]: r["users"] for r in
             funnel_steps(df, "u", "t", "e", ["view", "click"]).collect()}
    by_total = {}
    for (arm, step), r in got.items():
        by_total[step] = by_total.get(step, 0) + r["users"]
    assert by_total == total


def test_funnel_ab_test(spark):
    import math

    from pyspark.sql import functions as F

    from wrangler_spark.datapipe.events import funnel_ab_test, funnel_steps_by

    def ts(m):
        return f"1970-01-01 {m // 60:02d}:{m % 60:02d}:00"

    rows = []
    for i in range(100):
        rows.append((f"a{i}", ts(i), "view", "A"))
        if i < 60:
            rows.append((f"a{i}", ts(i + 1), "click", "A"))
    for i in range(100):
        rows.append((f"b{i}", ts(i), "view", "B"))
        if i < 30:
            rows.append((f"b{i}", ts(i + 1), "click", "B"))
    df = spark.createDataFrame(
        rows, "u string, t string, e string, arm string"
    ).select("u", F.col("t").cast("timestamp").alias("t"), "e", "arm")
    g = funnel_steps_by(df, "u", "t", "e", ["view", "click"], "arm")
    r = funnel_ab_test(g, "arm", "A", "B").collect()[0]
    pool = 90 / 200
    se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r["z"] == round((0.6 - 0.3) / se, 6)
    assert r["significant"] and r["conv_a"] == 0.6 and r["conv_b"] == 0.3

    # hand-computed Wilson CIs (z=1.96) + Newcombe difference interval
    def wilson(p, n):
        z2 = 1.96 * 1.96
        denom = 1.0 + z2 / n
        center = p + z2 / (2.0 * n)
        half = 1.96 * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        return (center - half) / denom, (center + half) / denom

    la, ha = wilson(0.6, 100)
    lb, hb = wilson(0.3, 100)
    assert r["conv_a_lo"] == round(la, 6) and r["conv_a_hi"] == round(ha, 6)
    assert r["conv_b_lo"] == round(lb, 6) and r["conv_b_hi"] == round(hb, 6)
    assert r["diff"] == round(0.6 - 0.3, 6)
    assert r["diff_lo"] == round(
        0.3 - math.sqrt((0.6 - la) ** 2 + (hb - 0.3) ** 2), 6)
    assert r["diff_hi"] == round(
        0.3 + math.sqrt((ha - 0.6) ** 2 + (0.3 - lb) ** 2), 6)
    # a significant difference has a CI excluding zero (and vice versa)
    assert r["diff_lo"] > 0.0
    # Wilson sanity at the extremes: contained in [0,1]
    assert 0.0 <= r["conv_b_lo"] < 0.3 < r["conv_b_hi"] <= 1.0
    # equal arms: z ~ 0, not significant
    g2 = funnel_steps_by(
        df.withColumn("arm", F.lit("A")), "u", "t", "e",
        ["view", "click"], "arm")
    both = g2.withColumn("arm", F.lit("B")).unionByName(g2)
    r2 = funnel_ab_test(both, "arm", "A", "B").collect()[0]
    assert r2["z"] == 0.0 and not r2["significant"]


def test_retention_ab_test(spark):
    # arm X: 4 users day 0, 2 return day 1 (50%); arm Y: 4 users day
    # 0, 1 returns day 1 (25%); day 2: only X retains anyone — the
    # zero-arm offset must still report (funnel grid rule)
    import math

    from pyspark.sql import functions as F

    from wrangler_spark.datapipe.events import (
        retention_ab_test,
        retention_cohorts_by,
    )

    def d(day):
        return f"1970-01-0{day} 00:00:00"

    rows = []
    for i in range(4):
        rows.append((f"x{i}", d(1), "X"))
        rows.append((f"y{i}", d(1), "Y"))
    rows += [("x0", d(2), "X"), ("x1", d(2), "X"), ("y0", d(2), "Y"),
             ("x0", d(3), "X")]
    df = spark.createDataFrame(rows, "u string, t string, g string").select(
        "u", F.col("t").cast("timestamp").alias("t"), "g")
    grid = retention_cohorts_by(df, "u", "t", "g", period_days=1)
    got = {r["period_offset"]: r for r in
           retention_ab_test(grid, "g", "X", "Y").collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1["users_a"], r1["users_b"]) == (2, 1)
    assert r1["conv_a"] == 0.5 and r1["conv_b"] == 0.25
    pool = 3 / 8
    se = math.sqrt(pool * (1 - pool) * (1 / 4 + 1 / 4))
    assert r1["z"] == round((0.5 - 0.25) / se, 6)
    assert not r1["significant"]              # n=4 per arm: noise
    # offset 2: Y retained nobody — the row exists with users_b=0
    assert (got[2]["users_a"], got[2]["users_b"]) == (1, 0)
    assert got[2]["conv_b"] == 0.0
    # Wilson bounds are proper intervals inside [0, 1]
    for r in got.values():
        assert 0.0 <= r["conv_a_lo"] <= r["conv_a"] <= r["conv_a_hi"] <= 1.0
        assert 0.0 <= r["conv_b_lo"] <= r["conv_b"] <= r["conv_b_hi"] <= 1.0


def test_funnel_by_zero_step_rows(spark):
    # an arm whose users ALL stall before step i still reports its
    # (arm, step i) row with users=0 / conversion=0 — funnel_ab_test's
    # per-step join must see the arm that converted nobody (the most
    # decisive A/B outcome), not drop the row
    from pyspark.sql import functions as F

    from wrangler_spark.datapipe.events import funnel_ab_test, funnel_steps_by

    rows = [
        ("a1", "1970-01-01 00:00:00", "view", "A"),
        ("a1", "1970-01-01 00:01:00", "click", "A"),
        ("a2", "1970-01-01 00:00:00", "view", "A"),
        # arm B: views only, zero clicks
        ("b1", "1970-01-01 00:00:00", "view", "B"),
        ("b2", "1970-01-01 00:00:00", "view", "B"),
    ]
    df = spark.createDataFrame(
        rows, "u string, t string, e string, arm string"
    ).select("u", F.col("t").cast("timestamp").alias("t"), "e", "arm")
    g = funnel_steps_by(df, "u", "t", "e", ["view", "click"], "arm")
    got = {(r["arm"], r["step"]): r for r in g.collect()}
    assert len(got) == 4                       # full 2x2 grid
    assert got[("B", 2)]["users"] == 0
    assert got[("B", 2)]["conversion"] == 0.0
    r = funnel_ab_test(g, "arm", "A", "B").collect()
    assert len(r) == 1                         # the step-2 row survives
    assert r[0]["users_b"] == 0 and r[0]["conv_b"] == 0.0
    assert r[0]["users_a"] == 1 and r[0]["conv_a"] == 0.5


def test_retention_cohorts_by_arms(spark):
    from pyspark.sql import functions as F

    from wrangler_spark.datapipe.events import (
        retention_cohorts,
        retention_cohorts_by,
    )

    rows = [
        # arm X: u1 active days 0 and 1; u2 day 0 only
        ("u1", "1970-01-01 01:00:00", "X"), ("u1", "1970-01-02 01:00:00", "X"),
        ("u2", "1970-01-01 02:00:00", "X"),
        # arm Y: u3 active days 0, 1, 2
        ("u3", "1970-01-01 03:00:00", "Y"), ("u3", "1970-01-02 03:00:00", "Y"),
        ("u3", "1970-01-03 03:00:00", "Y"),
    ]
    df = spark.createDataFrame(rows, "u string, t string, g string").select(
        "u", F.col("t").cast("timestamp").alias("t"), "g")
    got = {(r["g"], str(r["cohort_start"]), r["period_offset"]): r for r in
           retention_cohorts_by(df, "u", "t", "g", period_days=1,
                                max_periods=8).collect()}
    assert got[("X", "1970-01-01", 0)]["active_users"] == 2
    assert got[("X", "1970-01-01", 1)]["retention"] == 0.5
    assert got[("Y", "1970-01-01", 2)]["retention"] == 1.0
    # the grouped grid shares retention_cohorts' output contract:
    # cohort_start is a DATE in both
    import datetime
    assert all(isinstance(r["cohort_start"], datetime.date) for r in
               retention_cohorts_by(df, "u", "t", "g", period_days=1,
                                    max_periods=8).collect())
    # arm totals == the ungrouped grid
    base = {(str(r["cohort_start"]), r["period_offset"]): r["active_users"]
            for r in retention_cohorts(df, "u", "t", period_days=1).collect()}
    agg = {}
    for (g, cs, off), r in got.items():
        agg[(cs, off)] = agg.get((cs, off), 0) + r["active_users"]
    assert agg == base


def test_ab_family_directives(spark):
    from pyspark.sql import functions as F

    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame(
        [("u1", "1970-01-01 00:00:00", "view", "A"),
         ("u1", "1970-01-01 00:01:00", "click", "A"),
         ("u2", "1970-01-01 00:00:00", "view", "B")],
        "u string, t string, e string, arm string").select(
        "u", F.col("t").cast("timestamp").alias("t"), "e", "arm")
    fb = Pipeline.compile("funnel-by :u :t :e 'view,click' :arm").apply(df)
    got = {(r["arm"], r["step"]): r["users"] for r in fb.collect()}
    assert got[("A", 2)] == 1 and got[("B", 1)] == 1
    rb = Pipeline.compile("retention-by :u :t :arm 1 4").apply(df)
    assert rb.filter("arm = 'A'").count() == 1
    ss = Pipeline.compile("session-stats :u :t 30").apply(df).collect()[0]
    assert ss["n_sessions"] == 2 and ss["bounce_rate"] == 0.5
    # the composed A/B readout directives
    fab = Pipeline.compile(
        "funnel-ab :u :t :e 'view,click' :arm 'A' 'B'").apply(df).collect()
    assert len(fab) == 1 and fab[0]["users_a"] == 1 and fab[0]["users_b"] == 0
    rab = Pipeline.compile(
        "retention-ab :u :t :arm 'A' 'B' 1 4").apply(df)
    assert rab.count() == 0        # single-day fixture: no offset >= 1
