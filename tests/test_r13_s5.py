"""Round-13 session-5 focused tests: internals changed by the
optimization batches — banded-threshold levenshtein verification,
the single-pass calibration grid, and the observe-riding grid guards.
Each pins bit-level equivalence with the shape it replaced."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _lev(a: str, b: str) -> int:
    # reference full-DP levenshtein (the semantics the banded form
    # must reproduce below its threshold)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_entity_match_threshold_lev_matches_full_dp(spark):
    """The banded levenshtein(l, r, threshold=budget) tail emits exactly
    the pairs and distances the full-DP <= budget filter emitted:
    distances at 0, at the budget, just over it, far over it, and null
    attributes."""
    from wrangler_spark.datapipe import dedup

    rows = [
        # one block: names at controlled distances from "alpha"
        (1, "b", "alpha"),
        (2, "b", "alpha"),      # d(1,2)=0
        (3, "b", "alphX"),      # d(1,3)=1
        (4, "b", "alXY"),       # d(1,4)=3  (over budget 2)
        (5, "b", None),         # null attribute never matches
        (6, "b", "zzzzzzzzzz"), # far over budget
        (7, "b", "alpXY"),      # d(1,7)=2 — exactly at the budget
    ]
    df = spark.createDataFrame(rows, "id long, blk string, name string")
    got = {
        (r["id_a"], r["id_b"]): r["name_dist"]
        for r in dedup.entity_match_pairs(
            df, "id", ["blk"], [("name", 2)]
        ).collect()
    }
    names = {r[0]: r[2] for r in rows}
    expect = {}
    for a in sorted(names):
        for b in sorted(names):
            if a >= b or names[a] is None or names[b] is None:
                continue
            d = _lev(names[a], names[b])
            if d <= 2:
                expect[(a, b)] = d
    assert got == expect
    # the survivors include a pair at EXACTLY the budget boundary —
    # the case a strict-inequality banded implementation would drop
    assert 2 in expect.values()


def test_calibration_single_pass_bad_rows_still_raise(spark):
    from wrangler_spark.datapipe.numeric import (
        calibration_bins, calibration_summary)

    bad_score = spark.createDataFrame(
        [(1.2, 1), (0.5, 0)], "score double, y int")
    with pytest.raises(ValueError, match="must lie in"):
        calibration_bins(bad_score, "score", "y")
    bad_label = spark.createDataFrame(
        [(0.2, 2), (0.5, 0)], "score double, y int")
    with pytest.raises(ValueError, match="must lie in"):
        calibration_summary(bad_label, "score", "y")


def test_calibration_summary_empty_frame_row(spark):
    """Empty input keeps the old one-row (n=0, null, null) contract."""
    from wrangler_spark.datapipe.numeric import calibration_summary

    empty = spark.createDataFrame([], "score double, y int")
    rows = calibration_summary(empty, "score", "y").collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 0
    assert rows[0]["ece"] is None and rows[0]["brier"] is None


def test_calibration_null_rows_drop_not_raise(spark):
    """Null score/label rows are filtered (never routed to the
    sentinel bin), exactly as the pre-fold guard behaved."""
    from wrangler_spark.datapipe.numeric import calibration_bins

    df = spark.createDataFrame(
        [(0.25, 1), (None, 1), (0.75, None), (0.75, 0)],
        "score double, y int")
    got = {r["bin"]: r for r in
           calibration_bins(df, "score", "y", 2).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n"] == 1 and got[1]["n"] == 1


def test_fill_grid_span_scalar_observe_ride(spark):
    """The resample span guard still raises (scalar now rides the
    checkpoint job) and the grid is unchanged for a healthy input."""
    from wrangler_spark.datapipe import events

    df = spark.createDataFrame(
        [("k", "2024-01-01 00:05:00", 1.0),
         ("k", "2024-01-01 03:55:00", 3.0)],
        "key string, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = events.resample(df, "key", "ts", "v",
                          every_minutes=60, agg="sum", fill="zero")
    vals = [r["value"] for r in out.orderBy("bucket").collect()]
    assert vals == [1.0, 0.0, 0.0, 3.0]
    with pytest.raises(ValueError, match="spans"):
        events.resample(df, "key", "ts", "v",
                        every_minutes=1, agg="sum", fill="zero",
                        max_periods=10)


def test_pq_encode_codes_only_matches_join_path(spark):
    """codes_only=True returns exactly the (id, code) pairs the
    join-back shape carries, including the null-code row a broken
    vector produces."""
    from wrangler_spark.datapipe import similarity

    rows = [(i, [float((i * 7 + j) % 5) for j in range(16)]) for i in range(20)]
    rows.append((99, None))  # broken vector -> all-null code array
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = similarity.pq_train(df, dim=16, m=4, k=4, iters=0)
    joined = {
        r["vec_id"]: r["pq_code"]
        for r in similarity.pq_encode(df, cb, dim=16, m=4).collect()
    }
    codes = {
        r["vec_id"]: r["pq_code"]
        for r in similarity.pq_encode(
            df, cb, dim=16, m=4, codes_only=True
        ).collect()
    }
    assert codes == joined


def test_corr_matrix_fused_probe_paths_agree(spark):
    """The fused probe's shared-moments fast path (null-free input)
    and the exact pairwise path (any null present) produce identical
    correlations: an appended all-columns-null row is dropped from
    every pair by pairwise deletion, so both frames carry the same
    moments while exercising opposite branches."""
    from wrangler_spark.datapipe.numeric import corr_matrix

    clean = spark.range(500).selectExpr(
        "cast(id % 7 as double) a",
        "cast(id % 13 as double) b",
        "cast(id * id % 31 as double) c")
    with_null_row = clean.unionByName(spark.sql(
        "SELECT cast(null as double) a, cast(null as double) b, "
        "cast(null as double) c"))
    fast = sorted(map(tuple, corr_matrix(clean, ["a", "b", "c"]).collect()))
    exact = sorted(map(tuple, corr_matrix(
        with_null_row, ["a", "b", "c"]).collect()))
    assert fast == exact
