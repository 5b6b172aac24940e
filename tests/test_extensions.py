"""Spark-native extension directives: pivot/unpivot/rollup/asof-join."""

import datetime

import pytest

from wrangler_spark import Pipeline
from wrangler_spark.directives.extensions import asof_join
from wrangler_spark.errors import DirectiveApplyError


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_pivot_and_unpivot_roundtrip_shapes(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0)], ["k", "p", "v"]
    )
    piv = Pipeline.compile("pivot-by :k :p :v sum 'x,y'").apply(df)
    r = {x["k"]: x for x in piv.collect()}
    assert r["a"]["x"] == 1.0 and r["a"]["y"] == 2.0
    assert r["b"]["x"] == 3.0 and r["b"]["y"] is None

    melt = Pipeline.compile("unpivot :k :v :name :val").apply(
        df.select("k", "v")
    )
    assert melt.columns == ["k", "name", "val"] and melt.count() == 3


def test_rollup_levels(spark):
    df = spark.createDataFrame([("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], ["k1", "k2", "v"])
    out = Pipeline.compile("rollup-by :k1,:k2 prop:{s='sum(v)'}").apply(df).collect()
    rows = {(r["k1"], r["k2"]): r["s"] for r in out}
    assert rows[("a", "x")] == 1 and rows[("a", None)] == 3
    assert rows[(None, None)] == 7
    assert len(rows) == 6  # 3 leaves + 2 k1 subtotals + grand total


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(5)), (3, 1, _ts(10)), (4, 2, _ts(3))],
        ["event_id", "uid", "ts"],
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(9), 90.0)], ["uid", "mts", "mark"]
    )
    out = {r["event_id"]: r["mark"] for r in
           asof_join(left, right, "uid", "ts", "mts").collect()}
    assert out[1] is None          # before any mark
    assert out[2] == 50.0          # equal-ts mark matches (inclusive)
    assert out[3] == 90.0          # latest prior mark wins
    assert out[4] is None          # other key, no marks


def test_asof_join_collision_raises(spark):
    left = spark.createDataFrame([(1, 1, _ts(0), 1.0)], ["event_id", "uid", "ts", "mark"])
    right = spark.createDataFrame([(1, _ts(0), 2.0)], ["uid", "mts", "mark"])
    with pytest.raises(DirectiveApplyError, match="collide"):
        asof_join(left, right, "uid", "ts", "mts")


def test_range_join_binned(spark):
    from wrangler_spark.directives.extensions import range_join

    left = spark.createDataFrame([(1, 5.0), (2, 10.0), (3, 25.0), (4, -1.0)], ["id", "v"])
    right = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 10.0, 20.0), (300, 20.0, 30.0)], ["band", "lo", "hi"]
    )
    out = {r["id"]: r["band"] for r in range_join(left, right, "v", "lo", "hi", 7.0).collect()}
    assert out == {1: 100, 2: 200, 3: 300}  # 10.0 lands in [10,20), -1 drops
    plan = range_join(left, right, "v", "lo", "hi", 7.0)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_range_join_left_keeps_unmatched(spark):
    from wrangler_spark.directives.extensions import range_join

    left = spark.createDataFrame([(1, 5.0), (2, 99.0)], ["id", "v"])
    right = spark.createDataFrame([(100, 0.0, 10.0)], ["band", "lo", "hi"])
    out = {r["id"]: r["band"] for r in
           range_join(left, right, "v", "lo", "hi", 7.0, how="left").collect()}
    assert out == {1: 100, 2: None}  # unmatched row survives with null band


def test_asof_join_tolerance(spark):
    """tolerance nulls out matches older than the lookback window —
    merge_asof/attribution semantics; default path (no tolerance)
    unchanged."""
    import datetime as dt

    from wrangler_spark.directives.extensions import asof_join

    def t(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    conv = spark.createDataFrame(
        [(1, t(30)), (2, t(30)), (3, t(30))], "user long, ts timestamp"
    )
    touch = spark.createDataFrame(
        [(1, t(25), "ad_a"),    # 5 min before: inside a 10-min window
         (2, t(5), "ad_b"),     # 25 min before: outside
         ],                      # user 3: no touch at all
        "user long, ts timestamp, campaign string",
    )
    rows = {r["user"]: r["campaign"] for r in
            asof_join(conv, touch, "user", "ts", tolerance=600).collect()}
    assert rows == {1: "ad_a", 2: None, 3: None}
    # without tolerance the stale match still attributes
    rows2 = {r["user"]: r["campaign"] for r in
             asof_join(conv, touch, "user", "ts").collect()}
    assert rows2 == {1: "ad_a", 2: "ad_b", 3: None}
    # numeric ts: tolerance is a raw difference
    conv_n = spark.createDataFrame([(1, 100.0)], "user long, ts double")
    touch_n = spark.createDataFrame([(1, 90.0, "x")], "user long, ts double, v string")
    got = asof_join(conv_n, touch_n, "user", "ts", tolerance=5).collect()[0]["v"]
    assert got is None
    got2 = asof_join(conv_n, touch_n, "user", "ts", tolerance=15).collect()[0]["v"]
    assert got2 == "x"


def test_salted_join_equals_plain_join(spark):
    from wrangler_spark.directives.extensions import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        ["k", "v"],
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("nomatch", "N")], ["k", "tag"]
    )
    for how, skewed in (("inner", "left"), ("left", "left"), ("inner", "right")):
        l, r = (left, right) if skewed == "left" else (right, left)
        got = sorted(map(tuple, salted_join(l, r, "k", how=how, salt=8, skewed=skewed).collect()))
        want = sorted(map(tuple, l.join(r, "k", how).collect()))
        assert got == want, (how, skewed)
    # unmatched LEFT rows survive a left-outer exactly once
    lo = salted_join(left.union(spark.createDataFrame([("alone", 1)], ["k", "v"])),
                     right, "k", how="left", salt=4)
    assert lo.filter("k = 'alone'").count() == 1


def test_salted_join_guards(spark):
    import pytest as _pytest

    from wrangler_spark.directives.extensions import salted_join

    l = spark.createDataFrame([("a", 1)], ["k", "v"])
    r = spark.createDataFrame([("a", 2)], ["k", "w"])
    with _pytest.raises(ValueError, match="unmatched rows"):
        salted_join(l, r, "k", how="right", skewed="left")
    with _pytest.raises(ValueError, match="salt must be"):
        salted_join(l, r, "k", salt=1)
    with _pytest.raises(ValueError, match="skewed must be"):
        salted_join(l, r, "k", skewed="both")
