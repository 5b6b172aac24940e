"""Declarative data-quality constraints (the Deequ posture): one
aggregation pass grades the whole rule list; per-rule semantics for
NULL handling, duplicate counting, bounds, regex and set membership;
the check-constraints directive's compact rule DSL."""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.datapipe.curation import check_constraints
from wrangler_spark.pipeline import Pipeline


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 5.0),
            (2, "b", 50.0),
            (3, None, 150.0),
            (3, "a", None),
            (None, "zz", 10.0),
        ],
        "id long, s string, v double",
    )


def _report(df, rules):
    return {
        (r["rule"], r["column"]): r
        for r in check_constraints(df, rules).collect()
    }


def test_rule_semantics(frame):
    rep = _report(frame, [
        {"rule": "not_null", "col": "s", "max_frac": 0.3},
        {"rule": "unique", "col": "id"},
        {"rule": "range", "col": "v", "min": 0, "max": 100},
        {"rule": "matches", "col": "s", "pattern": "[ab]"},
        {"rule": "in_set", "col": "s", "values": ["a", "b"]},
        {"rule": "min_rows", "n": 5},
    ])
    r = rep[("not_null", "s")]
    assert (r["value"], r["passed"]) == (0.2, True)  # 1 null / 5 rows
    # ids: 1, 2, 3, 3, NULL — the duplicate 3 is the only extra row
    # (the NULL group keeps its first row, like GROUP BY)
    r = rep[("unique", "id")]
    assert (r["value"], r["passed"]) == (0.2, False)
    # 150.0 out of [0, 100]; the NULL v does not violate range
    r = rep[("range", "v")]
    assert (r["value"], r["passed"]) == (0.2, False)
    # "zz" fails the full-match; NULL s doesn't count against matches
    r = rep[("matches", "s")]
    assert (r["value"], r["passed"]) == (0.2, False)
    assert rep[("in_set", "s")]["value"] == 0.2
    r = rep[("min_rows", None)]
    assert (r["value"], r["passed"]) == (5.0, True)


def test_one_sided_range_and_thresholds(frame):
    rep = _report(frame, [
        {"rule": "range", "col": "v", "min": 0},          # nothing below 0
        {"rule": "range", "col": "v", "max": 100, "max_frac": 0.25},
    ])
    assert rep[("range", "v")] is not None
    rows = check_constraints(frame, [
        {"rule": "range", "col": "v", "min": 0},
        {"rule": "range", "col": "v", "max": 100, "max_frac": 0.25},
    ]).collect()
    assert [(r["value"], r["passed"]) for r in rows] == [
        (0.0, True), (0.2, True)]


def test_empty_table_and_errors(spark, frame):
    empty = frame.limit(0)
    rows = check_constraints(empty, [
        {"rule": "not_null", "col": "s"},
        {"rule": "unique", "col": "id"},
        {"rule": "min_rows", "n": 1},
    ]).collect()
    by = {r["rule"]: r for r in rows}
    assert by["not_null"]["value"] == 0.0 and by["not_null"]["passed"]
    assert by["unique"]["value"] == 0.0 and by["unique"]["passed"]
    assert by["min_rows"]["value"] == 0.0 and not by["min_rows"]["passed"]
    with pytest.raises(ValueError, match="empty rule list"):
        check_constraints(frame, [])
    with pytest.raises(ValueError, match="unknown rule"):
        check_constraints(frame, [{"rule": "nope", "col": "s"}])
    with pytest.raises(ValueError, match="min and/or max"):
        check_constraints(frame, [{"rule": "range", "col": "v"}])
    with pytest.raises(ValueError, match="non-empty value set"):
        check_constraints(frame, [{"rule": "in_set", "col": "s", "values": []}])


def test_one_aggregation_pass(frame):
    # the Deequ claim: the whole rule list compiles to ONE aggregate
    # over ONE scan (unique adds an Expand, never a second scan)
    out = check_constraints(frame, [
        {"rule": "not_null", "col": "s"},
        {"rule": "range", "col": "v", "min": 0, "max": 100},
        {"rule": "matches", "col": "s", "pattern": "[ab]"},
        {"rule": "min_rows", "n": 1},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1, plan


def test_directive_dsl(spark, frame):
    out = Pipeline.compile(
        "check-constraints 'not_null:s;unique:id;range:v:0:100;"
        "matches:s:[ab];in_set:s:a|b;min_rows:5'"
    ).apply(frame)
    rows = {(r["rule"], r["column"]): r for r in out.collect()}
    assert rows[("unique", "id")]["value"] == 0.2
    assert rows[("range", "v")]["value"] == 0.2
    assert rows[("matches", "s")]["value"] == 0.2
    assert rows[("min_rows", None)]["passed"]
    # regex with colons survives the matches parse
    out2 = Pipeline.compile(
        "check-constraints 'matches:s:[ab:]{1,2}'"
    ).apply(frame)
    assert out2.collect()[0]["metric"] == "mismatch_frac"
