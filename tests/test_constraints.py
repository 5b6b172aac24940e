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


def test_constraints_state_folds_and_replay(spark, tmp_path_factory):
    from wrangler_spark.datapipe import curation

    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id")).alias("x"),
        (F.col("id") % 7).cast("double").alias("v"),
    )
    rules = [
        {"rule": "not_null", "col": "x", "max_frac": 0.05},
        {"rule": "range", "col": "v", "min": 0, "max": 5},
        {"rule": "min_rows", "n": 50},
    ]
    path = str(tmp_path_factory.mktemp("dqstate")) + "/st"
    for i in range(3):
        curation.constraints_update_state(
            df.filter(F.col("v") % 3 == i), path, rules, batch_id=f"b{i}")
    # history = the per-batch time series: 3 batches x 3 rules
    hist = curation.constraints_history(spark, path)
    assert hist.count() == 9
    assert hist.select("batch_id").distinct().count() == 3
    # merged report == one-shot over the union
    merged = {(r["rule"], r["column"]): (r["value"], r["passed"])
              for r in curation.constraints_from_state(spark, path).collect()}
    one = {(r["rule"], r["column"]): (r["value"], r["passed"])
           for r in curation.check_constraints(df, rules).collect()}
    assert merged == one
    # replay NO-OP
    curation.constraints_update_state(
        df.filter(F.col("v") % 3 == 0), path, rules, batch_id="b0")
    assert curation.constraints_history(spark, path).count() == 9
    # unique rules are per-batch only: excluded from the merged view
    curation.constraints_update_state(
        df, path, [{"rule": "unique", "col": "x"}], batch_id="b3")
    assert curation.constraints_from_state(spark, path).filter(
        "rule = 'unique'").count() == 0
    assert curation.constraints_history(spark, path).filter(
        "rule = 'unique'").count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        curation.constraints_from_state(
            spark, str(tmp_path_factory.mktemp("dqempty")) + "/st")


def test_constraints_stream_monitor(spark, tmp_path_factory):
    import shutil as _sh

    from wrangler_spark.datapipe import curation

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "value")
    src = str(tmp_path_factory.mktemp("dq_src"))
    state = str(tmp_path_factory.mktemp("dq_state") / "st")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    rules = [{"rule": "not_null", "col": "user_id"},
             {"rule": "range", "col": "value", "min": 0, "max": 1e9}]
    q = curation.constraints_update_stream(stream, state, rules, src + "_chk")
    q.awaitTermination(120)
    merged = {r["rule"]: r for r in
              curation.constraints_from_state(spark, state).collect()}
    one = {r["rule"]: r for r in
           curation.check_constraints(ev, rules).collect()}
    for k in one:
        assert merged[k]["value"] == one[k]["value"]
        assert merged[k]["passed"] == one[k]["passed"]
    _sh.rmtree(src, ignore_errors=True)


def test_profile_and_suggest_loop(spark):
    from wrangler_spark.datapipe.curation import (
        check_constraints as _check,
        profile_table,
        suggest_constraints,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 9.5), (3, None, 1.0)],
        "id long, s string, v double")
    prof = {r["column"]: r for r in profile_table(df, exact=True).collect()}
    assert prof["id"]["n_distinct"] == 3 and prof["id"]["n_null"] == 0
    assert prof["s"]["null_frac"] == 0.333333
    assert prof["s"]["n_distinct"] == 3  # a, b, and the NULL group
    assert prof["v"]["min"] == "1.0" and prof["v"]["max"] == "9.5"
    rules = suggest_constraints(profile_table(df, exact=True))
    kinds = {(r["rule"], r.get("col")) for r in rules}
    # id: complete + unique + numeric range; s is nullable -> no not_null
    assert ("not_null", "id") in kinds and ("unique", "id") in kinds
    assert ("range", "v") in kinds and ("not_null", "s") not in kinds
    assert ("min_rows", None) in kinds
    # the loop closes: suggested rules PASS on the data they came from
    rep = _check(df, rules)
    assert all(r["passed"] for r in rep.collect())
    # with the table handle: low-cardinality string columns suggest
    # in_set with the observed (sorted, non-null) value set — and the
    # loop STILL closes
    rules2 = suggest_constraints(profile_table(df, exact=True), df=df)
    in_sets = {r["col"]: r["values"] for r in rules2 if r["rule"] == "in_set"}
    assert in_sets == {"s": ["a", "b"]}      # id/v not strings; s has 2 vals
    assert all(r["passed"] for r in _check(df, rules2).collect())
    # a high-cardinality string column is NOT in_set-suggested
    wide = spark.range(100).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("s"))
    r3 = suggest_constraints(profile_table(wide, exact=True), df=wide,
                             in_set_max_distinct=20)
    assert not [r for r in r3 if r["rule"] == "in_set"]
    # column selection + unknown column
    assert profile_table(df, cols=["id"], exact=True).count() == 1
    with pytest.raises(ValueError, match="unknown columns"):
        profile_table(df, cols=["nope"])


def test_profile_single_scan(spark):
    from wrangler_spark.datapipe.curation import profile_table

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1, plan


def test_enforce_constraints_error_channel(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (3, "zz", 150.0), (4, "b", -1.0)],
        "id long, s string, v double")
    res = Pipeline.compile(
        "enforce-constraints 'not_null:s;range:v:0:100;in_set:s:a|b'"
    ).transform(df)
    assert [r["id"] for r in res.df.orderBy("id").collect()] == [1]
    errs = {e["message"] for e in res.errors().collect()}
    # each row leaves at its FIRST failing rule: 2 at not_null, 3 and 4
    # at range (3's "zz" never reaches in_set)
    assert errs == {"not_null:s", "range:v"}
    assert res.errors().count() == 3
    res2 = Pipeline.compile(
        "enforce-constraints 'in_set:s:a|b'").transform(df)
    assert {e["message"] for e in res2.errors().collect()} == {"in_set:s"}
    with pytest.raises(Exception, match="table-level"):
        Pipeline.compile("enforce-constraints 'unique:id'").transform(df)
    with pytest.raises(Exception, match="unknown rule"):
        Pipeline.compile("enforce-constraints 'bogus:x'").transform(df)


def test_suggest_constraints_shape_rules(spark):
    from wrangler_spark.datapipe import curation

    df = spark.createDataFrame(
        [
            ("1", "a@b.com", "Clerk#001", '{"k": 1}', "free text one", "7"),
            ("42", "x@y.org", "Clerk#002", '{"k": 2}', "more words", "3.5"),
            ("-7", "q@r.io", "Node#999", '{}', "and more", "1"),
        ],
        "ints string, emails string, ids string, js string, "
        "prose string, mixed string",
    )
    prof = curation.profile_table(df, exact=True)
    rules = curation.suggest_constraints(prof, df=df)
    shapes = {r["col"]: r["shape"] for r in rules if r["rule"] == "matches"}
    # first-match priority: integer wins over decimal for pure ints;
    # a mixed int/decimal column falls through both to none of the
    # more specific shapes (decimal doesn't cover bare ints)
    assert shapes["ints"] == "integer"
    assert shapes["emails"] == "email"
    assert shapes["ids"] == "entity_id"
    assert shapes["js"] == "json_object"
    assert "prose" not in shapes and "mixed" not in shapes
    # the closed loop: every suggested rule passes on its own data
    report = check_constraints(df, rules)
    assert all(r["passed"] for r in report.collect())


def test_suggest_constraints_shape_null_and_uuid(spark):
    from wrangler_spark.datapipe import curation

    df = spark.createDataFrame(
        [("123e4567-e89b-12d3-a456-426614174000",), (None,), (None,)],
        "u string")
    rules = curation.suggest_constraints(
        curation.profile_table(df, exact=True), df=df)
    m = [r for r in rules if r["rule"] == "matches"]
    # nulls don't block the shape; the one non-null value decides
    assert len(m) == 1 and m[0]["shape"] == "uuid"
    all_null = spark.createDataFrame([(None,), (None,)], "u string")
    rules2 = curation.suggest_constraints(
        curation.profile_table(all_null, exact=True), df=all_null)
    # a column with no values suggests no shape (nothing to fit)
    assert not [r for r in rules2 if r["rule"] == "matches"]
