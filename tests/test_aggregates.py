"""Transient-variable directives: set-variable feeding later expressions,
increment-variable observed counters."""

from wrangler_spark import Pipeline


def test_set_variable_feeds_expressions(spark):
    df = spark.createDataFrame([(10.0,), (200.0,)], ["price"])
    p = Pipeline.compile(
        "set-variable threshold exp:{ 100.0 }\n"
        "set-column :is_big exp:{ price > threshold }"
    )
    rows = {r["price"]: r["is_big"] for r in p.apply(df).collect()}
    assert rows[10.0] is False and rows[200.0] is True


def test_increment_variable_observed(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["x"])
    p = Pipeline.compile("increment-variable bigs 1 exp:{ x >= 7 }")
    result = p.transform(df)
    assert result.df.count() == 10  # rows pass through untouched
    assert result.variable("bigs") == 3
