"""Column directives — golden-value tests in the reference test style
(small literal frames + recipe strings + exact asserts)."""

import pytest

from wrangler_spark import Pipeline
from wrangler_spark.errors import DirectiveApplyError


@pytest.fixture(scope="module")
def emp(spark):
    return spark.createDataFrame(
        [(1, "alice", "smith", 25.0), (2, "bob", "jones", 30.0)],
        ["id", "first", "last", "wage"],
    )


def run(recipe, df):
    return Pipeline.compile(recipe).apply(df)


def test_drop(emp):
    out = run("drop :first,:last", emp)
    assert out.columns == ["id", "wage"]


def test_keep(emp):
    out = run("keep :id,:first", emp)
    assert out.columns == ["id", "first"]


def test_rename(emp):
    out = run("rename :first :fname", emp)
    assert "fname" in out.columns and "first" not in out.columns


def test_rename_conflict(emp):
    with pytest.raises(DirectiveApplyError):
        run("rename :first :last", emp)


def test_set_headers(emp):
    out = run("set-headers :a,:b", emp)
    assert out.columns == ["a", "b", "last", "wage"]


def test_copy_and_force(emp):
    out = run("copy :first :first_copy", emp)
    rows = out.orderBy("id").collect()
    assert rows[0]["first_copy"] == "alice"
    with pytest.raises(DirectiveApplyError):
        run("copy :first :last", emp)
    out = run("copy :first :last true", emp)
    assert out.orderBy("id").collect()[0]["last"] == "alice"


def test_merge(emp):
    out = run("merge :first :last :full ' '", emp)
    assert out.orderBy("id").collect()[0]["full"] == "alice smith"


def test_swap(emp):
    out = run("swap :first :last", emp)
    r = out.orderBy("id").collect()[0]
    assert r["first"] == "smith" and r["last"] == "alice"
    assert out.columns == ["id", "last", "first", "wage"]


def test_split_to_columns(spark):
    df = spark.createDataFrame([("a|b|c",), ("x|y",)], ["v"])
    out = Pipeline.compile("split-to-columns :v '\\|'").apply(df)
    rows = {r["v"]: r for r in out.collect()}
    assert rows["a|b|c"]["v_3"] == "c"
    assert rows["x|y"]["v_3"] is None


def test_set_type(spark):
    df = spark.createDataFrame([("12", "3.5", "true"), ("", "x", "false")], ["a", "b", "c"])
    out = Pipeline.compile(
        "set-type :a int\nset-type :b double\nset-type :c boolean"
    ).apply(df)
    assert dict(out.dtypes) == {"a": "int", "b": "double", "c": "boolean"}
    rows = out.collect()
    assert rows[0]["a"] == 12 and rows[0]["b"] == 3.5 and rows[0]["c"] is True
    assert rows[1]["a"] is None and rows[1]["b"] is None


def test_set_type_decimal(spark):
    df = spark.createDataFrame([("3.14159",)], ["x"])
    out = Pipeline.compile("set-type :x decimal 3").apply(df)
    assert out.dtypes[0][1] == "decimal(38,3)"


def test_cleanse_column_names(spark):
    df = spark.createDataFrame([(1, 2)], ["First Name", "AGE!"])
    out = Pipeline.compile("cleanse-column-names").apply(df)
    assert out.columns == ["first_name", "age_"]


def test_change_column_case(emp):
    out = run("change-column-case upper", emp)
    assert out.columns == ["ID", "FIRST", "LAST", "WAGE"]


def test_columns_replace(emp):
    out = run("columns-replace 's/^f/F/'", emp)
    assert out.columns == ["id", "First", "last", "wage"]


def test_case_insensitive_resolution(emp):
    out = run("drop :FIRST", emp)
    assert "first" not in out.columns
