"""Interactive layer + user-defined directive (UDD) registration."""

from pyspark.sql import functions as F

from wrangler_spark import Pipeline, directive
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.interactive import execute, schema
from wrangler_spark.parser.tokens import TokenType


def test_execute_roundtrip(spark):
    df = spark.createDataFrame([("alice", "30"), ("bob", "x")], ["name", "age"])
    resp = execute("uppercase :name\nset-type :age int", df, limit=10)
    assert resp.headers == ["name", "age"]
    assert resp.types["age"] == "int"
    assert resp.values[0]["name"] in ("ALICE", "BOB")
    assert resp.directives == ["uppercase", "set-type"]


def test_execute_with_summary_and_errors(spark):
    df = spark.createDataFrame([("a@b.com",), ("junk",)], ["email"])
    resp = execute(
        "send-to-error exp:{ !dq:isEmail(email) } 'bad'", df, with_summary=True
    )
    assert resp.error_count == 1
    assert len(resp.values) == 1
    assert 0 <= resp.summary["email"]["general.null"] <= 1


def test_schema_endpoint(spark):
    df = spark.createDataFrame([("1,2",)], ["body"])
    s = schema("parse-as-csv :body ',' false\nset-type :body_1 long", df)
    assert ("body_1", "bigint") in s


def test_user_defined_directive(spark):
    @directive
    class Reverse(Directive):
        """reverse-string :col — a user-defined directive (UDD parity:
        the reference loads plugin directives via #pragma load-directives;
        here any imported @directive registers)."""

        name = "reverse-string"
        usage = [Arg("column", TokenType.COLUMN)]

        def apply(self, ctx, df):
            col = ctx.resolve(df, self.args["column"])
            return df.withColumn(col, F.reverse(F.col(col)))

    df = spark.createDataFrame([("abc",)], ["s"])
    out = Pipeline.compile("reverse-string :s").apply(df)
    assert out.collect()[0]["s"] == "cba"


def test_pipeline_lineage(spark):
    p = Pipeline.compile("uppercase :name\ndrop :a,:b\nset-column :x exp:{ 1 }")
    lin = p.lineage()
    assert [r["directive"] for r in lin] == ["uppercase", "drop", "set-column"]
    assert lin[0]["columns"] == ["name"]
    assert lin[1]["columns"] == ["a", "b"]


def test_workspace_incremental(spark):
    from wrangler_spark.errors import DirectiveParseError
    from wrangler_spark.interactive import Workspace

    df = spark.createDataFrame([(1, " a "), (2, " b ")], ["id", "v"])
    ws = Workspace("w1", df)
    resp = ws.add("trim :v")
    assert resp.values[0]["v"] == "a"
    resp = ws.add("uppercase :v", "copy :v :v2")
    assert resp.values[0]["v2"] == "A" and ws.recipe().count("\n") == 2

    # bad directive rejected atomically — workspace state unchanged
    import pytest as _pt

    with _pt.raises(DirectiveParseError):
        ws.add("no-such-directive :v")
    assert len(ws.directives) == 3

    assert ws.undo() == ["copy :v :v2"]
    assert [t[0] for t in ws.schema()] == ["id", "v"]
    assert ws.execute().values[1]["v"] == "B"


def test_workspace_persistence_round_trip(spark, tmp_path):
    """wrangler-storage role: a workspace (sample + directive list) saved
    to a directory reloads with identical recipe, schema, and results."""
    from wrangler_spark.interactive import Workspace, WorkspaceStore

    df = spark.createDataFrame(
        [("  Alice  ", "10"), ("BOB", "20"), ("carol", "x")], ["name", "amt"]
    )
    store = WorkspaceStore(spark, str(tmp_path / "workspaces"))
    ws = Workspace("cleanup", df, limit=100)
    ws.add("trim :name", "lowercase :name")
    ws.add("set-type :amt integer")
    store.save(ws)

    assert store.list() == ["cleanup"]
    back = store.load("cleanup")
    assert back.recipe() == ws.recipe()
    assert back.schema() == ws.schema()
    a = sorted(r["name"] for r in back.execute().values)
    b = sorted(r["name"] for r in ws.execute().values)
    assert a == b == ["alice", "bob", "carol"]

    assert store.delete("cleanup") is True
    assert store.list() == [] and store.delete("cleanup") is False
