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


def test_workspace_store_service_lifecycle(spark, tmp_path):
    """Golden mirror of the reference service's workspace lifecycle
    (wrangler-service DirectivesHandler.java:555-595): every execute runs
    the CURRENT recipe over the workspace sample under the sampling
    limit, the response carries (values, headers, types, directives), and
    the executed recipe is persisted with the workspace — a reload after
    further edits + save must re-execute byte-identically to the session
    that saved it."""
    from wrangler_spark.interactive import Workspace, WorkspaceStore

    df = spark.createDataFrame(
        [(i, f" u{i} ", str(i * 10)) for i in range(8)], ["id", "name", "amt"]
    )
    store = WorkspaceStore(spark, str(tmp_path / "ws"))

    # session 1: iterate (execute-on-sample per add), then save
    ws = Workspace("sess", df, limit=5)
    ws.add("trim :name")
    r1 = ws.add("set-type :amt integer")
    assert r1.directives == ["trim", "set-type"]  # response carries recipe
    store.save(ws)

    # session 1 continues editing AFTER the save; re-save persists the
    # updated request (the service's updateWorkspaceRequest overwrite)
    ws.add("uppercase :name")
    store.save(ws)

    # session 2: reload → identical recipe, schema, and execution response
    back = store.load("sess")
    assert back.recipe() == "trim :name\nset-type :amt integer\nuppercase :name"
    a, b = ws.execute(), back.execute()
    assert a.headers == b.headers and a.types == b.types
    assert a.values == b.values and a.directives == b.directives
    # the workspace sample was bounded to 5 rows at creation (the
    # service's sampling subList) — both sessions execute over exactly it
    assert {r["name"] for r in b.values} == {f"U{i}" for i in range(5)}

    # the sampling limit contract: the sample is bounded at workspace
    # creation (the design-time subList), so a reloaded workspace made
    # from a limited sample executes over exactly that many rows
    small = Workspace("lim", df, limit=3)
    small.add("trim :name")
    store.save(small)
    assert len(store.load("lim").execute().values) == len(small.execute().values)
