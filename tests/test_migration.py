"""V1→V2 migration + precondition + sampling + statistics tests."""

from wrangler_spark import Pipeline
from wrangler_spark.parser.migrate import migrate_statement


def test_migrate_statements():
    cases = {
        "set column total price * qty": "set-column :total exp:{ price * qty }",
        "set columns a,b,c": "set-headers :a,:b,:c",
        "drop a,b": "drop :a,:b",
        "rename old new": "rename :old :new",
        "uppercase name": "uppercase :name",
        "filter-row-if-true age > 10": "filter-row exp:{ age > 10 } true",
        "filter-row-if-matched col ^a.*$": "filter-by-regex if-matched :col '^a.*$'",
        "mask-number ssn xxx-##": "mask-number :ssn 'xxx-##'",
        "parse-as-csv body , true": "parse-as-csv :body ',' true",
        "split-to-columns name \\s+": "split-to-columns :name '\\s+'",
        "hash col SHA-256 true": "hash :col SHA-256 true",
    }
    for v1, want in cases.items():
        assert migrate_statement(v1) == want, f"{v1!r} -> {migrate_statement(v1)!r}"


def test_v1_recipe_compiles_and_runs(spark):
    df = spark.createDataFrame([("alice", 5.0, 40), ("bob", 100.0, 10)], ["name", "rate", "qty"])
    # pure V1 syntax end-to-end
    out = Pipeline.compile(
        ["set column total rate * qty", "uppercase name", "filter-row-if-true total > 500"]
    ).apply(df)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] == "ALICE" and rows[0]["total"] == 200.0


def test_precondition(spark):
    df = spark.createDataFrame([(1, "x"), (2, "skip")], ["id", "tag"])
    p = Pipeline.compile("uppercase :tag", precondition="tag == 'skip'")
    out = p.apply(df).collect()
    assert len(out) == 1 and out[0]["tag"] == "X"


def test_sampling(spark):
    from wrangler_spark import sampling

    df = spark.range(1000)
    assert sampling.first_n(df, 10).count() == 10
    b = sampling.bernoulli(df, 0.1, seed=1).count()
    assert 40 <= b <= 200
    r = sampling.reservoir(df, 25, seed=1)
    assert r.count() == 25
    parts = sampling.split(df, [0.8, 0.2], seed=1)
    assert sum(p.count() for p in parts) == 1000


def test_basic_statistics(spark):
    from wrangler_spark.statistics import basic_statistics

    df = spark.createDataFrame(
        [("1", "a@b.com"), ("x", ""), (None, "c@d.org")], ["num", "email"]
    )
    stats = basic_statistics(df)
    assert abs(stats["num"]["general.null"] - 1 / 3) < 1e-9
    assert abs(stats["email"]["general.empty"] - 1 / 3) < 1e-9
    assert abs(stats["num"]["types.integer"] - 1 / 3) < 1e-9
    assert abs(stats["email"]["types.email"] - 2 / 3) < 1e-9
