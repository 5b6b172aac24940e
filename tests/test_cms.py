"""Count-min sketch key-frequency family: the overestimate guarantee,
exact sum-merge (state folds == one-shot), replay idempotence, pinned
geometry, NULL-key sentinel, and the stream edge."""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.datapipe import curation


def _ests(sketch, keys_df, depth, width):
    return {
        r["key"]: r["est"]
        for r in curation.cms_estimate(
            sketch, keys_df, "k", depth, width
        ).collect()
    }


def test_overestimate_and_wide_grid_exact(spark):
    # skewed key distribution: key i appears i times for i in 1..50
    df = spark.range(1, 51).select(
        F.explode(F.expr("sequence(1, id)")).alias("x"),
        F.col("id").cast("string").alias("k"),
    ).select("k")
    true = {r["k"]: r["n"] for r in df.groupBy("k").count()
            .withColumnRenamed("count", "n").collect()}
    probes = df.select("k").distinct()
    # narrow grid: estimates are UPPER bounds, never under
    tight = curation.cms_sketch(df, "k", depth=3, width=16)
    for k, est in _ests(tight, probes, 3, 16).items():
        assert est >= true[k], (k, est, true[k])
    # wide grid: collisions vanish, estimates are exact
    wide = curation.cms_sketch(df, "k", depth=4, width=4096)
    assert _ests(wide, probes, 4, 4096) == true
    # never-seen key estimates 0 on the wide grid
    ghost = spark.createDataFrame([("ghost",)], "k string")
    assert _ests(wide, ghost, 4, 4096)["ghost"] == 0


def test_partitioning_invariance_and_null_key(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), (None,), (None,), ("b",)], "k string")
    a = sorted(map(tuple, curation.cms_sketch(df.repartition(1), "k", 2, 64).collect()))
    b = sorted(map(tuple, curation.cms_sketch(df.repartition(7), "k", 2, 64).collect()))
    assert a == b
    # NULL keys are a real countable key via the sentinel
    sk = curation.cms_sketch(df, "k", depth=4, width=4096)
    nulls = spark.createDataFrame([(None,)], "k string")
    assert _ests(sk, nulls, 4, 4096)[chr(0)] == 3
    with pytest.raises(ValueError, match="depth"):
        curation.cms_sketch(df, "k", depth=0)
    with pytest.raises(ValueError, match="width"):
        curation.cms_sketch(df, "k", width=4)


def test_state_folds_equal_one_shot_and_replay(spark, tmp_path_factory):
    df = spark.range(1, 501).select((F.col("id") % 37).cast("string").alias("k"))
    path = str(tmp_path_factory.mktemp("cmsstate")) + "/st"
    for i in range(3):
        curation.cms_update_state(
            df.filter(F.col("id") % 3 == i), path, "k",
            depth=4, width=256, batch_id=f"b{i}")
    merged, depth, width = curation.cms_from_state(spark, path)
    assert (depth, width) == (4, 256)
    one = sorted(map(tuple, curation.cms_sketch(df, "k", 4, 256).collect()))
    assert sorted(map(tuple, merged.collect())) == one
    # replay: same batch id is a NO-OP
    curation.cms_update_state(
        df.filter(F.col("id") % 3 == 0), path, "k", 4, 256, batch_id="b0")
    merged2, _, _ = curation.cms_from_state(spark, path)
    assert sorted(map(tuple, merged2.collect())) == one
    # the grid is pinned: a different geometry refuses
    with pytest.raises(ValueError, match="incompatible"):
        curation.cms_update_state(df, path, "k", depth=4, width=512,
                                  batch_id="b9")
    with pytest.raises(ValueError, match="empty"):
        curation.cms_from_state(
            spark, str(tmp_path_factory.mktemp("cmsempty")) + "/st")


def test_cms_stream_edge(spark, tmp_path_factory):
    import shutil as _sh

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("user_id").cast("string").alias("k"))
    src = str(tmp_path_factory.mktemp("cms_src"))
    state = str(tmp_path_factory.mktemp("cms_state") / "st")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    q = curation.cms_update_stream(stream, state, "k", src + "_chk",
                                   depth=4, width=256)
    q.awaitTermination(120)
    merged, _, _ = curation.cms_from_state(spark, state)
    one = sorted(map(tuple, curation.cms_sketch(ev, "k", 4, 256).collect()))
    assert sorted(map(tuple, merged.collect())) == one
    _sh.rmtree(src, ignore_errors=True)


def test_distinct_sketch_and_state_triangle(spark, tmp_path_factory):
    """HLL distinct-count family: exact at low cardinality, grouped
    form, NULLs excluded, and the state triangle's strong invariant —
    register max-merge is LOSSLESS, so the reconstructed estimate
    EQUALS the one-shot estimate over the union of all batches."""
    df = spark.range(10_000).select(
        (F.col("id") % 137).alias("u"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 911).alias("d"),
    )
    est = {r["column"]: r["estimate"] for r in
           curation.distinct_sketch(df, ["u", "d"]).collect()}
    assert est["u"] == 137                    # exact at low cardinality
    assert abs(est["d"] - 911) <= 30          # ~1.6% rel err at lgk=12
    grouped = {(r["g"], r["column"]): r["estimate"] for r in
               curation.distinct_sketch(df, ["u"], by="g").collect()}
    assert all(v == 137 for v in grouped.values()) and len(grouped) == 3
    with pytest.raises(ValueError, match="unknown columns"):
        curation.distinct_sketch(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        curation.distinct_sketch(df, [])

    path = str(tmp_path_factory.mktemp("hll") / "st")
    for i in range(3):
        curation.distinct_update_state(
            df.filter(F.col("id") % 3 == i), path, ["u", "d"],
            batch_id=f"b{i}")
    merged = {r["column"]: r["estimate"] for r in
              curation.distinct_from_state(spark, path).collect()}
    assert merged == est                      # lossless register merge
    # replay NO-OP
    curation.distinct_update_state(
        df.filter(F.col("id") % 3 == 0), path, ["u", "d"], batch_id="b0")
    merged2 = {r["column"]: r["estimate"] for r in
               curation.distinct_from_state(spark, path).collect()}
    assert merged2 == est
    # register width pinned
    with pytest.raises(ValueError, match="incompatible"):
        curation.distinct_update_state(df, path, ["u"], lgk=10,
                                       batch_id="b9")
    with pytest.raises(ValueError, match="empty"):
        curation.distinct_from_state(
            spark, str(tmp_path_factory.mktemp("hllempty")) + "/st")
    # grouped state
    gpath = str(tmp_path_factory.mktemp("hllg") / "st")
    curation.distinct_update_state(df, gpath, ["u"], by="g", batch_id="b0")
    gm = {(r["g"], r["column"]): r["estimate"] for r in
          curation.distinct_from_state(spark, gpath).collect()}
    assert gm == {("0", "u"): 137, ("1", "u"): 137, ("2", "u"): 137}


def test_distinct_stream_edge(spark, tmp_path_factory):
    import shutil as _sh

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("user_id").cast("string").alias("k"))
    src = str(tmp_path_factory.mktemp("hll_src"))
    state = str(tmp_path_factory.mktemp("hll_state") / "st")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("k string").parquet(src)
    q = curation.distinct_update_stream(stream, state, ["k"], src + "_chk")
    q.awaitTermination(120)
    merged = {r["column"]: r["estimate"] for r in
              curation.distinct_from_state(spark, state).collect()}
    one = {r["column"]: r["estimate"] for r in
           curation.distinct_sketch(ev, ["k"]).collect()}
    assert merged == one
    _sh.rmtree(src, ignore_errors=True)


def test_distinct_sketch_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.range(1000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 2).cast("string").alias("a"))
    assert Pipeline.compile("distinct-sketch :k").apply(df).collect()[0][
        "estimate"] == 7
    got = sorted(map(tuple,
                     Pipeline.compile("distinct-sketch :k :a").apply(df).collect()))
    assert got == [("0", "k", 7), ("1", "k", 7)]


def test_distinct_overlap_inclusion_exclusion(spark):
    # A = 0..999, B = 500..1499: exact at these cardinalities, so the
    # inclusion-exclusion recovers the true intersection
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    r = curation.distinct_overlap(a, b, "k").collect()[0]
    assert abs(r["est_a"] - 1000) <= 30 and abs(r["est_b"] - 1000) <= 30
    assert abs(r["est_union"] - 1500) <= 40       # ~1.6% rel err regime
    assert abs(r["est_intersection"] - 500) <= 80
    assert 0.25 <= r["jaccard_distinct"] <= 0.42  # true 1/3
    # disjoint sets: clamped at 0, never negative
    c = spark.range(5000, 6000).select(F.col("id").alias("k"))
    r2 = curation.distinct_overlap(a, c, "k").collect()[0]
    assert r2["est_intersection"] >= 0
    assert r2["est_intersection"] <= 60           # ~error bar of 0
