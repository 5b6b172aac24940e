"""Mergeable log-bin quantile sketch: bounded relative error vs exact
quantiles, partition-order determinism, exact batch merge (state folds ==
one-shot), replay idempotence, and the stream edge."""

import pytest
from pyspark.sql import functions as F

from wrangler_spark.datapipe import numeric


def _exact_nearest_rank(vals, q):
    import math

    s = sorted(vals)
    return s[max(0, math.ceil(q * len(s)) - 1)]


def test_quantiles_within_relative_error(spark):
    # log-uniform-ish positive values + zeros
    df = spark.range(1, 5001).select(
        (F.pow(F.lit(10.0), (F.col("id") % 97).cast("double") / 24.0)).alias("x")
    ).union(spark.range(50).select(F.lit(0.0).alias("x")))
    vals = [r["x"] for r in df.collect()]
    got = {r["prob"]: r["value"] for r in
           numeric.quantiles_sketched(df, "x", (0.5, 0.9, 0.99), rel_err=0.05).collect()}
    for q in (0.5, 0.9, 0.99):
        exact = _exact_nearest_rank(vals, q)
        assert abs(got[q] - exact) <= 0.051 * exact, (q, got[q], exact)


def test_partitioning_invariance_and_merge(spark):
    df = spark.range(1, 2001).select((F.col("id") * 37 % 1999 + 1).cast("double").alias("x"))
    a = sorted(map(tuple, numeric.quantiles_sketched(df.repartition(1), "x").collect()))
    b = sorted(map(tuple, numeric.quantiles_sketched(df.repartition(17), "x").collect()))
    assert a == b
    # histogram of union == sum-merge of split histograms
    h_all = {r["bin"]: r["count"] for r in numeric.log_histogram(df, "x").collect()}
    h0 = numeric.log_histogram(df.filter(F.col("id") % 2 == 0), "x")
    h1 = numeric.log_histogram(df.filter(F.col("id") % 2 == 1), "x")
    merged = {
        r["bin"]: r["count"]
        for r in h0.union(h1).groupBy("bin").agg(F.sum("count").alias("count")).collect()
    }
    assert merged == h_all


def test_guards(spark):
    df = spark.createDataFrame([(-1.0,), (2.0,)], "x double")
    with pytest.raises(ValueError, match="negative"):
        numeric.log_histogram(df, "x")
    with pytest.raises(ValueError, match="rel_err"):
        numeric.log_histogram(df.filter("x > 0"), "x", rel_err=0.0)
    with pytest.raises(ValueError, match="probs"):
        numeric.quantiles_from_histogram(
            numeric.log_histogram(df.filter("x > 0"), "x"), probs=(1.5,))
    # all-zero column: every quantile is the zero bin
    z = spark.createDataFrame([(0.0,)] * 5, "x double")
    got = {r["prob"]: r["value"] for r in numeric.quantiles_sketched(z, "x").collect()}
    assert set(got.values()) == {0.0}


def test_state_folds_equal_one_shot_and_replay(spark, tmp_path_factory):
    df = spark.range(1, 1001).select((F.col("id") % 251 + 1).cast("double").alias("x"))
    path = str(tmp_path_factory.mktemp("qstate")) + "/st"
    for k in range(3):
        numeric.hist_update_state(
            df.filter(F.col("x") % 3 == k), path, "x", batch_id=f"b{k}")
    one = sorted(map(tuple, numeric.quantiles_sketched(df, "x").collect()))
    rec = sorted(map(tuple, numeric.quantiles_from_state(spark, path).collect()))
    assert rec == one
    # replay: same batch id is a NO-OP
    numeric.hist_update_state(df.filter(F.col("x") % 3 == 0), path, "x", batch_id="b0")
    assert sorted(map(tuple, numeric.quantiles_from_state(spark, path).collect())) == one
    # a different rel_err refuses: the bin space is pinned by the state
    with pytest.raises(ValueError, match="incompatible"):
        numeric.hist_update_state(df, path, "x", rel_err=0.01, batch_id="b9")
    with pytest.raises(ValueError, match="empty"):
        numeric.quantiles_from_state(
            spark, str(tmp_path_factory.mktemp("qempty")) + "/st")


def test_quantile_stream_edge(spark, tmp_path_factory):
    import shutil as _sh

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        F.col("l_extendedprice").cast("double").alias("x"))
    src = str(tmp_path_factory.mktemp("qstream_src"))
    state = str(tmp_path_factory.mktemp("qstream_state") / "st")
    li.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("x double").parquet(src)
    q = numeric.hist_update_stream(stream, state, "x", src + "_chk")
    q.awaitTermination(120)
    inc = sorted(map(tuple, numeric.quantiles_from_state(spark, state).collect()))
    one = sorted(map(tuple, numeric.quantiles_sketched(li, "x").collect()))
    assert inc == one and len(inc) == 3
    _sh.rmtree(src, ignore_errors=True)


def test_directive_forms(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.range(1, 101).select((F.col("id") % 10 + 1).cast("double").alias("x"))
    q = Pipeline.compile("quantiles-sketched :x '0.5,0.9' 0.05").apply(df)
    got = {r["prob"]: r["value"] for r in q.collect()}
    assert set(got) == {0.5, 0.9} and all(v > 0 for v in got.values())
    s = Pipeline.compile("key-skew :x 3").apply(df)
    assert s.count() == 3 and s.columns == ["key", "n", "share"]


def test_grouped_quantiles(spark):
    # two groups with different scales; per-group values within rel_err
    df = spark.range(1, 1001).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("g"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 100 + 1).cast("double"))
        .otherwise((F.col("id") % 100 + 1).cast("double") * 1000.0).alias("x"),
    )
    got = {(r["g"], r["prob"]): r["value"] for r in
           numeric.quantiles_sketched_by(df, "x", "g", (0.5,), 0.05).collect()}
    va = [r["x"] for r in df.filter("g = 'a'").collect()]
    vb = [r["x"] for r in df.filter("g = 'b'").collect()]
    ea, eb = _exact_nearest_rank(va, 0.5), _exact_nearest_rank(vb, 0.5)
    assert abs(got[("a", 0.5)] - ea) <= 0.051 * ea
    assert abs(got[("b", 0.5)] - eb) <= 0.051 * eb
    # null group rows drop; negatives raise
    import pytest as _pytest

    with _pytest.raises(ValueError, match="negative"):
        numeric.quantiles_sketched_by(
            spark.createDataFrame([("a", -1.0)], "g string, x double"), "x", "g")


def test_ks_drift_identical_and_shifted(spark):
    a = spark.range(1, 2001).select((F.col("id") % 100 + 1).cast("double").alias("x"))
    b = spark.range(1, 2001).select((F.col("id") % 100 + 1).cast("double").alias("x"))
    same = numeric.ks_drift(a, b, "x").collect()[0]
    assert same["ks"] == 0.0 and not same["drifted"]
    c = spark.range(1, 2001).select(((F.col("id") % 100 + 1) * 3.0).alias("x"))
    diff = numeric.ks_drift(a, c, "x").collect()[0]
    assert diff["ks"] > diff["ks_critical"] and diff["drifted"]
    # vs python reference on the SAME binning (scipy-free: exact fold)
    import math

    base = 1.05 ** 2

    def bins(vals):
        out = {}
        for v in vals:
            bn = -(1 << 31) if v == 0 else math.floor(round(math.log(v) / math.log(base), 9))
            out[bn] = out.get(bn, 0) + 1
        return out

    va = [float(r["x"]) for r in a.collect()]
    vc = [float(r["x"]) for r in c.collect()]
    ha, hc = bins(va), bins(vc)
    ca = cb = 0
    mx = 0.0
    for bn in sorted(set(ha) | set(hc)):
        ca += ha.get(bn, 0)
        cb += hc.get(bn, 0)
        mx = max(mx, abs(ca / len(va) - cb / len(vc)))
    assert diff["ks"] == round(mx, 6)


def test_ks_from_state_snapshots(spark, tmp_path_factory):
    # drift between a TIME-TRAVELED snapshot of one quantile state and
    # its latest read: compaction cadence IS snapshot cadence, so pin
    # the pre-compaction version (= batch 0 only), append the shifted
    # batch into the compacted version, and KS the two reads
    from wrangler_spark.datapipe import _layout, maintenance

    df1 = spark.range(1, 1001).select((F.col("id") % 50 + 1).cast("double").alias("x"))
    df2 = spark.range(1, 1001).select(((F.col("id") % 50 + 1) * 10.0).alias("x"))
    path = str(tmp_path_factory.mktemp("ksstate")) + "/st"
    numeric.hist_update_state(df1, path, "x", batch_id="b0")
    # v1 = batch 0; the second compaction freezes it (a version's
    # content grows until the NEXT version exists), so b1's append
    # lands in v2 and the v1 pin reads batch 0 alone
    maintenance.compact_index(spark, path)
    v0 = max(sn["version"] for sn in _layout.snapshots(spark, path)
             if sn["committed"])
    maintenance.compact_index(spark, path)
    numeric.hist_update_state(df2, path, "x", batch_id="b1")
    ha = numeric.hist_from_state(spark, path, version=v0)
    hb = numeric.hist_from_state(spark, path)
    r = numeric.ks_from_histograms(ha, hb).collect()[0]
    assert r["n_a"] == 1000 and r["n_b"] == 2000 and r["ks"] > 0.4


def test_impute_strategies(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None),
         ("c", None)],
        "g string, v double")
    by_mean = {(r["g"], i): r["vi"] for i, r in enumerate(
        numeric.impute_column(df, "v", "mean", by=["g"], out_col="vi")
        .orderBy("g", "v").collect())}
    assert by_mean[("a", 0)] == 2.0       # a's NULL <- mean(1, 3)
    assert by_mean[("b", 3)] == 10.0
    assert by_mean[("c", 5)] is None      # all-NULL group stays NULL
    glob = sorted(r["v"] for r in numeric.impute_column(df, "v", "mean").collect())
    assert glob.count(4.666667) == 3      # micro-unit mean of 1, 3, 10
    med = numeric.impute_column(df, "v", "median", by=["g"]).orderBy("g", "v").collect()
    assert [r["v"] for r in med[:3]] == [1.0, 2.0, 3.0]  # NULL <- median(1,3)
    mode = numeric.impute_column(
        spark.createDataFrame([(5.0,), (5.0,), (2.0,), (2.0,), (None,)], "v double"),
        "v", "mode").collect()
    assert sorted(r["v"] for r in mode)[0] == 2.0  # tie -> smallest value
    const = numeric.impute_column(df, "v", 0.5)
    assert const.filter("v = 0.5").count() == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown strategy"):
        numeric.impute_column(df, "v", "zero")


def test_impute_directive(spark):
    from wrangler_spark.pipeline import Pipeline

    df = spark.createDataFrame([("a", 1.0), ("a", None)], "g string, v double")
    out = Pipeline.compile("impute :v mean g").apply(df)
    assert sorted(r["v"] for r in out.collect()) == [1.0, 1.0]
    out2 = Pipeline.compile("impute :v 9.5").apply(df)
    assert sorted(r["v"] for r in out2.collect()) == [1.0, 9.5]


def test_corr_matrix(spark):
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2 + 1).cast("double").alias("y"),
        (-F.col("id").cast("double")).alias("z"),
        F.lit(5.0).alias("c"),
        F.when(F.col("id") % 4 == 0, None)
        .otherwise(F.col("id").cast("double")).alias("p"),
    )
    got = {(r["col_a"], r["col_b"]): r for r in
           numeric.corr_matrix(df, ["x", "y", "z", "c", "p"]).collect()}
    assert got[("x", "y")]["corr"] == 1.0
    assert got[("x", "z")]["corr"] == -1.0
    assert got[("x", "c")]["corr"] is None       # zero variance
    assert got[("x", "p")]["n"] == 75            # pairwise deletion
    assert got[("x", "p")]["corr"] == 1.0
    # partition invariance (exact integer moments)
    a = sorted(map(tuple, numeric.corr_matrix(df.repartition(1), ["x", "y", "p"]).collect()))
    b = sorted(map(tuple, numeric.corr_matrix(df.repartition(13), ["x", "y", "p"]).collect()))
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="two columns"):
        numeric.corr_matrix(df, ["x"])
    with _pytest.raises(ValueError, match="duplicate"):
        numeric.corr_matrix(df, ["x", "x"])


def test_corr_matrix_large_magnitude_sums(spark):
    # the plain sums must accumulate as decimal(38,0), not int64: 2M
    # rows of ~4.7e6-valued columns put the micro-unit sum at ~9.4e18 —
    # past LongType's 9.22e18, where an int64 sum wraps silently
    # (non-ANSI) or errors (ANSI) — while Sx^2 ~ 8.8e37 still fits the
    # documented decimal(38,0) bound
    df = spark.range(2_000_000).select(
        (F.col("id") + 3_700_000).cast("double").alias("x"),
        (F.col("id") + 3_700_001).cast("double").alias("y"),
    )
    got = numeric.corr_matrix(df, ["x", "y"]).collect()[0]
    assert got["n"] == 2_000_000
    assert got["corr"] == 1.0
