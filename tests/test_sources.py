"""Source/sink integration: JDBC round-trip against embedded Derby (the
JDBC driver Spark ships for its Hive metastore), raw-line reads, format
sniffing, partitioned parquet writes.

Parity target: the reference service's DATABASE connection handler
(`wrangler-service/.../database/DatabaseHandler.java`) samples via JDBC;
here the same surface is `sources.read_jdbc` with partitioned reads.
"""

import pytest

from pyspark.sql import functions as F

from wrangler_spark import Pipeline
from wrangler_spark.sources import read_jdbc, read_raw_lines, sniff_format, write

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_roundtrip_with_recipe(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("jdbc")) + "/db"
    url = f"jdbc:derby:{db};create=true"
    src = spark.createDataFrame(
        [(i, f"name{i}", float(i * 10)) for i in range(100)], ["id", "name", "val"]
    )
    src.write.jdbc(url, "people", mode="overwrite", properties={"driver": DERBY})

    df = read_jdbc(spark, url, "people", driver=DERBY)
    assert df.count() == 100

    out = Pipeline.compile("uppercase :name\nfilter-row exp:{ val >= 500.0 } true").apply(df)
    rows = out.orderBy("id").collect()
    assert len(rows) == 50
    assert rows[0]["name"] == "NAME0" and rows[0]["val"] == 0.0


def test_jdbc_partitioned_read(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("jdbcp")) + "/db"
    url = f"jdbc:derby:{db};create=true"
    spark.createDataFrame(
        [(i, i % 7) for i in range(1000)], ["id", "bucket"]
    ).write.jdbc(url, "t", mode="overwrite", properties={"driver": DERBY})

    df = read_jdbc(spark, url, "t", partition_column="id", num_partitions=4, driver=DERBY)
    # bounds queried, stride split: 4 parallel JDBC partitions
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.agg(F.sum("id")).collect()[0][0] == 499500


def test_raw_lines_and_sniff(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,1\nb,2\n")
    assert sniff_format(str(p)) == "csv"
    body = read_raw_lines(spark, str(p))
    out = Pipeline.compile("parse-as-csv :body ',' false\ndrop :body").apply(body)
    assert out.count() == 2 and out.columns == ["body_1", "body_2"]


def test_partitioned_parquet_write(spark, tmp_path):
    d = str(tmp_path / "out")
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["v", "k"])
    write(df, d, fmt="parquet", mode="overwrite", partition_by=["k"])
    back = spark.read.parquet(d)
    assert back.count() == 3
    # partition pruning: filter on the partition column prunes directories
    plan = back.filter(F.col("k") == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(k" in plan


def test_gzip_csv_read(spark, tmp_path):
    import gzip

    from wrangler_spark.sources import read

    p = tmp_path / "d.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("x,y\n1,a\n2,b\n")
    assert sniff_format(str(p)) == "csv"
    df = read(spark, str(p))
    assert df.count() == 2 and df.columns == ["x", "y"]


def test_write_corpus_file_sizing(spark, tmp_path_factory):
    """write_corpus aims files at the target size: a small target splits
    output into more files than a large one; coalesce merges tiny
    partitions down instead of emitting one file per input partition."""
    import glob

    from wrangler_spark.sources import write_corpus

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    base = str(tmp_path_factory.mktemp("corpus_out"))

    rpf_small = write_corpus(docs.repartition(4), f"{base}/small", target_file_mb=1,
                             compression_ratio=1.0)
    rpf_big = write_corpus(docs.repartition(4), f"{base}/big", target_file_mb=512)
    assert rpf_small < rpf_big
    n_small = len(glob.glob(f"{base}/small/*.parquet"))
    n_big = len(glob.glob(f"{base}/big/*.parquet"))
    assert n_small >= n_big
    # round-trips identically
    back = spark.read.parquet(f"{base}/small")
    assert back.count() == docs.count()
    # coalesce: many tiny partitions collapse to ~ceil(rows/rows_per_file) files
    write_corpus(docs.repartition(32), f"{base}/co", target_file_mb=512, coalesce=True)
    assert len(glob.glob(f"{base}/co/*.parquet")) <= 2
    # partitioned layout with sizing still prunes on read
    write_corpus(docs, f"{base}/bylang", partition_by=["lang"], target_file_mb=512)
    langs = glob.glob(f"{base}/bylang/lang=*")
    assert len(langs) >= 2


def test_bucketed_join_and_agg_skip_shuffle(spark, tmp_path_factory):
    """write_bucketed registers a bucket spec the planner honors: a join
    of two tables bucketed on the same key with the same bucket count and
    an aggregation on the bucket key both plan WITHOUT a shuffle
    Exchange — the co-located-join contract that matters at 100 TB."""
    from wrangler_spark.sources import read_table, write_bucketed

    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    # sf0.01 dims are broadcast-sized, which makes the planner skip the
    # bucketed scan entirely ("Bucketed: false (disabled by query
    # planner)") — disable auto-broadcast so the test exercises the
    # big-join path bucketing exists for
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, "t_orders_b", ["o_custkey"], 8,
                       sort_by=["o_custkey"], path=str(base / "o"))
        write_bucketed(cust, "t_cust_b", ["c_custkey"], 8,
                       sort_by=["c_custkey"], path=str(base / "c"))
        o, c = read_table(spark, "t_orders_b"), read_table(spark, "t_cust_b")

        joined = o.join(c, o["o_custkey"] == c["c_custkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == orders.count()

        agg = o.groupBy("o_custkey").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == orders.select("o_custkey").distinct().count()

        # a non-bucketed probe side shuffles only ITSELF to match the
        # bucket layout: exactly one Exchange, on the plain side
        plain = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
        j2 = o.join(plain, o["o_custkey"] == plain["c_custkey"])
        plan = j2._jdf.queryExecution().executedPlan().toString()
        assert plan.count("+- Exchange") == 1, plan
        assert j2.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_write_bucketed_requires_bucket_columns(spark, tmp_path):
    from wrangler_spark.sources import write_bucketed

    df = spark.range(3)
    import pytest as _pt
    with _pt.raises(ValueError):
        write_bucketed(df, "t_nope", [], 8, path=str(tmp_path / "x"))


def test_write_corpus_sorted_zone_maps(spark, tmp_path):
    """sort_by gives parquet row groups non-overlapping min/max on the
    sort column (the zone-map contract a range-filtering reader prunes
    with); an unsorted write of the same data has overlapping stats."""
    import pyarrow.parquet as pq

    from wrangler_spark.sources import write_corpus

    df = spark.range(300_000).selectExpr(
        "id", "CAST(hash(id) AS BIGINT) AS score"
    ).repartition(2)

    def rg_stats(root):
        out = []
        for f in sorted(root.rglob("*.parquet")):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.names.index("score")
            out.append([
                (md.row_group(i).column(idx).statistics.min,
                 md.row_group(i).column(idx).statistics.max)
                for i in range(md.num_row_groups)
            ])
        return out

    srt = tmp_path / "sorted"
    write_corpus(df, str(srt), sort_by=["score"], mode="overwrite",
                 **{"parquet.block.size": str(1 << 20)})
    uns = tmp_path / "unsorted"
    write_corpus(df, str(uns), mode="overwrite",
                 **{"parquet.block.size": str(1 << 20)})

    sorted_stats = rg_stats(srt)
    assert any(len(groups) > 1 for groups in sorted_stats)  # multi-row-group files
    for groups in sorted_stats:
        for (a_min, a_max), (b_min, b_max) in zip(groups, groups[1:]):
            assert a_max <= b_min  # non-overlapping zone maps within a file
    overlap = any(
        a_max > b_min
        for groups in rg_stats(uns)
        for (a_min, a_max), (b_min, b_max) in zip(groups, groups[1:])
    )
    assert overlap  # hash-ordered data: stats overlap, no pruning possible
    # content identical either way
    assert spark.read.parquet(str(srt)).count() == 300_000


def test_keep_top_frac_grouped(spark):
    from wrangler_spark.datapipe.curation import keep_top_frac

    rows = [(i, "a", float(i)) for i in range(1, 101)]          # a: scores 1..100
    rows += [(1000 + i, "b", float(i) / 10) for i in range(1, 11)]  # b: 0.1..1.0
    rows += [(2000, None, 99.0), (2001, None, 1.0)]             # null group
    df = spark.createDataFrame(rows, ["id", "grp", "score"])
    kept = keep_top_frac(df, "score", 0.1, by=["grp"])
    got = sorted(r["id"] for r in kept.collect())
    # per-group 10%: a keeps 91..100, b keeps its top value, null grp keeps 99.0
    assert got == list(range(91, 101)) + [1010, 2000]
    # a GLOBAL 10% would have dropped everything in group b
    global_ids = {r["id"] for r in keep_top_frac(df, "score", 0.1).collect()}
    assert 1010 not in global_ids


def _files_overlapping_box(path, boxes):
    """Count parquet files whose column min/max stats overlap EVERY
    (col, lo, hi) range in ``boxes`` — exactly the skip decision a
    zone-map reader makes."""
    import glob

    import pyarrow.parquet as pq

    n = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        hit = True
        for col, lo, hi in boxes:
            ci = names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if max(maxs) < lo or min(mins) > hi:
                hit = False
                break
        if hit:
            n += 1
    return n


def test_write_corpus_zorder_prunes_box_queries(spark, tmp_path_factory):
    """cluster_by=[x, y] z-orders the layout: a box query on BOTH
    columns overlaps far fewer files than the unclustered write, and a
    range on EITHER single column still prunes — the multi-column
    zone-map property a leading-column sort cannot give."""
    from wrangler_spark.sources import write_corpus

    base = str(tmp_path_factory.mktemp("zorder"))
    df = spark.range(0, 65536).select(
        (F.col("id") % 256).cast("double").alias("x"),
        F.floor(F.col("id") / 256).cast("double").alias("y"),
        F.col("id").alias("payload"),
    )
    # compression_ratio is the bytes-per-row estimate knob: inflate it to
    # force ~64 small files out of 64k rows
    kw = dict(target_file_mb=1, compression_ratio=30.0, mode="overwrite")
    write_corpus(df.repartition(8), f"{base}/plain", coalesce=True, **kw)
    write_corpus(df, f"{base}/zorder", cluster_by=["x", "y"], **kw)

    box = [("x", 0.0, 31.0), ("y", 0.0, 31.0)]
    plain_total = _files_overlapping_box(f"{base}/plain", [])
    z_total = _files_overlapping_box(f"{base}/zorder", [])
    plain_hit = _files_overlapping_box(f"{base}/plain", box)
    z_hit = _files_overlapping_box(f"{base}/zorder", box)
    assert plain_total >= 16 and z_total >= 16          # the layouts really split
    assert plain_hit == plain_total                     # random layout: no pruning
    assert z_hit * 4 <= z_total                         # z-order: >=75% skipped
    # single-column range prunes too (not just the full box)
    assert _files_overlapping_box(f"{base}/zorder", [("y", 0.0, 15.0)]) * 2 <= z_total
    # and the data round-trips intact
    back = spark.read.parquet(f"{base}/zorder")
    assert back.count() == 65536 and set(back.columns) == {"x", "y", "payload"}
    assert back.agg(F.sum("payload")).collect()[0][0] == 65536 * 65535 // 2


def test_write_corpus_zorder_guards(spark, tmp_path_factory):
    from wrangler_spark.sources import write_corpus
    from wrangler_spark.sources import _zorder_column

    base = str(tmp_path_factory.mktemp("zguard"))
    df = spark.range(10).select(
        F.col("id").cast("double").alias("x"), F.lit("s").alias("name")
    )
    with pytest.raises(ValueError, match="z-order needs a numeric"):
        write_corpus(df, f"{base}/a", cluster_by=["name"])
    with pytest.raises(ValueError, match="not in frame"):
        write_corpus(df, f"{base}/b", cluster_by=["nope"])
    with pytest.raises(ValueError, match="drop sort_by"):
        write_corpus(df, f"{base}/c", cluster_by=["x"], sort_by=["x"])
    with pytest.raises(ValueError, match="cluster_bits"):
        _zorder_column(df, ["x"], bits=0)
    # nulls land in bucket 0 instead of raising
    dfn = spark.createDataFrame([(None,), (1.0,), (2.0,)], "x double")
    zs = _zorder_column(dfn, ["x"], bits=2).select("__z").collect()
    assert len(zs) == 3


def test_manifest_write_verify_and_total_invariance(spark, tmp_path_factory):
    from wrangler_spark.sources import verify_manifest, write_manifest

    base = str(tmp_path_factory.mktemp("manifest"))
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.sha1(F.col("id").cast("string")).alias("s")
    )
    df.repartition(4).write.parquet(f"{base}/a")
    m = write_manifest(spark, f"{base}/a")
    rows = {r["file"]: r for r in m.collect()}
    assert "__TOTAL__" in rows and rows["__TOTAL__"]["n_rows"] == 1000
    assert verify_manifest(spark, f"{base}/a")["ok"]

    # same logical data, different parallelism: files differ, TOTAL matches
    df.repartition(9).write.parquet(f"{base}/b")
    write_manifest(spark, f"{base}/b")
    ta = {r["file"]: r["content_hash"] for r in m.collect()}["__TOTAL__"]
    tb = {r["file"]: r["content_hash"]
          for r in spark.read.json(f"{base}/b/_MANIFEST").collect()}["__TOTAL__"]
    assert ta == tb

    # a foreign file shows up as extra; removing one as missing
    import glob
    import os
    import shutil

    some = sorted(glob.glob(f"{base}/a/part-*.parquet"))
    shutil.copy(some[0], f"{base}/a/part-zzzz-foreign.parquet")
    v = verify_manifest(spark, f"{base}/a")
    assert not v["ok"] and v["extra"] == ["part-zzzz-foreign.parquet"] and not v["total_ok"]
    os.remove(f"{base}/a/part-zzzz-foreign.parquet")
    os.remove(some[1])
    v = verify_manifest(spark, f"{base}/a")
    assert not v["ok"] and os.path.basename(some[1]) in v["missing"]
