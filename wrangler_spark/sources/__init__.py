"""Source/sink layer.

The reference's connections (FILE, DATABASE, KAFKA, S3, GCS, ADLS,
BIGQUERY, SPANNER — ``wrangler-proto/.../ConnectionType.java:31-39``) map
onto Spark's own reader/writer framework; these helpers add the
reference's conveniences (format sniffing like ``FileTypeDetector``,
raw-line reading for parser recipes) on top of ``spark.read``.

Cloud object stores (s3a://, gs://, abfss://) and JDBC/Kafka work through
the same calls when the corresponding connector jars/credentials are on
the cluster — path/URL is the only difference, so recipes are portable
across stores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMAT = {
    ".csv": "csv", ".tsv": "csv", ".json": "json", ".jsonl": "json",
    ".parquet": "parquet", ".avro": "avro", ".orc": "orc",
    ".txt": "text", ".log": "text", ".gz": None,
}


def sniff_format(path: str) -> str:
    """File-extension format detection (parity: service/FileTypeDetector)."""
    base = path.rstrip("/")
    if base.endswith(".gz"):
        base = base[:-3]
    ext = os.path.splitext(base)[1].lower()
    fmt = _EXT_FORMAT.get(ext)
    return fmt or "text"


def read(spark: SparkSession, path: str, fmt: str | None = None, **options) -> DataFrame:
    """Read any supported source; format sniffed from the extension when
    not given. TSV gets its tab separator automatically."""
    fmt = fmt or sniff_format(path)
    reader = spark.read
    if fmt == "csv":
        opts = {"header": "true", "inferSchema": "true"}
        if path.rstrip("/").endswith((".tsv", ".tsv.gz")):
            opts["sep"] = "\t"
        opts.update(options)
        return reader.options(**opts).csv(path)
    if fmt == "json":
        return reader.options(**options).json(path)
    if fmt == "parquet":
        return reader.options(**options).parquet(path)
    if fmt == "orc":
        return reader.options(**options).orc(path)
    if fmt == "text":
        # one raw line per row named 'body' — the parser-recipe entry shape
        return reader.options(**options).text(path).withColumnRenamed("value", "body")
    return reader.format(fmt).options(**options).load(path)


def read_raw_lines(spark: SparkSession, path: str, line_sep: str | None = None) -> DataFrame:
    """Raw lines as a `body` string column — feed to parse-as-* directives."""
    reader = spark.read
    if line_sep:
        reader = reader.option("lineSep", line_sep)
    return reader.text(path).withColumnRenamed("value", "body")


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response", "conversion"),
    strip_http_headers: bool = True,
    batch_rows: int = 256,
    streaming: bool = False,
) -> DataFrame:
    """Read WARC / WET archives (the Common Crawl container) into
    (warc_file, warc_type, record_id, target_uri, warc_date,
    content_type, http_status, payload binary).

    Scale shape: the unit of parallelism is the FILE — WARC gzip is
    per-record-member compressed but not block-splittable, and the
    archival convention is ~1 GB files precisely so that file-level
    parallelism is enough (a Common Crawl snapshot is ~90k files; any
    cluster saturates on that). ``binaryFile`` streams one file per
    task; gzip members are decompressed INCREMENTALLY (one
    zlib.decompressobj walk — the decompressed archive, 4-5x the file,
    is never materialized) and the parser yields Arrow batches of
    ``batch_rows`` records, so peak memory per task is one COMPRESSED
    file buffer + one record + one batch, independent of
    records-per-file. ``conversion`` records are WET extracted text;
    ``response`` records get their HTTP envelope stripped (status kept)
    when ``strip_http_headers`` — the payload is then the raw body,
    ready for html-to-text -> langid -> quality -> dedup downstream.

    ``streaming=True`` reads the SAME directory as a Structured
    Streaming file source (binaryFile needs its schema pinned on a
    stream): crawl drops landing in the directory become micro-batches
    through the identical parse path, composing with the stream-safe
    incremental dedups (exact_dedup_against, embedding_pairs_against).
    """
    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField,
        StructType, TimestampType,
    )

    from wrangler_spark.formats import warc as _warc

    schema = StructType(
        [
            StructField("warc_file", StringType()),
            StructField("warc_type", StringType()),
            StructField("record_id", StringType()),
            StructField("target_uri", StringType()),
            StructField("warc_date", StringType()),
            StructField("content_type", StringType()),
            StructField("http_status", IntegerType()),
            StructField("payload", BinaryType()),
        ]
    )
    wanted = {t.lower() for t in record_types}

    def parse(batches):
        import pandas as pd

        cols = [f.name for f in schema.fields]

        def flush(rows):
            return pd.DataFrame(rows, columns=cols)

        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                rows = []
                for headers, block in _warc.iter_records(bytes(content)):
                    wtype = headers.get("warc-type", "")
                    if wanted and wtype.lower() not in wanted:
                        continue
                    status, body = None, block
                    ctype = headers.get("content-type", "")
                    if strip_http_headers and ctype.startswith("application/http"):
                        status, body = _warc.split_http_payload(block)
                    rows.append(
                        (
                            fname,
                            wtype,
                            headers.get("warc-record-id"),
                            headers.get("warc-target-uri"),
                            headers.get("warc-date"),
                            ctype,
                            status,
                            body,
                        )
                    )
                    if len(rows) >= batch_rows:
                        yield flush(rows)
                        rows = []
                if rows:
                    yield flush(rows)

    if streaming:
        src_schema = StructType(
            [
                StructField("path", StringType()),
                StructField("modificationTime", TimestampType()),
                StructField("length", LongType()),
                StructField("content", BinaryType()),
            ]
        )
        files = spark.readStream.format("binaryFile").schema(src_schema).load(path)
    else:
        files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(parse, schema)


def read_jdbc(spark: SparkSession, url: str, table: str, partition_column: str | None = None,
              num_partitions: int = 8, **options) -> DataFrame:
    """JDBC source; pass partition_column for parallel reads (required for
    any table that doesn't fit one executor)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column:
        def _bounds(col_sql: str):
            q = f"SELECT min({col_sql}) lo, max({col_sql}) hi FROM {table}"
            r = spark.read.format("jdbc").option("url", url).option("query", q)
            for k, v in options.items():
                r = r.option(k, v)
            return r.load().collect()[0]

        try:
            bounds = _bounds(partition_column)
        except Exception:
            # case-preserving dialects (Derby/Postgres) fold unquoted
            # identifiers while Spark-written columns keep their case —
            # retry with the column ANSI-quoted (table names are written
            # unquoted, so they fold consistently and need no quoting)
            bounds = _bounds(f'"{partition_column}"')
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_kafka(spark: SparkSession, bootstrap: str, topic: str, streaming: bool = True, **options) -> DataFrame:
    """Kafka source (requires the spark-sql-kafka connector on the cluster);
    value decoded to a `body` string column for parser recipes."""
    from pyspark.sql import functions as F

    reader = (spark.readStream if streaming else spark.read).format("kafka")
    reader = reader.option("kafka.bootstrap.servers", bootstrap).option("subscribe", topic)
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.withColumn("body", F.col("value").cast("string"))


def write(df: DataFrame, path: str, fmt: str | None = None, mode: str = "error",
          partition_by: list[str] | None = None, **options) -> None:
    """Write to any supported sink. At scale prefer parquet + partitionBy
    on the columns you filter by (partition pruning on read)."""
    fmt = fmt or sniff_format(path)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.format(fmt).save(path)


def _zorder_column(df: DataFrame, cols: list[str], bits: int = 8):
    """Bit-interleaved z-value over ``cols`` — the multi-dimensional
    clustering key (Morton order; the technique behind Delta/Iceberg
    OPTIMIZE ZORDER). Built entirely scan-side:

    - each column is rank-bucketed into ``2**bits`` quantile buckets —
      cutpoints come from ONE ``approxQuantile`` pass (bounded driver
      data: cols × 2**bits doubles; rank buckets, not equal-width, so a
      skewed column still spreads across the full bit range);
    - per row, bucket id = a fold over the literal cutpoint array
      (2**bits comparisons per column — whole-stage-codegen arithmetic,
      no UDF, no shuffle);
    - the z-value interleaves the bucket bits (bit i of column j lands
      at position i*k + j), so a RANGE on ANY clustered column maps to
      a bounded set of z-ranges — after a range-partitioned, z-sorted
      write, parquet row-group min/max statistics prune multi-column
      box queries, not just the leading sort column.

    Numeric, date, and timestamp columns only: z-order is a locality
    transform, and hashing strings would destroy the locality that
    makes the zone maps selective (partition_by or bucket strings
    instead). Nulls land in bucket 0 (first files)."""
    from pyspark.sql import functions as F

    if not 1 <= bits <= 12:
        raise ValueError(f"cluster_bits must be in [1, 12], got {bits}")
    casted = {}
    for i, c in enumerate(cols):
        dt = dict(df.dtypes).get(c)
        if dt is None:
            raise ValueError(f"cluster_by column {c!r} not in frame")
        if dt in ("date", "timestamp", "timestamp_ntz"):
            casted[f"__zc{i}"] = F.col(c).cast("timestamp").cast("double")
        elif dt in ("tinyint", "smallint", "int", "bigint", "float", "double") or dt.startswith("decimal"):
            casted[f"__zc{i}"] = F.col(c).cast("double")
        else:
            raise ValueError(
                f"cluster_by column {c!r} has type {dt}: z-order needs a "
                "numeric/date/timestamp column (hashing a string would "
                "destroy the locality zone maps prune on — use "
                "partition_by or write_bucketed for strings)")
    zdf = df.withColumns(casted)
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = zdf.stat.approxQuantile(list(casted), probs, 1.0 / (4 * n_buckets))
    k = len(cols)
    z = F.lit(0).cast("long")
    for j, name in enumerate(casted):
        arr = F.array([F.lit(float(x)) for x in cuts[j]])
        bucket = F.when(F.col(name).isNull(), F.lit(0)).otherwise(
            F.aggregate(
                arr, F.lit(0),
                lambda acc, cut: acc + F.when(F.col(name) >= cut, 1).otherwise(0),
            )
        ).cast("long")
        for bit in range(bits):
            bitval = F.shiftright(bucket, bit).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bitval, bit * k + j))
    return zdf.withColumn("__z", z).drop(*casted)


def write_corpus(
    df: DataFrame, path: str, partition_by: list[str] | None = None,
    target_file_mb: int = 256, mode: str = "error", fmt: str = "parquet",
    compression_ratio: float = 0.3, coalesce: bool = False,
    sort_by: list[str] | None = None, cluster_by: list[str] | None = None,
    cluster_bits: int = 8, **options,
) -> int:
    """Size-targeted corpus writer: aims every output file at
    ``target_file_mb`` on disk — the file-sizing discipline that decides
    whether a 100 TB corpus is 400K healthy 256 MB files or 40M
    scheduler-choking 2 MB ones (and read-side scan parallelism later).

    How: one BOUNDED sample job (1024 rows, the compile-time-sample
    contract) estimates serialized row bytes via to_json length ×
    ``compression_ratio`` (parquet+snappy on text commonly lands at
    0.25–0.4 of JSON size — an ESTIMATE, documented as such; pass your
    measured ratio for your data), then sets ``maxRecordsPerFile`` so a
    task splits its output at the target. maxRecordsPerFile only SPLITS
    oversized task outputs; if the frame arrives in thousands of
    small partitions, pass ``coalesce=True`` to also repartition down to
    ceil(total_rows / rows_per_file) first (costs a count job + shuffle —
    worth it once at the final sink, pointless mid-pipeline).

    ``sort_by`` sorts WITHIN each write task before the file split —
    the zone-map discipline: parquet stores per-row-group min/max
    statistics, and a reader filtering on a sorted column skips whole
    row groups/files without decoding them (free at write time, paid
    back on every later scan; pair with ``partition_by`` for the
    coarse-grained cut and ``sort_by`` for the fine one). Sort keys of
    later range queries (timestamps, quality scores, hosts) belong
    here; it is task-local (sortWithinPartitions — no extra shuffle).

    ``cluster_by`` z-orders the layout across SEVERAL columns (see
    :func:`_zorder_column`): rows are range-partitioned and sorted by
    the interleaved z-value, so box queries filtering on ANY subset of
    the clustered columns prune files/row-groups via parquet min/max
    stats — where ``sort_by`` only prunes on its leading column. Costs
    one approxQuantile pass, one count, and one range shuffle at the
    sink (the write-once/scan-many trade). Mutually exclusive with
    ``sort_by``/``coalesce`` (clustering dictates both the partitioning
    and the order).

    Returns the rows-per-file setting used."""
    from pyspark.sql import functions as F

    sample = df.limit(1024).select(
        F.avg(F.length(F.to_json(F.struct(*df.columns)))).alias("b")
    ).collect()[0]["b"]
    disk_bytes_per_row = max(1.0, float(sample or 1.0) * compression_ratio)
    rows_per_file = max(1, int(target_file_mb * (1 << 20) / disk_bytes_per_row))
    out = df
    if cluster_by:
        if sort_by or coalesce:
            raise ValueError(
                "cluster_by dictates partitioning and order — drop sort_by/coalesce")
        total = df.count()
        n_files = max(1, -(-total // rows_per_file))
        out = (
            _zorder_column(df, cluster_by, cluster_bits)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    if coalesce:
        total = df.count()
        n_files = max(1, -(-total // rows_per_file))
        out = df.repartition(n_files, *[F.col(c) for c in (partition_by or [])]) \
            if partition_by else df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    write(
        out, path, fmt=fmt, mode=mode, partition_by=partition_by,
        maxRecordsPerFile=str(rows_per_file), **options,
    )
    return rows_per_file


def write_bucketed(
    df: DataFrame, table: str, bucket_by: list[str], n_buckets: int,
    sort_by: list[str] | None = None, path: str | None = None,
    mode: str = "error", fmt: str = "parquet", **options,
) -> None:
    """Write a BUCKETED table: rows hash-partitioned into ``n_buckets``
    files per partition by ``bucket_by``, registered in the session
    catalog (``path`` makes it external). The co-located-join discipline:
    every later join or aggregation keyed on the bucket columns reads
    each side pre-partitioned and skips its shuffle entirely — at 100 TB
    that converts the nightly fact-to-fact join from a full network
    re-shuffle into a local zip of matching buckets. ``sort_by`` adds
    within-bucket ordering (merge-join-friendly, better row-group skip).

    Bucketing pays off when the table is written once and joined many
    times; for one-shot joins prefer broadcast (small side) or AQE.
    Choose ``n_buckets`` so one bucket ≈ one healthy task (hundreds of
    MB): e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket — too big; 65536
    buckets ≈ 1.5 GB — right for wide executors. n_buckets is fixed at
    write time; both join sides must use the SAME bucket count (or a
    divisor, with spark.sql.bucketing.coalesceBucketsInJoin.enabled) to
    co-locate."""
    if not bucket_by:
        raise ValueError("write_bucketed needs at least one bucket column")
    writer = df.write.mode(mode).format(fmt).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog-table read — the bucketed counterpart of :func:`read`;
    the scan carries the table's bucket spec, so Catalyst plans
    bucket-key joins/aggs without an Exchange."""
    return spark.table(table)


def write_manifest(spark: SparkSession, path: str, fmt: str = "parquet") -> "DataFrame":
    """Content manifest for a written dataset — the integrity artifact a
    reproducible data release ships next to its files: one row per data
    file with (file, n_rows, content_hash), plus a final TOTAL row
    whose hash is the order-insensitive combination of all rows.
    Written to ``<path>/_MANIFEST`` (underscore-prefixed: Spark and
    parquet readers skip it) and returned.

    content_hash = sum of per-row xxhash64 over every column
    canonicalized to string — order-insensitive by construction, so the
    hash is stable however Spark ordered rows into the file, and two
    writes of the same logical data with different parallelism produce
    the SAME total hash (files differ, totals match — the property a
    release verification wants). One scan, one aggregate keyed by
    input_file_name(): the manifest of a 100 TB corpus costs exactly
    one pass. Verify later with :func:`verify_manifest`."""
    manifest = _manifest_frame(spark, path, fmt)
    manifest.coalesce(1).write.mode("overwrite").json(f"{path}/_MANIFEST")
    return manifest


_MOD64 = "CAST('18446744073709551616' AS DECIMAL(38,0))"  # 2^64


def _manifest_frame(spark: SparkSession, path: str, fmt: str) -> "DataFrame":
    """(file, n_rows, content_hash) per data file + a __TOTAL__ row.
    Hash sums run in DECIMAL(38,0) mod 2^64 — a plain long sum of
    xxhash64 values overflows, which wraps silently in a non-ANSI
    session and RAISES in an ANSI one; the modular decimal is exact,
    engine-mode-independent, and stored as a string (JSON longs cap at
    2^53 in some readers)."""
    from pyspark.sql import functions as F

    df = spark.read.format(fmt).load(path)
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    # xxhash64 is signed; lift into [0, 2^64) before the modular sum
    h = F.pmod(row_hash.cast("decimal(38,0)"), F.expr(_MOD64))
    per_file = (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.pmod(F.sum(h), F.expr(_MOD64)).alias("__h"),
        )
        # store paths relative to the dataset root: a release moves hosts
        .withColumn("file", F.element_at(F.split("file", "/"), -1))
    )
    total = per_file.agg(
        F.lit("__TOTAL__").alias("file"),
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("n_rows"),
        F.pmod(F.coalesce(F.sum("__h"), F.lit(0)), F.expr(_MOD64)).alias("__h"),
    )
    return per_file.unionByName(total).select(
        "file", "n_rows", F.col("__h").cast("decimal(38,0)").cast("string").alias("content_hash")
    )


def verify_manifest(spark: SparkSession, path: str, fmt: str = "parquet") -> dict:
    """Re-scan a dataset and compare against its stored ``_MANIFEST``:
    returns {"ok": bool, "missing": [...], "extra": [...],
    "mismatched": [...], "total_ok": bool}. ``missing`` = files the
    manifest lists that no longer hash the same or are gone; ``extra`` =
    data files on disk the manifest never saw (a torn or foreign write).
    The TOTAL row is compared order-insensitively, so a verify after a
    same-data rewrite with different file splits reports total_ok=True
    with per-file differences — exactly the distinction you want between
    "bytes moved" and "data changed"."""
    stored = {
        r["file"]: (int(r["n_rows"]), int(r["content_hash"]))
        for r in spark.read.json(f"{path}/_MANIFEST").collect()
    }
    stored_total = stored.pop("__TOTAL__", None)
    # recompute WITHOUT rewriting the stored manifest
    current = {
        r["file"]: (int(r["n_rows"]), int(r["content_hash"]))
        for r in _manifest_frame(spark, path, fmt).collect()
        if r["file"] != "__TOTAL__"
    }
    cur_total = (
        sum(v[0] for v in current.values()),
        sum(v[1] for v in current.values()) % (1 << 64),
    )
    missing = sorted(f for f in stored if f not in current)
    extra = sorted(f for f in current if f not in stored)
    mismatched = sorted(
        f for f in stored if f in current and current[f] != stored[f]
    )
    total_ok = stored_total is not None and cur_total == stored_total
    ok = not missing and not extra and not mismatched and total_ok
    return {"ok": ok, "missing": missing, "extra": extra,
            "mismatched": mismatched, "total_ok": total_ok}
