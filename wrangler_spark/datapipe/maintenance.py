"""Persisted-index maintenance: compaction for the log-structured
index/state family.

Every materialize-once artifact in the package (bloom_write_index,
minhash_write_index, embedding_write_index, ivf_write_index + appends,
retention_write_state, report_update_state) shares one layout:
``<path>/<dataset dirs>`` of parquet plus an optional 1-row
``<path>/meta`` pinning geometry. Appends are PLAIN parquet appends —
O(batch) work, no read-modify-write — which is the right write path at
100 TB but accumulates one file per ingestion batch forever: after
thousands of batches the small-files problem arrives inside the index
itself (every probe pays per-file open/footer costs; the NameNode/
listing pays per-file metadata).

:func:`compact_index` closes the loop: rewrite each dataset to
O(partitions) files, preserving layout, partitioning, and meta —
probe results are bit-identical before/after (for the Bloom ``words``
dataset the rewrite also bit_or-merges duplicate word rows, which is
exactly the merge the probe performs at load time, so it is a pure
pre-computation). Run it on the same cadence you'd run any compaction —
after N appends, or when file counts degrade probe latency.

Compaction is PROBE-SAFE: it writes a whole new VERSION of the
artifact (``_layout``'s snapshot protocol — all datasets plus a
byte-copied meta under ``<path>/v_NNNNNN``, committed by one atomic
marker create) and never touches the live one. A probe running
concurrently reads whichever version it resolved; a crash at any point
leaves the previous version fully readable. Superseded versions are
reclaimed by :func:`~wrangler_spark.datapipe._layout.vacuum` (default
grace: keep the previous committed version for in-flight probes).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from wrangler_spark.datapipe import _layout
from wrangler_spark.datapipe._layout import vacuum as vacuum_index  # noqa: F401  (public re-export)

# datasets that get a semantics-preserving ROW merge during compaction,
# not just a file rewrite: the Bloom sparse bitmap OR-merges duplicate
# word rows, the vocabulary state sum-merges word counts — in both
# cases the read path's own load-time merge, precomputed
_BLOOM_WORDS_COLS = {"__w", "__bits"}
_VOCAB_STATE_COLS = {"word", "count", "batch_id"}
_FUNNEL_STATE_COLS = {"__u", "__slots", "batch_id"}


def _hadoop(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _count_files(fs, jpath) -> int:
    """Data files under a dataset dir (recursive), ignoring hidden/_ files."""
    n = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            n += 1
    return n


def _partition_cols(fs, jpath) -> list[str]:
    """Hive-style partition column of a dataset dir (``name=value``
    subdirectories), outermost first. The package's layouts nest at most
    one level (centroid_id / __b), but walk down in case."""
    cols: list[str] = []
    cur = jpath
    while True:
        sub = [s.getPath() for s in fs.listStatus(cur)
               if s.isDirectory() and "=" in s.getPath().getName()]
        if not sub:
            return cols
        name = sub[0].getName().split("=", 1)[0]
        if name in cols:
            return cols
        cols.append(name)
        cur = sub[0]


def compact_index(spark: SparkSession, path: str) -> dict[str, dict[str, int]]:
    """Compact every dataset of a persisted index/state ``path`` to
    O(partitions) files; ``meta`` is byte-copied. Returns
    ``{dataset: {files_before, files_after, rows}}``.

    Probe contract: results are IDENTICAL before/after — the rewrite
    changes file layout only. The Bloom ``words`` dataset additionally
    bit_or-merges duplicate word rows (exact for a Bloom filter: the
    probe's own load-time merge, precomputed), so a thousand-batch log
    collapses back to ≤ bits/64 rows; vocabulary state rows sum-merge
    the same way, with every original batch id preserved as a
    zero-count ledger row so the state family's exactly-once replay
    check survives compaction.

    Safety: the compacted artifact is a whole NEW VERSION
    (``<path>/v_NNNNNN``, see ``_layout``) — the live version is never
    modified or deleted, the new one becomes visible only at the single
    atomic ``_COMMITTED`` marker create, probes may run concurrently
    (they keep reading the version they resolved), and a crash at any
    point leaves a readable index at the previous version. Superseded
    versions (and the flat legacy layout, after its first versioned
    compaction) are reclaimed separately by :func:`vacuum_index` —
    run it after the longest probe you'd ever have in flight.
    Single-writer contract is ENFORCED: ``begin_version`` takes the
    artifact's writer lease, so a compaction racing an append or
    rebuild of the same artifact fails loudly with
    ``ConcurrentWriterError`` instead of landing an append invisibly
    in a superseded version."""
    fs, _, jvm = _hadoop(spark, path)
    src_root = _layout.resolve(spark, path)
    _, src, _ = _hadoop(spark, src_root)
    vdir = _layout.begin_version(spark, path)
    stats: dict[str, dict[str, int]] = {}
    for st in fs.listStatus(src):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if name.startswith(("_", ".")) or _layout._VERSION_RE.match(name):
            continue
        dpath = st.getPath()
        if name == "meta":
            # byte-copy: meta pins geometry — never re-encode it
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                fs, dpath, fs, jvm.org.apache.hadoop.fs.Path(f"{vdir}/meta"),
                False, spark._jsc.hadoopConfiguration(),
            )
            continue
        before = _count_files(fs, dpath)
        parts = _partition_cols(fs, dpath)
        df = spark.read.parquet(dpath.toString())
        if set(df.columns) == _BLOOM_WORDS_COLS:
            df = df.groupBy("__w").agg(F.expr("bit_or(__bits)").alias("__bits"))
        elif set(df.columns) == _VOCAB_STATE_COLS:
            # sum-merge word counts (the read path's own merge), but
            # PRESERVE the batch-id dedup ledger: vocab_update_state's
            # exactly-once replay check keys on batch_id, so compaction
            # keeps one zero-count ledger row per original batch id
            # (word NULL — the update path can never produce a null
            # word, and the state readers filter them out). A replayed
            # micro-batch therefore stays a NO-OP even when a compaction
            # ran inside the crash window, before the sink restarted.
            ledger = (
                df.filter(
                    (F.col("batch_id") != "") & (F.col("batch_id") != "compacted")
                )
                .select("batch_id")
                .distinct()
                .select(
                    F.lit(None).cast("string").alias("word"),
                    F.lit(0).cast("long").alias("count"),
                    "batch_id",
                )
            )
            df = (
                df.filter(F.col("word").isNotNull())
                .groupBy("word")
                .agg(
                    F.sum("count").cast("long").alias("count"),
                    F.lit("compacted").alias("batch_id"),
                )
                .unionByName(ledger)
            )
        elif set(df.columns) == _FUNNEL_STATE_COLS:
            # funnel slot chains merge by most-filled-row-wins (fills are
            # monotone — the read path's own max_by, precomputed); batch
            # ids survive as null-user ledger rows, as for vocab state
            ledger = (
                df.filter(
                    (F.col("batch_id") != "") & (F.col("batch_id") != "compacted")
                )
                .select("batch_id")
                .distinct()
                .select(
                    # __u's type follows the caller's user column — null
                    # ledger rows must keep it, not assume string
                    F.lit(None).cast(df.schema["__u"].dataType).alias("__u"),
                    F.lit(None).cast("array<long>").alias("__slots"),
                    "batch_id",
                )
            )
            df = (
                df.filter(F.col("__u").isNotNull())
                .groupBy("__u")
                .agg(
                    F.max_by(
                        "__slots",
                        F.size(F.filter("__slots", lambda x: x.isNotNull())),
                    ).alias("__slots"),
                    F.lit("compacted").alias("batch_id"),
                )
                .unionByName(ledger)
            )
        # size-based file target (~128 MB each): a compaction that
        # coalesced a 100 TB vectors dataset to one file would be its
        # own scale bug. With partition cols, hash-repartitioning ON
        # those cols keeps every partition value in one task, so files
        # per partition value stay at 1 until data volume needs more.
        size = fs.getContentSummary(dpath).getLength()
        tgt = max(1, -(-int(size) // (128 << 20)))
        writer = (
            df.repartition(tgt, *[F.col(c) for c in parts]) if parts
            else df.repartition(tgt)
        ).write
        if parts:
            writer = writer.partitionBy(*parts)
        out = f"{vdir}/{name}"
        writer.parquet(out)
        # verification count of the rewrite before the commit; count(*)
        # over parquet projects zero columns, so this is footer-bounded
        # work, not a second data pass
        rows = spark.read.parquet(out).count()
        _, opath, _ = _hadoop(spark, out)
        stats[name] = {
            "files_before": before,
            "files_after": _count_files(fs, opath),
            "rows": rows,
        }
    _layout.commit_version(spark, vdir)
    return stats
