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
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# datasets that get a semantics-preserving ROW merge during compaction,
# not just a file rewrite: the Bloom sparse bitmap OR-merges duplicate
# word rows, the vocabulary state sum-merges word counts — in both
# cases the read path's own load-time merge, precomputed
_BLOOM_WORDS_COLS = {"__w", "__bits"}
_VOCAB_STATE_COLS = {"word", "count", "batch_id"}


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
    """Compact every dataset under a persisted index/state ``path`` to
    O(partitions) files; ``meta`` is preserved byte-untouched. Returns
    ``{dataset: {files_before, files_after, rows}}``.

    Probe contract: results are IDENTICAL before/after — the rewrite
    changes file layout only. The Bloom ``words`` dataset additionally
    bit_or-merges duplicate word rows (exact for a Bloom filter: the
    probe's own load-time merge, precomputed), so a thousand-batch log
    collapses back to ≤ bits/64 rows.

    Safety: each dataset is fully rewritten into a hidden temp dir
    (``.compact_tmp_<name>``, invisible to parquet reads) BEFORE the
    original is swapped out, so a failure mid-compaction leaves either
    the old dataset or the new one, never a partial mix. The swap
    itself (delete + rename) is not atomic across both steps — don't
    run a probe concurrently with a compaction of the same index."""
    fs, root, jvm = _hadoop(spark, path)
    stats: dict[str, dict[str, int]] = {}
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if name == "meta" or name.startswith(("_", ".")):
            continue
        dpath = st.getPath()
        dstr = dpath.toString()
        before = _count_files(fs, dpath)
        parts = _partition_cols(fs, dpath)
        df = spark.read.parquet(dstr)
        if set(df.columns) == _BLOOM_WORDS_COLS:
            df = df.groupBy("__w").agg(F.expr("bit_or(__bits)").alias("__bits"))
        elif set(df.columns) == _VOCAB_STATE_COLS:
            df = df.groupBy("word").agg(
                F.sum("count").cast("long").alias("count"),
                F.lit("compacted").alias("batch_id"),
            )
        tmp = jvm.org.apache.hadoop.fs.Path(root, f".compact_tmp_{name}")
        fs.delete(tmp, True)
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
        ).write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(tmp.toString())
        # verification count of the rewrite before the swap; count(*)
        # over parquet projects zero columns, so this is footer-bounded
        # work, not a second data pass
        rows = spark.read.parquet(tmp.toString()).count()
        fs.delete(dpath, True)
        if not fs.rename(tmp, dpath):
            raise IOError(f"compact_index: rename {tmp} -> {dpath} failed")
        stats[name] = {
            "files_before": before,
            "files_after": _count_files(fs, dpath),
            "rows": rows,
        }
    return stats
