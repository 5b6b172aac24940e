"""SparkSession factory tuned for this engine.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions sized to cores (not the 200 default), AQE on for runtime
re-planning/skew handling, Arrow on so any pandas-UDF fallback is batched.
On a real cluster the same builder works — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "wrangler_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r13 note (measured, NOT adopted): coalescing strictly to the
        # advisory byte size (`coalescePartitions.parallelismFirst=false`
        # + advisory 16m) was interleaved-A/B'd after a job profile
        # showed 32-task reduce stages over KB-sized shuffles. It read
        # ~25% WORSE on the aggregation-heavy paths (dedup_ngram_word
        # 3.17/3.23 s → 3.99/4.17 s; text_clf_score 3.8 → 4.0-4.5 s)
        # and flat-to-±5% elsewhere: the gram/feature streams compress
        # to a few MB but carry heavy per-row aggregation work, exactly
        # the compute-dense case bytes-based coalescing under-
        # parallelizes — which is why parallelismFirst=true is Spark's
        # default. Kept the default; on a production cluster the same
        # knob is a spark-submit conf, no code change needed.
        # split small files down to 256 KiB so low-SF test data still uses
        # every core; with production-sized files (≥128 MiB parquet) the
        # maxPartitionBytes default dominates and this setting is inert
        .config("spark.sql.files.openCostInBytes", str(256 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI stays ON (the Spark 4 default, and what any external session
        # will use): the engine must be ANSI-safe on its own — lenient
        # reference semantics (bad cast → null) are expressed with try_*
        # per-expression, never by assuming a lenient session config.
        .config("spark.sql.ansi.enabled", os.environ.get("SPARK_GRAFT_ANSI", "true"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
