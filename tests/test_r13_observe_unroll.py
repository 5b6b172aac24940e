"""Round-13 optimization internals: observe()-fused checkpoints and the
length-guarded unrolled vector folds.

Both exist purely to change the JOB/EXPRESSION shape, never the values:
`eager_checkpoint_observed` rides driver scalars on the checkpoint's own
materialization job, and `_dot_n`/`_l2_n`/`_sumsq_n` unroll the per-row
fold into a codegen-able chain ONLY when the caller-declared dimension
matches the row (and is at most `_UNROLL_MAX_DIM`). These tests pin the
value contracts the optimizations rely on.
"""

import math

from pyspark.sql import functions as F

from wrangler_spark.datapipe import persistent_rdd_ids, release
from wrangler_spark.datapipe._checkpoint import (
    eager_checkpoint_count,
    eager_checkpoint_observed,
)
from wrangler_spark.datapipe.similarity import (
    _UNROLL_MAX_DIM,
    _cosine,
    _dot_n,
    _l2_n,
    _sumsq_n,
)


def test_observed_checkpoint_metrics_and_blocks(spark):
    base = persistent_rdd_ids(spark)
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    cdf, got = eager_checkpoint_observed(
        df, F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    # metrics computed on the checkpoint's own job, values match the data
    assert got["n"] == 10
    assert got["s"] == sum(2 * i for i in range(10))
    # it IS an eager checkpoint: one pinned block, released like any other
    assert len(persistent_rdd_ids(spark) - base) == 1
    assert cdf.count() == 10
    assert release(cdf) is True
    assert persistent_rdd_ids(spark) - base == set()


def test_observed_checkpoint_empty_frame(spark):
    cdf, got = eager_checkpoint_observed(
        spark.range(5).filter(F.col("id") < 0),
        F.count(F.lit(1)).alias("n"),
        F.min("id").alias("m"),
    )
    # observe over an empty frame: count 0, aggregates None (callers coalesce)
    assert got["n"] == 0 and got["m"] is None
    assert cdf.count() == 0
    release(cdf)


def test_checkpoint_count_fused(spark):
    cdf, n = eager_checkpoint_count(spark.range(37))
    assert n == 37 == cdf.count()
    release(cdf)


def _fold_vs_unrolled(spark, rows, n):
    """Evaluate each helper with n=None (pure fold) and n=n (guarded
    unroll) over the same rows; both must be bit-identical per row."""
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    out = df.select(
        _dot_n(F.col("a"), F.col("b")).alias("dot_f"),
        _dot_n(F.col("a"), F.col("b"), n).alias("dot_u"),
        _l2_n(F.col("a"), F.col("b")).alias("l2_f"),
        _l2_n(F.col("a"), F.col("b"), n).alias("l2_u"),
        _sumsq_n(F.col("a")).alias("sq_f"),
        _sumsq_n(F.col("a"), n).alias("sq_u"),
        _cosine(F.col("a"), F.col("b")).alias("cos_f"),
        _cosine(F.col("a"), F.col("b"), n).alias("cos_u"),
    ).collect()
    for r in out:
        for f, u in (("dot_f", "dot_u"), ("l2_f", "l2_u"),
                     ("sq_f", "sq_u"), ("cos_f", "cos_u")):
            fv, uv = r[f], r[u]
            if fv is None or (isinstance(fv, float) and math.isnan(fv)):
                assert uv is None or math.isnan(uv), (f, fv, uv)
            else:
                # bit-identical, not approx: same IEEE additions in order
                assert fv == uv, (f, fv, uv)


def test_unrolled_folds_bit_identical(spark):
    n = 8  # the PQ subvector dimension actually unrolled in production
    rows = [
        # ordinary vectors (non-associative-friendly magnitudes mixed in)
        # NOTE: no all-zero row — _cosine's 0/0 raises under ANSI on the
        # fold path and the unrolled path alike (pre-existing contract)
        ([1.0, -2.5, 3e10, 4.25, -5.0, 1e-7, 7.5, 0.125],
         [2.0, 0.5, -1e10, 3.0, 0.0, 2e-7, -7.5, 8.0]),
        # WRONG length on one side: guard must fall back to the fold
        ([1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        ([1.0] * 8, [1.0] * 3),
        # null arrays: size(NULL)=NULL -> guard false -> fold's NULL
        (None, [1.0] * 8),
        ([1.0] * 8, None),
    ]
    _fold_vs_unrolled(spark, rows, n)


def test_unroll_cap_keeps_fold_expression(spark):
    import re

    def norm(c):
        # lambda variable ids are session counters; strip them
        return re.sub(r"(x|y|s)_\d+", r"\1", str(c))

    # above the cap the helper must return the UNTOUCHED fold expression
    # (the dim=64 unroll measured 1.3-6.6x slower: codegen falls over)
    a, b = F.col("a"), F.col("b")
    n_over = _UNROLL_MAX_DIM + 1
    assert norm(_dot_n(a, b, n_over)) == norm(_dot_n(a, b))
    assert norm(_l2_n(a, b, n_over)) == norm(_l2_n(a, b))
    assert norm(_sumsq_n(a, n_over)) == norm(_sumsq_n(a))
    # and within the cap it must NOT be the bare fold (the guard exists)
    assert norm(_dot_n(a, b, 8)) != norm(_dot_n(a, b))
