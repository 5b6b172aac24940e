"""Workspace sampling operators (SURVEY §2.11).

Parity: the service's samplers (``wrangler-core/.../sampling/Bernoulli.java``,
``Poisson.java``, ``Reservoir.java``; request defaults seed=1 limit=100 in
``wrangler-proto/.../Sampling.java:26-40``) re-expressed on DataFrames.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_n(df: DataFrame, n: int = 100) -> DataFrame:
    """Cursor/head sampling — the default workspace sample."""
    return df.limit(n)


def bernoulli(df: DataFrame, fraction: float, seed: int = 1) -> DataFrame:
    """Independent per-row coin flip (sample without replacement)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def poisson(df: DataFrame, mean_fraction: float, seed: int = 1) -> DataFrame:
    """Expected-count sampling with replacement (Poisson process over rows)."""
    return df.sample(withReplacement=True, fraction=mean_fraction, seed=seed)


def reservoir(df: DataFrame, n: int = 100, seed: int = 1) -> DataFrame:
    """Uniform fixed-size sample. Distributed implementation: assign each
    row a seeded random key and keep the global n smallest — equivalent to
    reservoir sampling, but expressed as a top-k (no driver-side state).
    At 100 TB this is one pass + a tiny shuffle of n rows per partition."""
    keyed = df.withColumn("__r", F.rand(seed))
    out = keyed.orderBy("__r").limit(n).drop("__r")
    return out


def stratified(df: DataFrame, col: str, fractions: dict, seed: int = 1) -> DataFrame:
    """Per-stratum Bernoulli sampling (sampleBy)."""
    return df.sampleBy(col, fractions, seed)


def estimate_fraction(df: DataFrame, target_rows: int) -> float:
    """Helper: fraction that yields ≈target_rows (clamped to [0, 1])."""
    total = df.count()
    if total == 0:
        return 1.0
    return min(1.0, max(1e-9, target_rows / total * 1.1))


def split(df: DataFrame, weights: list[float], seed: int = 1) -> list[DataFrame]:
    """Random disjoint splits (train/validation/test)."""
    s = sum(weights)
    return df.randomSplit([w / s for w in weights], seed=seed)


def sample_histogram(df: DataFrame, col: str, bins: int = 10) -> DataFrame:
    """Equi-width histogram of a numeric column — one aggregation job."""
    stats = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None or hi is None or math.isclose(float(lo), float(hi)):
        return df.groupBy(F.lit(0).alias("bin")).count()
    width = (float(hi) - float(lo)) / bins
    b = F.least(((F.col(col) - lo) / width).cast("int"), F.lit(bins - 1)).alias("bin")
    return df.select(b).groupBy("bin").count().orderBy("bin")
