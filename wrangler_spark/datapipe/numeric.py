"""Numeric column operators: outlier flagging and feature scaling.

Both follow the broadcast-scalar pattern: ONE aggregate computes the
per-column statistics (mean/stddev or quartiles; percentile-based ops
take ``exact=False`` to switch from exact type-7 percentiles to
approx_percentile's bounded-state t-digest at extreme scale), the
scalars ride a broadcast 1-row cross join, and the flag/scale itself is
a pure scan-side expression — zero corpus shuffle, whole-stage
codegen."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pctl(col: str, p: float, exact: bool, accuracy: int):
    """Exact type-7 percentile (the lp-buckets cross-engine contract)
    or the t-digest approx_percentile. Exact buffers EVERY value of the
    column in one aggregation buffer — fine to ~10^8 rows, a driver OOM
    at 100 TB; ``exact=False`` is the scale path (bounded state, same
    one-aggregate plan shape), at the cost of bit-exact oracle parity."""
    if exact:
        return F.expr(f"percentile({col}, {p})")
    return F.expr(f"approx_percentile({col}, {p}, {int(accuracy)})")


def join_group_stats(df: DataFrame, stats: DataFrame, by: list[str]) -> DataFrame:
    """Null-safe per-group stats join-back — the ONE idiom shared by
    scale_column, flag_outliers and curation.keep_top_frac. The stats
    frame's key columns are renamed before the join because stats always
    derive FROM df here, and once more than one derivation separates
    them, ``df[k].eqNullSafe(stats[k])`` can resolve both sides to the
    SAME attribute (Spark's ambiguous-self-join trap — the grouped-MAD
    path hit it as a trivially-true predicate). eqNullSafe keeps
    null-group rows: they join their own group's stats. Returns df's
    rows + the stats columns."""
    stat_cols = [f.name for f in stats.schema.fields if f.name not in by]
    st = stats.select(*[F.col(k).alias(f"__k_{k}") for k in by], *stat_cols)
    cond = None
    for k in by:
        eq = df[k].eqNullSafe(F.col(f"__k_{k}"))
        cond = eq if cond is None else cond & eq
    return df.join(st, cond).drop(*[f"__k_{k}" for k in by])


def flag_outliers(
    df: DataFrame, col: str, method: str = "zscore", k: float = 3.0,
    out_col: str | None = None, exact: bool = True, accuracy: int = 10000,
    by: list[str] | None = None,
) -> DataFrame:
    """Flag numeric outliers: ``zscore`` marks |x - mean| > k·stddev
    (population stddev, the classic 3-sigma rule), ``iqr`` marks values
    outside [Q1 - k·IQR, Q3 + k·IQR] (Tukey's fences, k=1.5 customary —
    pass it explicitly), ``mad`` marks |x - median| > k·1.4826·MAD
    (median absolute deviation with the normal-consistency constant —
    Iglewicz & Hoaglin's robust rule, k=3.5 customary; unlike zscore,
    a 50% contamination cannot drag the threshold). Adds
    ``<col>_outlier`` boolean; nulls flag false (a missing value is a
    missingness problem, not an outlier).

    Quartiles are exact type-7 percentiles (the lp-buckets contract) so
    the DuckDB oracle reproduces them bit-for-bit; ``exact=False``
    switches to approx_percentile (bounded aggregation state — the
    extreme-scale path, same knob as perplexity_buckets).

    ``by`` computes the fences WITHIN each group (per-source/per-language
    thresholds — a heavy-tailed source must not set every other source's
    fence): stats become a per-group aggregate joined back null-safely,
    the scale_column(by=) shape."""
    out_col = out_col or f"{col}_outlier"
    c = F.col(col).cast("double")

    def _agg(frame, exprs):
        return frame.groupBy(*by).agg(*exprs) if by else frame.agg(*exprs)

    if method == "zscore":
        stats = _agg(df, [
            F.avg(c).alias("__m"), F.coalesce(F.stddev_pop(c), F.lit(0.0)).alias("__s")
        ])
        flag = c.isNotNull() & (F.abs(c - F.col("__m")) > F.lit(float(k)) * F.col("__s")) & (
            F.col("__s") > 0
        )
    elif method == "iqr":
        stats = _agg(df, [
            _pctl(col, 0.25, exact, accuracy).alias("__q1"),
            _pctl(col, 0.75, exact, accuracy).alias("__q3"),
        ])
        iqr = F.col("__q3") - F.col("__q1")
        flag = c.isNotNull() & (
            (c < F.col("__q1") - F.lit(float(k)) * iqr)
            | (c > F.col("__q3") + F.lit(float(k)) * iqr)
        )
    elif method == "mad":
        # two sequential broadcast-scalar aggregates (median, then the
        # median of |x - median|) — two corpus scans, zero corpus
        # shuffle, same shape per pass as the other methods
        med = _agg(df, [_pctl(col, 0.5, exact, accuracy).alias("__med")])
        if by:
            devs = join_group_stats(df, med, by).select(
                *by, F.col("__med"), F.abs(c - F.col("__med")).alias("__dev")
            )
        else:
            devs = df.crossJoin(F.broadcast(med)).select(
                F.col("__med"), F.abs(c - F.col("__med")).alias("__dev")
            )
        stats = _agg(devs, [
            F.min("__med").alias("__med"),
            _pctl("__dev", 0.5, exact, accuracy).alias("__mad"),
        ])
        flag = c.isNotNull() & (F.col("__mad") > 0) & (
            F.abs(c - F.col("__med")) > F.lit(float(k)) * F.lit(1.4826) * F.col("__mad")
        )
    else:
        raise ValueError(f"unknown outlier method: {method!r} (zscore|iqr|mad)")
    if by:
        stat_cols = [f.name for f in stats.schema.fields if f.name.startswith("__")]
        return join_group_stats(df, stats, by).withColumn(out_col, flag).drop(*stat_cols)
    joined = df.crossJoin(F.broadcast(stats))
    return joined.withColumn(out_col, flag).drop(*stats.columns)


def scale_column(
    df: DataFrame, col: str, method: str = "minmax", out_col: str | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Feature scaling: ``minmax`` → (x - min)/(max - min) in [0, 1],
    ``zscore`` → (x - mean)/stddev. Adds ``<col>_scaled`` (6dp — the
    cross-engine contract); constant columns scale to 0.0, nulls stay
    null.

    ``by`` scales WITHIN each group instead of globally — the
    mixed-source normalization (a quality score's range differs per
    source/language; global scaling lets one source's spread swamp
    another's). Stats become a per-group aggregate equi-joined back
    (null-safe on the keys so null-group rows keep their stats; the
    stats frame has one row per group, AQE broadcasts it when small)
    instead of the global broadcast scalar."""
    out_col = out_col or f"{col}_scaled"
    c = F.col(col).cast("double")
    if method == "minmax":
        aggs = [F.min(c).alias("__lo"), F.max(c).alias("__hi")]
        rng = F.col("__hi") - F.col("__lo")
        scaled = F.when(rng > 0, F.round((c - F.col("__lo")) / rng, 6)).otherwise(
            F.when(c.isNotNull(), F.lit(0.0))
        )
    elif method == "zscore":
        aggs = [F.avg(c).alias("__m"), F.coalesce(F.stddev_pop(c), F.lit(0.0)).alias("__s")]
        scaled = F.when(F.col("__s") > 0, F.round((c - F.col("__m")) / F.col("__s"), 6)).otherwise(
            F.when(c.isNotNull(), F.lit(0.0))
        )
    else:
        raise ValueError(f"unknown scaling method: {method!r} (minmax|zscore)")
    if by:
        st = df.groupBy(*by).agg(*aggs)
        stat_cols = [f.name for f in st.schema.fields if f.name.startswith("__")]
        return join_group_stats(df, st, by).withColumn(out_col, scaled).drop(*stat_cols)
    stats = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(stats))
    return joined.withColumn(out_col, scaled).drop(*stats.columns)


def winsorize_column(
    df: DataFrame, col: str, lo: float = 0.01, hi: float = 0.99,
    out_col: str | None = None, exact: bool = True, accuracy: int = 10000,
    by: list[str] | None = None,
) -> DataFrame:
    """Winsorize: clip to the [lo, hi] percentile bounds — the
    robust-statistics companion to flag_outliers for when you want the
    rows KEPT but the tail influence capped (price columns, token
    counts feeding a mean). Adds ``<col>_wins`` (6dp); nulls stay
    null. Same one-aggregate + broadcast-scalar shape; ``exact=False``
    is the bounded-state scale path (approx_percentile). ``by`` clips
    within each group (per-source tails — the scale_column(by=) shape,
    null-safe join-back via join_group_stats)."""
    out_col = out_col or f"{col}_wins"
    c = F.col(col).cast("double")
    aggs = [
        _pctl(col, float(lo), exact, accuracy).alias("__plo"),
        _pctl(col, float(hi), exact, accuracy).alias("__phi"),
    ]
    clipped = F.when(
        c.isNotNull(),
        F.round(F.least(F.greatest(c, F.col("__plo")), F.col("__phi")), 6),
    )
    if by:
        st = df.groupBy(*by).agg(*aggs)
        return join_group_stats(df, st, by).withColumn(out_col, clipped).drop(
            "__plo", "__phi"
        )
    stats = df.agg(*aggs)
    return df.crossJoin(F.broadcast(stats)).withColumn(out_col, clipped).drop(
        "__plo", "__phi"
    )


def quantile_bins(
    df: DataFrame, col: str, n_bins: int = 10, out_col: str | None = None,
    exact: bool = True, accuracy: int = 10000,
    by: list[str] | None = None,
) -> DataFrame:
    """Equi-depth binning: assign each value its quantile bucket 1..n
    (deciles by default) — the distribution-aware companion to the
    reference's fixed-range `quantize` directive (ref: Quantization.java
    takes explicit range:label pairs; here the ranges come from the data).
    The standard move before stratified sampling by popularity, mixture
    weighting by score, or histogram reporting at 100 TB.

    Bin b = 1 + #{boundaries < x} with boundaries at the i/n percentiles
    (i = 1..n-1, type-7 exact by default — the cross-engine contract;
    ``exact=False`` for bounded-state approx_percentile at extreme
    scale). Strictly-less comparison puts a value sitting exactly ON a
    boundary in the LOWER bin; equal boundary values (low-cardinality
    columns) collapse those bins to the lowest index, never dropping a
    row. Nulls stay null. One aggregate for the n-1 boundary scalars
    (broadcast), then a pure scan-side fold — zero corpus shuffle.
    ``by`` bins within each group (per-language quality deciles — a
    high-scoring language must not claim every global top bin); the
    boundary array joins back null-safely per group."""
    n = int(n_bins)
    if n < 2:
        raise ValueError("n_bins must be >= 2")
    out_col = out_col or f"{col}_bin"
    c = F.col(col).cast("double")
    ps = [i / n for i in range(1, n)]
    if exact:
        bounds = F.expr(f"percentile({col}, array({', '.join(str(p) for p in ps)}))")
    else:
        bounds = F.expr(
            f"approx_percentile({col}, array({', '.join(str(p) for p in ps)}), {int(accuracy)})"
        )
    bin_expr = F.when(
        c.isNotNull(),
        (
            F.lit(1)
            + F.aggregate(
                F.col("__bounds"),
                F.lit(0),
                lambda acc, b: acc + F.when(b < c, 1).otherwise(0),
            )
        ).cast("int"),
    )
    if by:
        st = df.groupBy(*by).agg(bounds.alias("__bounds"))
        return join_group_stats(df, st, by).withColumn(out_col, bin_expr).drop("__bounds")
    stats = df.agg(bounds.alias("__bounds"))
    return df.crossJoin(F.broadcast(stats)).withColumn(out_col, bin_expr).drop("__bounds")
