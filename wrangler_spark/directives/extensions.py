"""Spark-native extension directives — capabilities the reference engine
simply lacks (SURVEY §2.12: no joins, group-by, sort, limit, distinct or
window functions exist in it). Exposed as extensions, not reference
parity; they make the recipe language a complete analytics surface.

Scale notes: aggregate-by benefits from map-side partial aggregation
automatically; join-with broadcasts when the right side is registered
small (or relies on AQE otherwise); window-rank partitions by the given
keys — skewed partitions are the user's signal to pre-salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wrangler_spark.context import CompileContext
from wrangler_spark.directive import Arg, Directive
from wrangler_spark.errors import DirectiveApplyError
from wrangler_spark.parser.tokens import TokenType
from wrangler_spark.registry import directive


@directive
class SortBy(Directive):
    """sort-by :c1[,:c2...] [asc|desc] — global sort (extension)."""

    name = "sort-by"
    usage = [
        Arg("columns", TokenType.COLUMN_LIST),
        Arg("order", TokenType.IDENTIFIER, optional=True, default="asc"),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        cols = ctx.resolve_all(df, self.args["columns"])
        desc = str(self.args["order"]).lower().startswith("desc")
        return df.orderBy(*[F.col(c).desc() if desc else F.col(c).asc() for c in cols])


@directive
class LimitRows(Directive):
    """limit-rows N — keep the first N rows (extension)."""

    name = "limit-rows"
    usage = [Arg("n", TokenType.NUMERIC)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        return df.limit(int(self.args["n"]))


@directive
class DistinctRows(Directive):
    """distinct-rows [:c1,:c2...] — drop duplicate rows, optionally keyed
    (extension; the scalable exact-dedup primitive)."""

    name = "distinct-rows"
    usage = [Arg("columns", TokenType.COLUMN_LIST, optional=True)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        cols = self.args.value("columns")
        if cols:
            return df.dropDuplicates(ctx.resolve_all(df, cols))
        return df.distinct()


@directive
class AggregateBy(Directive):
    """aggregate-by :k1[,:k2...] prop:{out='agg_sql', ...} — group-by with
    named aggregate expressions (extension), e.g.
    aggregate-by :flag prop:{n='count(*)', total='sum(price)'}."""

    name = "aggregate-by"
    usage = [Arg("keys", TokenType.COLUMN_LIST), Arg("aggs", TokenType.PROPERTIES)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        keys = ctx.resolve_all(df, self.args["keys"])
        aggs = self.args["aggs"]
        if not aggs:
            raise DirectiveApplyError("aggregate-by needs at least one aggregate in prop:{}")
        exprs = [F.expr(str(sql)).alias(name) for name, sql in aggs.items()]
        return df.groupBy(*keys).agg(*exprs)


@directive
class JoinWith(Directive):
    """join-with 'table' :left_key [right_key] [type] — join a registered
    lookup table / catalog view (extension). The registered side is
    broadcast — register only dimension-sized tables."""

    name = "join-with"
    usage = [
        Arg("table", TokenType.TEXT),
        Arg("left_key", TokenType.COLUMN),
        Arg("right_key", TokenType.COLUMN, optional=True),
        Arg("type", TokenType.IDENTIFIER, optional=True, default="left"),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.directives.lookups import _CATALOGS

        tname = self.args["table"]
        table = _CATALOGS.get(tname.lower())
        if table is None:
            try:
                table = df.sparkSession.table(tname)
            except Exception as e:
                raise DirectiveApplyError(f"table '{tname}' not registered or in catalog: {e}")
        lk = ctx.resolve(df, self.args["left_key"])
        rk = self.args.value("right_key") or table.columns[0]
        how = str(self.args["type"]).lower()
        return df.join(F.broadcast(table), F.col(lk) == table[rk], how)


@directive
class WindowRank(Directive):
    """window-rank :partition_col :order_col :dst [desc] — row_number within
    partitions (extension)."""

    name = "window-rank"
    usage = [
        Arg("partition", TokenType.COLUMN),
        Arg("order", TokenType.COLUMN),
        Arg("destination", TokenType.COLUMN),
        Arg("desc", TokenType.BOOL, optional=True, default=False),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        p = ctx.resolve(df, self.args["partition"])
        o = ctx.resolve(df, self.args["order"])
        oc = F.col(o).desc() if self.args["desc"] else F.col(o).asc()
        w = Window.partitionBy(p).orderBy(oc)
        return df.withColumn(self.args["destination"], F.row_number().over(w))


@directive
class UnionWith(Directive):
    """union-with 'table' — append the rows of a registered table with the
    same schema (extension)."""

    name = "union-with"
    usage = [Arg("table", TokenType.TEXT)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.directives.lookups import _CATALOGS

        table = _CATALOGS.get(self.args["table"].lower())
        if table is None:
            raise DirectiveApplyError(f"table '{self.args['table']}' not registered")
        return df.unionByName(table, allowMissingColumns=True)


@directive
class PivotBy(Directive):
    """pivot-by :keys :pivot :value agg ['v1,v2,...'] — wide pivot table
    (extension). Passing the explicit pivot-value list skips the extra
    distinct-values job Spark otherwise runs — always pass it at scale."""

    name = "pivot-by"
    usage = [
        Arg("keys", TokenType.COLUMN_LIST),
        Arg("pivot", TokenType.COLUMN),
        Arg("value", TokenType.COLUMN),
        Arg("agg", TokenType.IDENTIFIER, optional=True, default="sum"),
        Arg("values", TokenType.TEXT, optional=True),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        keys = ctx.resolve_all(df, self.args["keys"])
        pv = ctx.resolve(df, self.args["pivot"])
        val = ctx.resolve(df, self.args["value"])
        agg = str(self.args["agg"]).lower()
        vals = self.args.value("values")
        g = df.groupBy(*keys)
        piv = g.pivot(pv, [v.strip() for v in str(vals).split(",")]) if vals else g.pivot(pv)
        return piv.agg(F.expr(f"{agg}({val})"))


@directive
class Unpivot(Directive):
    """unpivot :id1[,:id2...] :c1,:c2,... :name :value — melt the listed
    measure columns into (name, value) rows (extension). Narrow map-side
    transform, no shuffle."""

    name = "unpivot"
    usage = [
        Arg("ids", TokenType.COLUMN_LIST),
        Arg("measures", TokenType.COLUMN_LIST),
        Arg("name", TokenType.COLUMN),
        Arg("value", TokenType.COLUMN),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        ids = ctx.resolve_all(df, self.args["ids"])
        measures = ctx.resolve_all(df, self.args["measures"])
        return df.unpivot(ids, measures, self.args["name"], self.args["value"])


@directive
class RollupBy(Directive):
    """rollup-by :k1[,:k2...] prop:{out='agg_sql', ...} — group-by with
    subtotal rows per key prefix plus the grand total (extension).
    Null key values mark the subtotal levels, like SQL ROLLUP."""

    name = "rollup-by"
    usage = [Arg("keys", TokenType.COLUMN_LIST), Arg("aggs", TokenType.PROPERTIES)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        keys = ctx.resolve_all(df, self.args["keys"])
        aggs = self.args["aggs"]
        if not aggs:
            raise DirectiveApplyError("rollup-by needs at least one aggregate in prop:{}")
        exprs = [F.expr(str(sql)).alias(name) for name, sql in aggs.items()]
        return df.rollup(*keys).agg(*exprs)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join: each left row picks up the value
    columns of the latest right row with right_ts <= left_ts in its ``on``
    group (nulls when no such row). Equivalent to DuckDB/pandas ASOF JOIN.
    ``tolerance`` (optional) also REQUIRES left_ts - right_ts <= tolerance
    — matches older than the window null out, the pandas merge_asof
    ``tolerance`` / attribution-lookback semantics. Units: seconds when
    the ts column is a timestamp, raw difference when it is numeric.

    Scale shape: the union-and-forward-fill formulation — tag both sides,
    union, one shuffle+sort on (on, ts, tag) and a running ``last(...,
    ignorenulls)`` window — NOT a range join, so there is no candidate-pair
    blowup however dense the right side is; cost is one sort per key
    partition, AQE-skew-splittable. The tolerance path carries ONE extra
    filled column (the matched right ts) — same single window pass."""
    rts = right_ts or left_ts
    val_cols = [c for c in right.columns if c not in (on, rts)]
    clash = set(val_cols) & set(left.columns)
    if clash:
        raise DirectiveApplyError(
            f"asof-join: right value columns collide with left columns: {sorted(clash)}; "
            "rename the right side first"
        )
    if not val_cols:
        raise DirectiveApplyError("asof-join: right side has no value columns beyond key/ts")
    lt = left.withColumn("__tag", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.select(
        F.col(on),
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in val_cols],
    )
    fill_cols = list(val_cols)
    if tolerance is not None:
        # carry the matched right ts through the same forward fill so the
        # window bound can be checked per left row
        rt = rt.withColumn("__rts", F.col("__ts"))
        fill_cols.append("__rts")
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    for c in fill_cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
    u = lt.select(*left.columns, "__ts", "__tag", *fill_cols).unionByName(
        rt.select(*left.columns, "__ts", "__tag", *fill_cols)
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *[F.col(c) for c in left.columns],
        F.col("__ts"),
        F.col("__tag"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
    )
    out = filled.filter(F.col("__tag") == 1)
    if tolerance is not None:
        from pyspark.sql.types import TimestampType, TimestampNTZType

        is_ts = isinstance(
            left.schema[left_ts].dataType, (TimestampType, TimestampNTZType)
        )
        diff = (
            (F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__rts"))) / 1e6
            if is_ts
            else F.col("__ts") - F.col("__rts")
        )
        ok = F.col("__rts").isNotNull() & (diff <= float(tolerance))
        out = out.select(
            *[F.col(c) for c in left.columns],
            F.col("__tag"),
            *[F.when(ok, F.col(c)).alias(c) for c in val_cols],
        )
    return out.drop("__tag", "__ts", "__rts") if tolerance is not None \
        else out.drop("__tag").drop("__ts")


@directive
class AsofJoin(Directive):
    """asof-join 'table' :on :ts [right_ts] — backward-inclusive as-of
    join against a registered table (extension): latest right row at or
    before each left row's timestamp per key."""

    name = "asof-join"
    usage = [
        Arg("table", TokenType.TEXT),
        Arg("on", TokenType.COLUMN),
        Arg("ts", TokenType.COLUMN),
        Arg("right_ts", TokenType.COLUMN, optional=True),
        Arg("tolerance", TokenType.NUMERIC, optional=True),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.directives.lookups import _CATALOGS

        table = _CATALOGS.get(self.args["table"].lower())
        if table is None:
            raise DirectiveApplyError(f"table '{self.args['table']}' not registered")
        on = ctx.resolve(df, self.args["on"])
        ts = ctx.resolve(df, self.args["ts"])
        tol = self.args.value("tolerance")
        return asof_join(
            df, table, on, ts, self.args.value("right_ts"),
            None if tol is None else float(tol),
        )


def range_join(
    left: DataFrame,
    right: DataFrame,
    val_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: pairs each left row with every right row
    whose half-open interval [lo_col, hi_col) contains left's val_col.

    Scale shape: the classic BINNING reduction — left rows key on
    floor(val/w); each right interval explodes into the bins it covers;
    the join is then a plain hash equi-join on the bin plus an exact
    containment filter. No BroadcastNestedLoopJoin / CartesianProduct
    however large both sides are. Pick ``bin_width`` near the median
    interval width: much smaller multiplies right-side rows, much larger
    multiplies false candidates per bin."""
    clash = set(right.columns) & set(left.columns)
    if clash:
        raise DirectiveApplyError(
            f"range-join: overlapping column names: {sorted(clash)}; rename one side first"
        )
    lb = left.withColumn("__lbin", F.floor(F.col(val_col) / bin_width))
    rb = right.withColumn(
        "__rbin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width), F.floor(F.col(hi_col) / bin_width)
            )
        ),
    )
    # containment lives IN the join condition (not a post-filter) so outer
    # joins keep their unmatched left rows; the __lbin = __rbin equi-term
    # is what Spark hash-partitions on
    cond = (
        (F.col("__lbin") == F.col("__rbin"))
        & (F.col(val_col) >= F.col(lo_col))
        & (F.col(val_col) < F.col(hi_col))
    )
    return lb.join(rb, cond, how).drop("__lbin", "__rbin")


@directive
class RangeJoin(Directive):
    """range-join 'table' :val :lo :hi bin_width — interval-containment
    join against a registered table via the binning equi-join reduction
    (extension)."""

    name = "range-join"
    usage = [
        Arg("table", TokenType.TEXT),
        Arg("val", TokenType.COLUMN),
        Arg("lo", TokenType.COLUMN),
        Arg("hi", TokenType.COLUMN),
        Arg("bin", TokenType.NUMERIC),
    ]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        from wrangler_spark.directives.lookups import _CATALOGS

        table = _CATALOGS.get(self.args["table"].lower())
        if table is None:
            raise DirectiveApplyError(f"table '{self.args['table']}' not registered")
        return range_join(
            df,
            table,
            ctx.resolve(df, self.args["val"]),
            self.args["lo"],
            self.args["hi"],
            float(self.args["bin"]),
        )


@directive
class CubeBy(Directive):
    """cube-by :k1[,:k2...] prop:{out='agg_sql', ...} — group-by with
    subtotals for EVERY key combination (SQL CUBE; extension)."""

    name = "cube-by"
    usage = [Arg("keys", TokenType.COLUMN_LIST), Arg("aggs", TokenType.PROPERTIES)]

    def apply(self, ctx: CompileContext, df: DataFrame) -> DataFrame:
        keys = ctx.resolve_all(df, self.args["keys"])
        aggs = self.args["aggs"]
        if not aggs:
            raise DirectiveApplyError("cube-by needs at least one aggregate in prop:{}")
        exprs = [F.expr(str(sql)).alias(name) for name, sql in aggs.items()]
        return df.cube(*keys).agg(*exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
    skewed: str = "left",
) -> DataFrame:
    """Equi-join with the textbook hot-key mitigation: the SKEWED side
    gets a deterministic salt in [0, salt) (xxhash64 of the whole row —
    no rand(), so recomputation under task retry lands the same bucket),
    the other side is replicated ``salt`` times, and the join runs on
    (keys + salt) — a key holding 5% of the table now spreads over
    ``salt`` reducer partitions instead of one straggler. Result rows
    are identical to the plain join (each replica matches exactly its
    salt bucket). Use :func:`~wrangler_spark.datapipe.curation.key_skew`
    to decide whether (and how much) to salt; prefer AQE's skew-join
    split when it triggers — this is for the cases it can't reach
    (e.g. a skewed LEFT OUTER whose hot key exceeds every split
    threshold, or deliberate pre-partitioned layouts).

    ``how`` must keep the REPLICATED side non-null-preserved ("inner",
    or the outer join toward the skewed side) — an outer join toward the
    replicated side would emit its unmatched rows once per replica.
    Replication multiplies the small side ``salt``× — keep salt modest
    (8–64) and the replicated side the genuinely smaller one. Caveat of
    the whole-row hash: byte-identical duplicate rows land in ONE salt
    bucket (they hash alike), so a hot key made of verbatim duplicates
    won't spread — exact-dedup those first (they contribute identical
    join output anyway)."""
    keys = [on] if isinstance(on, str) else list(on)
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")
    if skewed not in ("left", "right"):
        raise ValueError(f"skewed must be 'left' or 'right', got {skewed!r}")
    allowed = {"left": ("inner", "left", "leftouter", "left_outer"),
               "right": ("inner", "right", "rightouter", "right_outer")}[skewed]
    if how not in allowed:
        raise ValueError(
            f"how={how!r} with skewed={skewed!r} would emit the replicated "
            f"side's unmatched rows {salt} times; allowed: {allowed}")
    big, small = (left, right) if skewed == "left" else (right, left)
    clash = "__salt"
    if clash in left.columns or clash in right.columns:
        raise ValueError("a __salt column already exists; rename it first")
    big = big.withColumn(
        clash, F.pmod(F.xxhash64(F.struct(*big.columns)), F.lit(salt)).cast("int")
    )
    small = small.withColumn(
        clash, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    l2, r2 = (big, small) if skewed == "left" else (small, big)
    return l2.join(r2, keys + [clash], how).drop(clash)
