"""wrangler_spark — a PySpark-native data-prep engine.

A brand-new engine with the query/data-processing capabilities of CDAP
Wrangler (the reference at /root/reference): a user writes a *recipe* — an
ordered list of one-line *directives* — and this package **compiles** it into
a single lazy Spark DataFrame plan (native Column expressions wherever
possible, Arrow-batched pandas UDFs only where semantics require).

Unlike the reference (a row-at-a-time Java interpreter,
``wrangler-core/.../executor/RecipePipelineExecutor.java``), nothing here
loops over rows: every directive contributes a DataFrame transformation, so
Catalyst gets the whole plan — predicate pushdown, column pruning and
whole-stage codegen apply end-to-end, and the same compiled recipe scales
from a sample to a 1000-executor cluster.

Public API::

    from wrangler_spark import Pipeline
    result = Pipeline.compile(recipe_text).transform(df)
    result.df        # clean rows (lazy DataFrame)
    result.errors()  # error-channel rows (lazy DataFrame)
"""

from wrangler_spark.pipeline import Pipeline, PipelineResult
from wrangler_spark.registry import directive, registry
from wrangler_spark.schemas import register_schema
from wrangler_spark.session import get_spark

__all__ = [
    "Pipeline", "PipelineResult", "directive", "registry", "get_spark",
    "register_schema",
]

__version__ = "0.1.0"
