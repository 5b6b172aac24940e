"""Interactive (design-time) layer — parity with the reference's REST
service execute/summary/schema endpoints (``wrangler-service/.../directive/
DirectivesHandler.java:555-595``, ``AbstractDirectiveHandler.java:103-211``)
as plain functions: same compiler, applied to a sample, no HTTP.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame

from wrangler_spark.pipeline import Pipeline
from wrangler_spark.statistics import basic_statistics


@dataclass
class ExecutionResponse:
    """What the service returns per execute(): sample values, per-column
    types, the directives applied — plus errors and summary on demand."""

    values: list[dict[str, Any]]
    types: dict[str, str]
    headers: list[str]
    directives: list[str]
    error_count: int = 0
    summary: dict[str, dict[str, float]] = field(default_factory=dict)


def execute(
    recipe: str | list[str],
    df: DataFrame,
    limit: int = 100,
    with_summary: bool = False,
) -> ExecutionResponse:
    """Run a recipe over a bounded sample and return values + inferred
    schema (the workspace 'execute' round-trip). The sample bound is
    applied BEFORE the recipe, like the service truncating the workspace
    sample to ``sampling.limit``."""
    sample = df.limit(limit)
    pipeline = Pipeline.compile(recipe)
    result = pipeline.transform(sample)
    out = result.df
    rows = [r.asDict(recursive=True) for r in out.collect()]
    types = dict(out.dtypes)
    resp = ExecutionResponse(
        values=rows,
        types=types,
        headers=out.columns,
        directives=[d.name for d in pipeline.directives],
        error_count=result.errors().count() if result.ctx.error_frames else 0,
    )
    if with_summary:
        resp.summary = basic_statistics(out)
    return resp


def schema(recipe: str | list[str], df: DataFrame, limit: int = 100) -> list[tuple[str, str]]:
    """The /schema endpoint: output schema of the recipe on this input."""
    out = Pipeline.compile(recipe).transform(df.limit(limit)).df
    return [(f.name, f.dataType.simpleString()) for f in out.schema.fields]
