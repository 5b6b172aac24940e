"""Column statistics — parity with the service's summary endpoint
(``wrangler-core/.../statistics/BasicStatistics.java:40-83``): per-column
null/empty/non-null fractions plus regex-typed fractions, computed as ONE
aggregation job over the frame (map-side partial agg; no per-column scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "||"

# type-detection regexes, mirroring the reference's ColumnTypeDetector set
_TYPE_RES = {
    "integer": r"^[+-]?\d+$",
    "number": r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$",
    "boolean": r"^(?i)(true|false|yes|no|t|f)$",
    "date": r"^\d{4}-\d{2}-\d{2}([ T].*)?$",
    "time": r"^\d{1,2}:\d{2}(:\d{2})?$",
    "email": r"^[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}$",
    "ip": r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$",
    "url": r"^(https?|ftp)://[^\s/$.?#].[^\s]*$",
}


def basic_statistics(df: DataFrame) -> dict[str, dict[str, float]]:
    """{column: {'general.null': f, 'general.empty': f, 'general.non-null': f,
    'types.<t>': f, ...}} — fractions in [0,1] like the reference's
    summary() response."""
    aggs = []
    for c in df.columns:
        sc = F.col(c).cast("string")
        aggs.append(F.avg(F.col(c).isNull().cast("double")).alias(f"{c}{_SEP}null"))
        aggs.append(
            F.avg((F.col(c).isNotNull() & (F.trim(sc) == "")).cast("double")).alias(
                f"{c}{_SEP}empty"
            )
        )
        for tname, pat in _TYPE_RES.items():
            aggs.append(
                F.avg(F.coalesce(sc.rlike(pat), F.lit(False)).cast("double")).alias(
                    f"{c}{_SEP}t_{tname}"
                )
            )
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict[str, dict[str, float]] = {}
    for key, val in row.items():
        col, stat = key.split(_SEP, 1)
        d = out.setdefault(col, {})
        if stat == "null":
            d["general.null"] = val or 0.0
        elif stat == "empty":
            d["general.empty"] = val or 0.0
        elif val and val > 0:
            d[f"types.{stat[2:]}"] = val
    for d in out.values():
        d["general.non-null"] = 1.0 - d.get("general.null", 0.0)
    return out
