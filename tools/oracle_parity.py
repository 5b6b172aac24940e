"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its ``oracle_sql()``
in DuckDB, then compares row count, column set, and order-insensitive
values (columns sorted by name, rows sorted, cells canonicalized).

Usage: python tools/oracle_parity.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

# make `import __spark_entry__` work from any cwd (same trick as bench.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_canon_cell(row[c]) for c in cols))
    out.sort()
    return out


def main(names: list[str] | None = None) -> int:
    import __spark_entry__ as entry_mod
    from wrangler_spark import get_spark

    spark = get_spark("oracle_parity", cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        # /root/testdata ships single parquet FILES; Spark-synthesized
        # replicas (testdata_sf1) are DIRECTORIES of part files
        p = f"{SF_DIR}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    selected = names or list(qs)
    failures = []
    from wrangler_spark.datapipe import checkpoint_scope

    for name in selected:
        try:
            # scope per query (bench.py's discipline): ops that checkpoint a
            # shared subtree release their blocks before the next query runs,
            # so a 185-query sweep stays storage-flat
            with checkpoint_scope():
                sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"~ {name}: rows-only (no oracle), {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not problems:
            a, b = canonical(sdf), canonical(odf)
            if a != b:
                diff_i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) if a and b else 0
                problems.append(
                    f"values differ (first at sorted row {diff_i}):\n    spark:  {a[diff_i] if diff_i < len(a) else '∅'}\n    oracle: {b[diff_i] if diff_i < len(b) else '∅'}"
                )
        if problems:
            print(f"✗ {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"✓ {name}: {len(sdf)} rows match")
    print(f"\n{len(selected) - len(failures)}/{len(selected)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
