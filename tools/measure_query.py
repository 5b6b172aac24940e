"""Per-query measurement harness for the optimization rounds (guide §1).

For each named query: capture .explain("formatted") to plans/<tag>/<name>_<suffix>.txt,
then time N noop-sink runs (computation only, no sink cost) and print them.

Usage: python tools/measure_query.py [--tag r13] [--suffix before] [--runs 3] name [name ...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--count", action="store_true",
                    help="time .count() (bench methodology) instead of noop sink")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from wrangler_spark import get_spark
    from wrangler_spark.datapipe import checkpoint_scope

    spark = get_spark("measure_query")
    qs = entry_mod.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    # session warmup (same as bench.py)
    spark.range(1).count()
    from pyspark.sql import functions as F
    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(64)
    warm.select(F.from_csv(F.lit("a,1"), "c0 string, c1 int").alias("s"), *warm.columns).count()

    results = {}
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        # plan capture (its own scope so checkpoints don't leak)
        with checkpoint_scope():
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        times = []
        if args.runs == 0:
            print(f"{name}: plan captured", flush=True)
            continue
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.perf_counter()
            with checkpoint_scope():
                d = qs[name](spark, SF_DIR)
                if args.count:
                    d.count()
                else:
                    d.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: {times} median={sorted(times)[len(times)//2]}", flush=True)
    print("JSON:" + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
