"""Per-job wall profile for one query (guide §1: decide where the time
goes before touching anything). Runs the named query once (noop sink),
then prints every Spark job with its duration, description, and stage
task counts — the local-mode substitute for the (disabled) UI.

Usage: python tools/job_profile.py <query> [--count]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--count", action="store_true")
    ap.add_argument("--runs", type=int, default=2,
                    help="run N times, profile the LAST (warm) run")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from wrangler_spark import get_spark
    from wrangler_spark.datapipe import checkpoint_scope

    spark = get_spark("job_profile")
    qs = entry_mod.queries()
    spark.range(1).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    first_job = None
    for i in range(args.runs):
        ids_before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        with checkpoint_scope():
            d = qs[args.name](spark, SF_DIR)
            if args.count:
                d.count()
            else:
                d.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        ids_after = set(tracker.getJobIdsForGroup(None) or [])
        new_ids = sorted(ids_after - ids_before)
        if i < args.runs - 1:
            print(f"run {i}: wall={wall:.3f}s jobs={len(new_ids)}")
            continue
        print(f"run {i} (profiled): wall={wall:.3f}s jobs={len(new_ids)}")
        # JVM AppStatusStore has per-job submission/completion times
        store = spark._jsparkSession.sparkContext().statusStore()
        total = 0.0
        for jid in new_ids:
            j = store.job(jid)
            sub = j.submissionTime()
            comp = j.completionTime()
            dur = None
            if sub.isDefined() and comp.isDefined():
                dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
                total += dur
            desc = (j.description().isDefined()
                    and j.description().get() or j.name())[:90]
            print(f"  job {jid:4d} {dur if dur is not None else -1:7.3f}s "
                  f"stages={j.stageIds().size():2d} tasks={j.numTasks():4d}  {desc}")
        print(f"sum(job walls)={total:.3f}s vs query wall={wall:.3f}s "
              f"(gap = driver/planning/broadcast-build time)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
