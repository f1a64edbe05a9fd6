"""Per-query bench profiler (optimization round tooling).

For each named query: run it through the same noop-sink methodology as
bench.py, capture wall seconds per run, the Spark job count the run
issued (from the status tracker), and the formatted physical plan.

Usage:
    python tools/profile_query.py [--sf SF_DIR] [--runs N] \
        [--plans-dir DIR] query [query ...]

Plans go to <plans-dir>/<query>.txt when --plans-dir is given;
timings print as one JSON line per query on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="",
                    help="appended to the plan file stem, e.g. _before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from minerva_etl_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="minerva_profile")
    sc = spark.sparkContext
    qs = entry_mod.queries()
    spark.read.parquet(f"{args.sf}/region.parquet").count()  # warm

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)

    for name in args.queries:
        fn = qs[name]
        # stage any one-time fixtures outside the clock (bench.py rule)
        fn(spark, args.sf)
        sc.setJobDescription(f"profile:{name}")
        times = []
        jobs0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        job_counts = []
        for _ in range(args.runs):
            before = sc.statusTracker().getJobIdsForGroup(None) or []
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            after = sc.statusTracker().getJobIdsForGroup(None) or []
            job_counts.append(len(after) - len(before))
        sc.setJobDescription(None)
        if args.plans_dir:
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
            n_exchange = plan.count("Exchange")
            n_py = (plan.count("BatchEvalPython")
                    + plan.count("ArrowEvalPython"))
        else:
            n_exchange = n_py = None
        print(json.dumps({
            "query": name,
            "times": times,
            "min": min(times),
            "jobs_per_run": job_counts,
            "exchanges_in_plan": n_exchange,
            "python_eval_nodes": n_py,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
