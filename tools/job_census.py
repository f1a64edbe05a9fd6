"""Job census for a gate query: run it under a SparkListener that
records every job (id, wall ms, description) so per-row perf work can
see WHERE the time goes — job count vs per-job cost.

Usage: python tools/job_census.py <query> [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry_mod
    from minerva_etl_spark.session import get_spark

    spark = get_spark(app_name="job_census")
    qs = entry_mod.queries()
    sc = spark.sparkContext

    # warm
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    warm_first = time.time() - t0

    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None) or []
    t0 = time.time()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    after = tracker.getJobIdsForGroup(None) or []
    new_jobs = sorted(set(after) - set(before))

    print(f"query={name} warm_wall={wall:.2f}s (first={warm_first:.2f}s) jobs={len(new_jobs)}")
    # Pull durations from the REST-ish status API via the JVM app status store
    store = spark._jsparkSession.sparkContext().statusStore()
    rows = []
    for jid in new_jobs:
        try:
            j = store.job(jid)
            dur = (
                j.completionTime().get().getTime() - j.submissionTime().get().getTime()
            ) / 1000.0
            desc = j.name()
            rows.append((dur, jid, desc))
        except Exception as exc:  # job data evicted
            rows.append((0.0, jid, f"<no data: {exc}>"))
    rows.sort(reverse=True)
    for dur, jid, desc in rows:
        print(f"  {dur:7.3f}s  job {jid:4d}  {desc[:130]}")
    print(f"sum of job durations: {sum(r[0] for r in rows):.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
