"""Per-job trace for one query: every Spark job launched during plan
build and noop execution, with duration, stage count and task count —
the per-job view behind tools/profile_queries.py's job counts.

Usage: python tools/trace_jobs.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from file_d_spark.queries import QUERIES, release_caches
    from file_d_spark.session import get_spark
    from file_d_spark.tables import load_table

    spark = get_spark("trace_jobs")
    load_table(spark, sf_dir, "region").count()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    fn = QUERIES[name]
    for rep in range(reps):
        for phase in ("build", "exec"):
            g = f"{name}-{phase}-{rep}"
            sc.setJobGroup(g, name)
            t0 = time.time()
            if phase == "build":
                df = fn(spark, sf_dir)
                df.schema
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            ids = sorted(tracker.getJobIdsForGroup(g))
            print(f"== rep{rep} {phase}: {dt:.3f}s, {len(ids)} jobs")
            for jid in ids:
                ji = tracker.getJobInfo(jid)
                stages = ji.stageIds if ji else []
                ntasks = 0
                for sid in stages:
                    si = tracker.getStageInfo(sid)
                    if si:
                        ntasks += si.numTasks
                print(f"   job {jid}: stages={list(stages)} tasks={ntasks}")
        spark.catalog.clearCache()
        release_caches()


if __name__ == "__main__":
    main()
