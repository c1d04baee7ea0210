"""Per-query cost split: DataFrame construction (Python + py4j +
analysis — driver-side, single-threaded) vs execution (noop sink),
plus the number of Spark JOBS each phase launches.  The bench times
both together; optimizing needs to know which side a second lives on —
and on hosts where a single job carries 0.2-0.4 s of fixed scheduling
overhead (measured in r13: 32 trivial tasks = 238-475 ms/job), job
count IS the cost model for model-building queries.  min-of-N per
phase, fresh DataFrame per run, caches released between queries (same
protocol as bench.py).

Usage: python tools/profile_queries.py [sf_dir] [reps] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = sys.argv[3:]

    import bench
    from file_d_spark.queries import QUERIES, release_caches
    from file_d_spark.session import get_spark
    from file_d_spark.tables import load_table

    spark = get_spark("profile_queries")
    load_table(spark, sf_dir, "region").count()  # warm footers

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = only if only else list(bench.BENCH_QUERIES)
    rows = {}
    for name in names:
        fn = QUERIES[name]
        build_best = exec_best = None
        build_jobs = exec_jobs = 0
        for rep in range(reps):
            g1 = f"{name}-build-{rep}"
            sc.setJobGroup(g1, name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.schema  # force analysis
            t1 = time.time()
            g2 = f"{name}-exec-{rep}"
            sc.setJobGroup(g2, name)
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            sc.setJobGroup(None, None)
            b, e = t1 - t0, t2 - t1
            build_best = b if build_best is None else min(build_best, b)
            exec_best = e if exec_best is None else min(exec_best, e)
            build_jobs = len(tracker.getJobIdsForGroup(g1))
            exec_jobs = len(tracker.getJobIdsForGroup(g2))
            spark.catalog.clearCache()
            release_caches()
        rows[name] = {
            "build_s": round(build_best, 3),
            "exec_s": round(exec_best, 3),
            "total_s": round(build_best + exec_best, 3),
            "build_jobs": build_jobs,
            "exec_jobs": exec_jobs,
        }
        print(
            f"# {name}: build {rows[name]['build_s']}s"
            f" ({build_jobs} jobs) + exec {rows[name]['exec_s']}s"
            f" ({exec_jobs} jobs) = {rows[name]['total_s']}s",
            file=sys.stderr,
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
