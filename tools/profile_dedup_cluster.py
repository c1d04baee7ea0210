"""Per-stage attribution of q_dedup_cluster at sf0.1 (VERDICT r5 #2).

Replays the query's internal stages with explicit timers:
  1. shingle+prefix candidate generation (candidates.count in _verify_pairs)
  2. verify joins + dropDuplicates -> pairs frame
  3. connected_components' localCheckpoint(eager) of the pairs frame
  4. pairs count + collect (driver union-find path)
  5. final left join + noop write

Usage: python tools/profile_dedup_cluster.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from file_d_spark.functions import dedup  # noqa: E402
from file_d_spark.session import get_spark  # noqa: E402
from file_d_spark.tables import load_table  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_dedup_cluster")
    load_table(spark, sf_dir, "region").count()  # JVM warm

    for rep in range(2):
        spark.catalog.clearCache()
        t_all = time.time()
        d = load_table(spark, sf_dir, "documents")

        marks = {}

        def mark(name, t0):
            marks[name] = round(time.time() - t0, 3)

        # --- stage 1+2: jaccard_pairs (instrumented inline) ---
        t0 = time.time()
        pairs = dedup.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.7)
        mark("plan_build", t0)

        # --- stage 3: localCheckpoint in connected_components ---
        t0 = time.time()
        pinned = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
        mark("pairs_checkpoint", t0)

        t0 = time.time()
        n = pinned.count()
        mark("pairs_count", t0)

        t0 = time.time()
        rows = pinned.collect()
        mark("pairs_collect", t0)

        # --- driver union-find + final join (as dedup_clusters does) ---
        t0 = time.time()
        cc = dedup.connected_components(pinned)
        mark("cc_total", t0)

        t0 = time.time()
        out = (
            d.select("doc_id")
            .join(cc.withColumnRenamed("id", "doc_id"), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            )
        )
        out.write.format("noop").mode("overwrite").save()
        mark("final_join_write", t0)

        total = round(time.time() - t_all, 3)
        print(f"rep={rep} pairs={n} total={total} stages={marks}", flush=True)

    # also time the two registered queries end-to-end, min-of-2 each
    from file_d_spark.queries import QUERIES, release_caches

    for name in ("dedup_ngram_jaccard", "dedup_cluster"):
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            release_caches()
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name}: min-of-3 {round(best, 3)}s", flush=True)


if __name__ == "__main__":
    main()
