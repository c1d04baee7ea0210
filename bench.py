"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes to completion via a noop write (full plan runs,
nothing collected to the driver beyond metrics).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # file.d operator path
    "filter_doif",
    "modify_template",
    "mask_digits",
    "hash_normalize",
    "json_extract_props",
    "decoder_cri",
    "throttle_batch",
    "cardinality_limit",
    "antispam_ban",
    "split_explode",
    # relational
    "tpch_q1",
    "tpch_q3",
    "join_enrich_broadcast",
    "sessionize",
    "topk_per_group",
    # training-data ops
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_fingerprint",
    "ann_brute_force",
    "ann_lsh",
    "multimodal_meta",
]


def run_query(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from file_d_spark.queries import QUERIES
    from file_d_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers with a trivial action
    from file_d_spark.tables import load_table

    load_table(spark, sf_dir, "region").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        run_query(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
        # queries are independent; drop their cached relations so one
        # query's cache doesn't pressure the next one's memory
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "total_query_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
