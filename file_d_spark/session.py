"""SparkSession factory tuned for the local[32] test environment.

At cluster scale the same settings apply except master/memory: AQE on
(runtime re-plan, skew-join splitting, partition coalescing), shuffle
partitions sized to cores, Arrow enabled for the few pandas-UDF
operators, UTC session timezone so results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "file_d_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # the console progress bar rewrites lines with \r and has
        # swallowed per-query OK lines in every round's check_oracles
        # sweep (count them, then chase the stragglers); kill it at
        # the source — logs already report stage progress at WARN
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver's testdata parquet stores TIMESTAMP(NANOS) which the
        # vectorized reader rejects; read as long and convert in tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # split files finely enough that a single-file source still
        # feeds all local cores (default 128MB -> 4 tasks for 0.5GB)
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        # bounded-driver-model probes (limit(bound+1).collect(), take,
        # first) use executeTake, which scans 1 partition, then 4, 16,
        # ... (scaleUpFactor) — one JOB per batch.  When the probed
        # frame holds fewer rows than the bound (the normal case) every
        # partition gets scanned anyway, just in 4-5 sequential
        # scheduling waves.  Start the ramp at one full wave of cores
        # so the common case is ONE job; frames with more partitions
        # still ramp (x4 per wave), so a selective take on a huge frame
        # never scans it all.  Scales with the core count, not a
        # local[32] constant.
        .config("spark.sql.limit.initialNumPartitions", str(cpus))
        # AQE coalescing's floor on post-shuffle partition size (r14).
        # The default 1m floor over-coalesces CPU-DENSE, byte-SMALL
        # stages: candidate-pair verification shuffles a few MB of
        # (long, long) pairs whose array_intersect work is seconds of
        # CPU, and the 1m floor packed it onto 1-3 tasks (measured:
        # dedup_ngram_jaccard 4.8 -> 2.3 s, rolling_zscore 0.49 ->
        # 0.25 s, graph_pagerank -32%, 18-row sweep -24%, zero
        # regressions at sf0.1).  16k keeps such stages at full task
        # fan-out.  Scale behavior: the floor binds ONLY when a
        # stage's total bytes < partitions x 1m (i.e. tiny shuffles) —
        # at 100 TB the advisory/parallelism targets dominate and this
        # setting is inert; on clusters where many tiny tasks are
        # genuinely costly, raise SPARK_GRAFT_AQE_MIN_PARTITION back
        # toward 1m (it is the guide's "busy cluster" knob, not a
        # correctness setting — results are partitioning-invariant).
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "16k"),
        )
        # let the planner pick shuffled-hash over sort-merge when its
        # size conditions hold (build side < autoBroadcastJoinThreshold
        # x shuffle partitions AND 3x smaller than the probe side) —
        # drops two full sorts per shuffle join.  The OOM guard is the
        # planner's own size condition, which scales with the broadcast
        # threshold and partition count, not with local[32]; measured
        # on the 7 SMJ-carrying bench rows: 5 faster (dedup_cluster
        # -1.1 s, dedup_incremental_fuzzy -0.8 s), 1 tie, 1 within
        # noise (bucketed_enrich +0.15 s).  AQE skew splitting applies
        # to shuffled-hash joins the same as sort-merge.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
