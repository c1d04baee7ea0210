"""Skew- and locality-management primitives for the 100 TB posture:
salted two-phase aggregation (hot keys) and bucketed-table helpers
(co-located joins without a per-query exchange).

These are the techniques SCALE.md references for the pathological
shapes AQE alone can't fix:

  salted_agg      a single groupBy over a zipfian key (one source
                  drowning a throttle window, one boilerplate shingle)
                  sends the whole hot key to ONE reducer.  Salting
                  splits every key into ``buckets`` sub-keys for the
                  partial aggregate, then merges partials in a second,
                  tiny aggregation keyed by the original key — the hot
                  key's rows fan out across ``buckets`` reducers and
                  the second shuffle only moves one partial row per
                  (key, salt).  Works for any decomposable aggregate.

  write_bucketed  a join repeated every pipeline run (events x user
                  dim, docs x dedup-survivor list) pays its shuffle
                  every time.  Writing both sides bucketed+sorted by
                  the join key pins partitioning into the table layout:
                  Spark's scan reports the bucketing and the join plans
                  with NO Exchange (asserted in tests/test_scale_ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate -> (partial over (key, salt), merge of partials by key).
# count merges by summing partial counts; the others are idempotent.
_DECOMPOSABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation: ``aggs`` maps output column ->
    (input column, fn) with fn in count/sum/min/max.

    ``buckets`` bounds how far a hot key fans out; the salt is derived
    from a uniform hash of the whole row's partition randomness —
    ``spark_partition_id`` composed with a per-row monotonic id — so no
    data column is needed and the fan-out is deterministic within a
    task but balanced across the cluster.
    """
    if not aggs:
        raise ValueError("salted_agg: aggs must not be empty")
    for out, (_, fn) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(
                f"salted_agg: {out}: {fn!r} is not decomposable "
                f"(supported: {sorted(_DECOMPOSABLE)})"
            )
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(buckets),
    )
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*keys, "__salt__")
        .agg(
            *[
                _DECOMPOSABLE[fn][0](F.col(col)).alias(f"__p_{out}__")
                for out, (col, fn) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](F.col(f"__p_{out}__")).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` so
    subsequent equi-joins/aggregations on ``key`` between same-bucketed
    tables plan without an Exchange (asserted by
    tests/test_scale_ops.py::test_bucketed_join_no_exchange).
    Bucket counts must match across
    join sides; pick a power of two sized so one bucket of the LARGER
    table fits an executor core's working set."""
    spark = df.sparkSession
    if "." in table:
        # the orphan-cleanup heuristic below maps <warehouse>/<table>,
        # which only holds for unqualified names in the default
        # database — a db.tbl name would compute a WRONG path (and
        # recursively delete it).  Refuse rather than guess.
        raise ValueError(
            f"write_bucketed: qualified table name {table!r} not "
            "supported; use an unqualified name in the default database"
        )
    # Resolve the real location when the catalog knows the table (the
    # normal overwrite case), then drop it.
    location = None
    try:
        if spark.catalog.tableExists(table):
            detail = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            for row in detail:
                if row.col_name == "Location":
                    location = row.data_type
                    break
    except Exception:  # pragma: no cover - metastore quirks
        pass
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A previous SESSION's leftover table directory is invisible to
    # this session's catalog (fresh in-memory/derby metastore), and
    # saveAsTable refuses to claim an existing location — remove the
    # orphan through the Hadoop FS API so any scheme (local, HDFS, s3a)
    # works, not just the local filesystem.  The warehouse-dir
    # heuristic is the fallback for exactly that orphan case, where
    # the catalog has nothing to resolve.
    jvm = spark._jvm
    if location is None:
        wh = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(wh, table.lower())
    else:
        path = jvm.org.apache.hadoop.fs.Path(location)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(path, True)
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_table(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """``write_bucketed`` + read-back, with a LOUD degradation path:
    if the environment can't host managed tables (read-only warehouse,
    no metastore), fall back to an in-session repartition on the key —
    query RESULTS are identical, only the pinned-layout plan shape is
    lost.  The plan-quality tests exercise the real path, so a broken
    bucketing path still fails CI; the fallback only keeps correctness
    harnesses running in exotic sandboxes."""
    spark = df.sparkSession
    try:
        write_bucketed(df, table, key, buckets=buckets)
        return spark.table(table)
    except Exception as e:  # pragma: no cover - environment-dependent
        import warnings

        warnings.warn(
            f"bucketed_table: managed table {table!r} unavailable "
            f"({type(e).__name__}: {e}); falling back to repartition — "
            "results identical, bucketed layout NOT exercised"
        )
        return df.repartition(buckets, F.col(key))
