"""As-of join semantics (backward/forward/tolerance/key isolation) and
Bloom incremental-dedup guarantees vs the exact anti-join."""

import datetime as dt

from pyspark.sql import functions as F

from file_d_spark.functions.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01T10:00:00")),
            (2, 100, _ts("2024-01-01T12:00:00")),
            (3, 100, _ts("2024-01-01T09:00:00")),  # before any right row
            (4, 200, _ts("2024-01-01T11:00:00")),  # other key
            (5, 300, _ts("2024-01-01T11:00:00")),  # key with no right rows
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts("2024-01-01T10:00:00"), 1.0),  # ties left id=1 exactly
            (100, _ts("2024-01-01T11:30:00"), 2.0),
            (200, _ts("2024-01-01T11:00:00"), 9.0),
        ],
        "k long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward(spark):
    left, right = _frames(spark)
    got = {
        r.id: (r.v, r.ts_right)
        for r in asof_join(left, right, on="k").collect()
    }
    assert got[1] == (1.0, _ts("2024-01-01T10:00:00"))  # ts equality matches
    assert got[2] == (2.0, _ts("2024-01-01T11:30:00"))  # latest <= wins
    assert got[3] == (None, None)  # nothing before -> null, row kept
    assert got[4] == (9.0, _ts("2024-01-01T11:00:00"))
    assert got[5] == (None, None)  # key isolation
    assert len(got) == 5


def test_asof_forward(spark):
    left, right = _frames(spark)
    got = {
        r.id: (r.v, r.ts_right)
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert got[1] == (1.0, _ts("2024-01-01T10:00:00"))  # equality matches
    assert got[2] == (None, None)  # nothing after 12:00
    assert got[3] == (1.0, _ts("2024-01-01T10:00:00"))  # earliest >= wins
    assert got[4] == (9.0, _ts("2024-01-01T11:00:00"))


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        r.id: r.v
        for r in asof_join(
            left, right, on="k", tolerance_seconds=1800
        ).collect()
    }
    assert got[1] == 1.0  # 0s away
    assert got[2] == 2.0  # 30min away, inside horizon
    assert got[4] == 9.0
    # outside-horizon and no-match rows stay, nulled
    assert got[3] is None and got[5] is None


def test_bloom_dedup_no_false_negatives(spark, sf_dir):
    """Every true duplicate must be dropped (bloom survivors are a
    subset of exact survivors); FP losses stay under a loose bound."""
    from file_d_spark.functions import dedup
    from file_d_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    seen = d.filter(F.col("doc_id") % 5 != 0)
    exact = {
        r.doc_id
        for r in dedup.incremental_dedup(new, seen, "text", "doc_id").collect()
    }
    bloom = {
        r.doc_id
        for r in dedup.bloom_dedup(
            new, seen, "text", "doc_id", expected_items=10_000, fpp=0.01
        ).collect()
    }
    assert bloom <= exact, "bloom must not resurrect a true duplicate"
    n_new = new.count()
    assert exact, "fixture should have novel docs"
    # false positives only cost novel docs; 0.01 nominal, 0.05 loose bound
    assert len(exact - bloom) <= max(1, int(0.05 * n_new))


def test_interval_join_matches_inequality_join(spark, sf_dir):
    """Bucketized interval_join must equal the plain inequality join,
    including intervals spanning multiple buckets and bucket edges."""
    from file_d_spark.functions.asof import interval_join
    from file_d_spark.tables import load_table

    e = load_table(spark, sf_dir, "events")
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("end_ts"),
    )
    clk = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    # bucket (1h) deliberately smaller than the interval (90min) so
    # multi-bucket explode is exercised
    got = {
        (r.event_id, r.pid)
        for r in interval_join(
            clk, pur, on="user_id", point_ts="ts",
            start_ts="start_ts", end_ts="end_ts", bucket_seconds=3600,
        ).collect()
    }
    want = {
        (r.event_id, r.pid)
        for r in clk.alias("c")
        .join(
            pur.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("c.ts") >= F.col("p.start_ts"))
            & (F.col("c.ts") < F.col("p.end_ts")),
        )
        .select("c.event_id", "p.pid")
        .collect()
    }
    assert got == want
    assert got, "fixture should produce in-window pairs"


def test_bloom_dedup_broadcast_model_equivalence(spark, sf_dir):
    """Past literal_max_words the word array ships as a broadcast
    one-row frame; survivors must match the literal path bit-for-bit
    (same filter layout, same false positives)."""
    from file_d_spark.functions import dedup
    from file_d_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    seen = d.filter(F.col("doc_id") % 5 != 0)
    kw = dict(expected_items=10_000, fpp=0.01, portable=True)
    lit = {
        r.doc_id
        for r in dedup.bloom_dedup(
            new, seen, "text", "doc_id", literal_max_words=1 << 22, **kw
        ).collect()
    }
    bc_df = dedup.bloom_dedup(
        new, seen, "text", "doc_id", literal_max_words=0, **kw
    )
    assert "__bloom__" not in bc_df.columns, "probe column must not leak"
    plan = bc_df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan, "big-filter path did not broadcast the words"
    assert lit == {r.doc_id for r in bc_df.collect()}
