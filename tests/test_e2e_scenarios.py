"""E2E scenario tests mirroring the reference's e2e dirs
(/root/reference/e2e/: split_join, join_throttle) — action chains over
one pipeline, golden counts."""

import json

from file_d_spark import Pipeline


def test_split_then_join(spark):
    """split explodes an array of objects into child events; a later
    multiline join groups per-source sequences back together
    (e2e/split_join/config.yml shape)."""
    rows = [
        (1, 1, [{"message": "start A"}, {"message": " a1"}, {"message": " a2"}]),
        (1, 2, [{"message": "plain"}]),
        (2, 1, [{"message": "start B"}, {"message": " b1"}]),
    ]
    df = spark.createDataFrame(
        rows, "src int, seq int, data array<struct<message string>>"
    )
    p = Pipeline.from_dict(
        {
            "actions": [
                {"type": "split", "field": "data"},
            ]
        }
    )
    exploded = p.apply(df)
    # per-source element order: derive a child seq from the original
    # seq + position (the engine assigns SeqID at stream put;
    # posexplode is the batch equivalent)
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy("seq")
    exploded = exploded.withColumn("child_seq", F.row_number().over(w))
    p2 = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "join",
                    "field": "message",
                    "start": "^start ",
                    "continue": "^ ",
                    "source_field": "src",
                    "seq_field": "child_seq",
                }
            ]
        }
    )
    out = p2.apply(exploded)
    got = sorted((r.src, r.message) for r in out.collect())
    assert got == [(1, "plain"), (1, "start A a1 a2"), (2, "start B b1")]


def test_join_then_throttle(spark):
    """multiline join then throttle (e2e/join_throttle/config.yml):
    joined events count against the rate limit as single events."""
    rows = []
    seq = 0
    for burst in range(6):
        ts = f"2024-01-01T00:00:{burst:02d}Z"
        rows.append((1, seq, ts, "start panic")); seq += 1
        rows.append((1, seq, ts, " trace line")); seq += 1
    df = spark.createDataFrame(rows, "src int, seq int, time string, log string")
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "join",
                    "field": "log",
                    "start": "^start ",
                    "continue": "^ ",
                    "source_field": "src",
                    "seq_field": "seq",
                },
                {
                    "type": "throttle",
                    "throttle_field": "src",
                    "time_field": "time",
                    "time_field_format": "rfc3339",
                    "bucket_interval": "1m",
                    "buckets_count": 100000,
                    "default_limit": 4,
                    "order_fields": ["seq"],
                },
            ]
        }
    )
    out = p.apply(df).collect()
    # 6 joined events -> throttled to 4 per minute bucket
    assert len(out) == 4
    assert all(r.log == "start panic trace line" for r in out)
