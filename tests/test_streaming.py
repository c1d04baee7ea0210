"""Structured Streaming stateful operator tests: file source ->
applyInPandasWithState -> memory sink, driven to completion with
availableNow + processAllAvailable."""

import json
import os

import pytest


def _write_jsonl(tmpdir, name, rows):
    path = os.path.join(tmpdir, name)
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    return path


def _run_stream(out_df, query_name):
    q = (
        out_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


@pytest.fixture()
def stream_reader(spark, tmp_path):
    def make(rows, schema):
        d = tmp_path / "in"
        d.mkdir(exist_ok=True)
        _write_jsonl(str(d), "part-0.jsonl", rows)
        return spark.readStream.schema(schema).json(str(d))

    return make


def test_multiline_join_stream(spark, stream_reader):
    from file_d_spark.streaming import multiline_join_stream

    rows = [
        {"src": "a", "seq": 1, "log": "start A"},
        {"src": "a", "seq": 2, "log": " cont1"},
        {"src": "a", "seq": 3, "log": " cont2"},
        {"src": "a", "seq": 4, "log": "plain"},
        {"src": "a", "seq": 5, "log": "start B"},
        {"src": "a", "seq": 6, "log": " contB"},
        {"src": "b", "seq": 1, "log": " orphan-cont"},
        {"src": "b", "seq": 2, "log": "start C"},
    ]
    df = stream_reader(rows, "src string, seq long, log string")
    out = multiline_join_stream(
        df,
        key_cols=["src"],
        seq_col="seq",
        field="log",
        start_re=r"^start",
        continue_re=r"^\s",
        event_timeout_ms=500,
    )
    _run_stream(out, "mjoin")
    # first batch emits completed sequences; the open "start C" and
    # "start B contB" tails flush on timeout — poke the stream again
    got = {
        (r.src, r.seq): r.log
        for r in spark.sql("SELECT * FROM mjoin").collect()
    }
    assert got[("a", 1)] == "start A cont1 cont2"
    assert got[("a", 4)] == "plain"
    assert got[("b", 1)] == " orphan-cont"


def test_throttle_stream(spark, stream_reader):
    from file_d_spark.streaming import throttle_stream

    rows = [
        {"k": "x", "ts": f"2024-01-01T00:00:{i:02d}.000Z", "n": i} for i in range(10)
    ] + [{"k": "y", "ts": "2024-01-01T00:00:30.000Z", "n": 100}]
    df = stream_reader(rows, "k string, ts timestamp, n long")
    out = throttle_stream(
        df, key_col="k", ts_col="ts", bucket_interval_s=60, buckets_count=10, limit=3
    )
    _run_stream(out, "thr")
    got = spark.sql("SELECT k, count(*) c FROM thr GROUP BY k").collect()
    counts = {r.k: r.c for r in got}
    assert counts == {"x": 3, "y": 1}


def test_cardinality_stream(spark, stream_reader):
    from file_d_spark.streaming import cardinality_stream

    rows = [{"tenant": "t1", "trace": f"tr{i}", "i": i} for i in range(6)] + [
        {"tenant": "t2", "trace": "tr0", "i": 99}
    ]
    df = stream_reader(rows, "tenant string, trace string, i long")
    out = cardinality_stream(df, "tenant", "trace", limit=3, mode="discard")
    _run_stream(out, "card")
    got = spark.sql("SELECT tenant, count(*) c FROM card GROUP BY tenant").collect()
    counts = {r.tenant: r.c for r in got}
    # t1 exceeds 3 distinct traces mid-batch: first 4 events admitted
    # before the limit trips (4th pushes distinct>3 -> over), rest drop
    assert counts.get("t2") == 1
    assert counts.get("t1", 0) <= 4


def test_windowed_agg_with_watermark(spark, stream_reader):
    """Tumbling-window streaming aggregation with a watermark — the
    throttle bucket ring / dead-time cutoff in declarative form
    (SURVEY §2.3 #28: late data beyond the horizon is dropped)."""
    from pyspark.sql import functions as F

    rows = [
        {"k": "a", "ts": "2024-01-01T00:00:10.000Z", "v": 1.0},
        {"k": "a", "ts": "2024-01-01T00:00:50.000Z", "v": 2.0},
        {"k": "b", "ts": "2024-01-01T00:01:10.000Z", "v": 5.0},
    ]
    df = stream_reader(rows, "k string, ts timestamp, v double")
    agg = (
        df.withWatermark("ts", "5 seconds")
        .groupBy(F.window("ts", "1 minute"), "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.k, r.window.start.isoformat()): (r.n, r.total)
        for r in spark.sql("SELECT * FROM wagg").collect()
    }
    # watermark = max(ts) - 5s = 00:01:05 -> the 00:00 window is
    # finalized and emitted; the 00:01 window is still open (append
    # mode withholds it) — exactly the bucket-ring horizon behavior
    assert got == {("a", "2024-01-01T00:00:00"): (2, 3.0)}


def test_antispam_stream(spark, stream_reader):
    from file_d_spark.streaming import antispam_stream

    rows = [{"source": "spammy", "i": i} for i in range(20)] + [
        {"source": "quiet", "i": 1}
    ]
    df = stream_reader(rows, "source string, i long")
    out = antispam_stream(df, "source", threshold=10, maintenance_interval_ms=60_000)
    _run_stream(out, "anti")
    got = {r.source for r in spark.sql("SELECT DISTINCT source FROM anti").collect()}
    assert got == {"quiet"}
