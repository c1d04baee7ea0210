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


def test_antispam_stream_idle_unban(spark, tmp_path):
    """A banned source that goes quiet for ``unban_idle_ticks``
    maintenance ticks is unbanned (reference antispammer.go:24-120:
    counter decays each maintenance cycle; 4 idle cycles -> unban)."""
    import json
    import time

    from file_d_spark.streaming import antispam_stream

    src = tmp_path / "in"
    src.mkdir()

    def write(name, rows):
        tmp = tmp_path / (name + ".tmp")
        tmp.write_text("\n".join(json.dumps(r) for r in rows))
        tmp.rename(src / name)  # atomic: the reader never sees partials

    sdf = spark.readStream.schema("source string, i long").json(str(src))
    out = antispam_stream(
        sdf, "source", threshold=3,
        maintenance_interval_ms=1500, unban_idle_ticks=2,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("unban")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # over-threshold burst -> spammy is banned, nothing emitted
        write("b0.json", [{"source": "spammy", "i": i} for i in range(10)])
        time.sleep(3)
        # probe in rounds: heartbeats from another source keep
        # micro-batches (and thus state-timeout processing) running
        # while spammy stays idle, then spammy returns.  A probe that
        # lands BEFORE 2 idle ticks were processed is suppressed AND
        # resets the idle counter (activity resets decay, like the
        # reference), so on a lagging host we idle again and re-probe
        # with a fresh i rather than flaking on one-shot timing.
        seen = set()
        unbanned = False
        hb = 0
        for attempt in range(4):
            for _ in range(12):
                write(f"hb{hb}.json", [{"source": "other", "i": hb}])
                hb += 1
                time.sleep(0.7)
            probe = 100 + attempt
            write(f"b{attempt + 1}.json", [{"source": "spammy", "i": probe}])
            deadline = time.time() + 25
            while time.time() < deadline:
                seen = {
                    (r.source, r.i)
                    for r in spark.sql("SELECT source, i FROM unban").collect()
                }
                if ("spammy", probe) in seen:
                    unbanned = True
                    break
                time.sleep(0.5)
            if unbanned:
                break
    finally:
        q.stop()
    assert unbanned, f"still banned after idle ticks: {sorted(seen)}"
    # the original burst stays suppressed; heartbeats flowed through
    assert not any(s == "spammy" and i < 100 for s, i in seen)
    assert ("other", 0) in seen


def test_session_window_stream(spark, stream_reader):
    """Streaming sessionization via Spark's native session_window —
    the streaming counterpart of the batch sessionize query (gap-based
    sessions close when no event arrives within the gap and the
    watermark passes)."""
    from pyspark.sql import functions as F

    rows = [
        # user u1: two events 10s apart (one session), then a 2min gap,
        # then another event (second session)
        {"u": "u1", "ts": "2024-01-01T00:00:00.000Z", "v": 1.0},
        {"u": "u1", "ts": "2024-01-01T00:00:10.000Z", "v": 2.0},
        {"u": "u1", "ts": "2024-01-01T00:02:30.000Z", "v": 4.0},
        # u2: single event
        {"u": "u2", "ts": "2024-01-01T00:00:05.000Z", "v": 9.0},
        # late closer so the watermark passes every session's gap
        {"u": "zz", "ts": "2024-01-01T00:10:00.000Z", "v": 0.0},
    ]
    df = stream_reader(rows, "u string, ts timestamp, v double")
    agg = (
        df.withWatermark("ts", "5 seconds")
        .groupBy(F.session_window("ts", "60 seconds"), "u")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.u, r.session_window.start.isoformat()): (r.n, r.total)
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    assert got[("u1", "2024-01-01T00:00:00")] == (2, 3.0)
    assert got[("u1", "2024-01-01T00:02:30")] == (1, 4.0)
    assert got[("u2", "2024-01-01T00:00:05")] == (1, 9.0)


def test_throttle_stream_rules(spark, stream_reader):
    """Per-rule streaming throttle: the error rule admits 1 per bucket,
    everything else falls to the default limit 3 — each rule owns its
    own ring (limiter key embeds the rule index)."""
    from file_d_spark.actions import build_action

    rows = (
        [{"k": "x", "level": "error", "ts": f"2024-01-01T00:00:{i:02d}.000Z"}
         for i in range(5)]
        + [{"k": "x", "level": "info", "ts": f"2024-01-01T00:00:{i:02d}.500Z"}
           for i in range(5)]
    )
    df = stream_reader(rows, "k string, level string, ts timestamp")
    act = build_action(
        {
            "type": "throttle",
            "throttle_field": "k",
            "time_field": "ts",
            "bucket_interval": "1m",
            "buckets_count": 10,
            "default_limit": 3,
            "rules": [
                {"limit": 1, "conditions": {"level": "error"}},
            ],
        }
    )
    out = act.apply(df)
    _run_stream(out, "thr_rules")
    got = spark.sql(
        "SELECT level, count(*) c FROM thr_rules GROUP BY level"
    ).collect()
    counts = {r.level: r.c for r in got}
    assert counts == {"error": 1, "info": 3}


def test_throttle_stream_distribution_steal(spark, stream_reader):
    """Streaming limit_distribution with default-reserve stealing:
    ratios reserve 0.5 for errors (limit 6 -> 3), default gets 3; a
    burst of defaults steals only from the UNUSED error reserve."""
    from file_d_spark.actions import build_action

    rows = [
        {"k": "x", "level": "warn", "ts": f"2024-01-01T00:00:{i:02d}.000Z"}
        for i in range(8)
    ]
    df = stream_reader(rows, "k string, level string, ts timestamp")
    act = build_action(
        {
            "type": "throttle",
            "throttle_field": "k",
            "time_field": "ts",
            "bucket_interval": "1m",
            "buckets_count": 10,
            "default_limit": 6,
            "limit_distribution": {
                "field": "level",
                "ratios": [{"ratio": 0.5, "values": ["error"]}],
            },
        }
    )
    out = act.apply(df)
    _run_stream(out, "thr_dist")
    # default reserve 3 admits 3; overflow steals the error reserve (3)
    assert spark.sql("SELECT count(*) c FROM thr_dist").collect()[0].c == 6


def test_join_template_stream_per_template_gating(spark, stream_reader):
    """Streaming join_template: the template whose start opened the
    block governs the continue check (join_template.go firstCheck/
    nextCheck) — a C# continuation line after a Go panic start must
    NOT extend the Go block; parity with the batch operator's gating
    (Q join_template_multi)."""
    from file_d_spark import Pipeline

    rows = [
        {"src": "a", "seq": 1, "log": "panic: boom"},
        {"src": "a", "seq": 2, "log": "goroutine 7 [running]:"},
        # cs_exception continue ("   at ...") right after a go_panic
        # block: go_panic's continue also matches leading-whitespace?
        # no — "   at Foo.Bar()" matches cs 'at' rule but go_panic's
        # method-call rule ALSO matches "Foo.Bar()" — pick a line only
        # the cs template continues:
        {"src": "a", "seq": 3, "log": "   ---> inner exception"},
        {"src": "a", "seq": 4, "log": "plain line"},
        {"src": "a", "seq": 5, "log": "Unhandled exception. X"},
        {"src": "a", "seq": 6, "log": "   ---> inner exception"},
    ]
    df = stream_reader(rows, "src string, seq long, log string")
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "join_template",
                    "templates": ["go_panic", "cs_exception"],
                    "field": "log",
                    "source_field": "src",
                    "seq_field": "seq",
                    "event_timeout_ms": 500,
                }
            ]
        }
    )
    out = p.apply(df)
    _run_stream(out, "jts")
    got = {
        (r.src, r.seq): r.log
        for r in spark.sql("SELECT * FROM jts").collect()
    }
    # go block closed BEFORE the cs continue line (cross-template leak
    # would have glued seq 3 into it)
    assert got[("a", 1)] == "panic: boomgoroutine 7 [running]:"
    assert got[("a", 3)] == "   ---> inner exception"
    assert got[("a", 4)] == "plain line"
    # the cs block consumed ITS continue and flushed via timeout
    assert got.get(("a", 5)) == "Unhandled exception. X   ---> inner exception"
