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


# ---------------------------------------------------------------------------
# file_es_split: file -> ES with split_batch bisect + poison event
# ---------------------------------------------------------------------------


def _limited_collector(tmpdir, max_bytes):
    """ES stub with http.max_content_length semantics: any request
    larger than max_bytes is rejected with 413 (the e2e scenario's ES
    is configured with http.max_content_length=128b)."""
    import os

    os.makedirs(tmpdir, exist_ok=True)

    def send(payload: str):
        import os
        import tempfile

        from file_d_spark.sinks import PayloadTooLarge

        if len(payload.encode()) > max_bytes:
            raise PayloadTooLarge(len(payload))
        fd, path = tempfile.mkstemp(dir=tmpdir, suffix=".payload")
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)

    return send


def test_file_es_split(spark, tmp_path):
    """Replays e2e/file_es_split: 10 ok events, 1 poison event larger
    than the ES max_content_length, 20 ok events after.  split_batch
    bisects down to single events; the poison single still 413s and
    (strict=false) skips the REST of the batch — exactly n=10 documents
    land in index_name (file_es_split.go:77-99 asserts count == n)."""
    from file_d_spark import Pipeline
    from file_d_spark.sinks import sink_elasticsearch

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    ok = {"field_a": "AAA", "field_b": "BBB"}
    poison = {"s": "#" * 128}
    with open(in_dir / "input.log", "w") as fh:
        for _ in range(10):
            fh.write(json.dumps(ok) + "\n")
        fh.write(json.dumps(poison) + "\n")
        for _ in range(20):
            fh.write(json.dumps(ok) + "\n")

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {
                    "schema": "field_a string, field_b string, s string"
                },
            },
            "input": {
                "type": "file",
                "watching_dir": str(in_dir),
                "filename_pattern": "input.log",
            },
        }
    )
    out = str(tmp_path / "es")
    df = p.run_batch(spark).coalesce(1)
    sink_elasticsearch(
        df,
        {
            "index_format": "index_name",
            "split_batch": True,
            "strict": False,
            "transport": _limited_collector(out, 200),
        },
    )
    import glob as _glob

    payloads = [open(f).read() for f in sorted(_glob.glob(f"{out}/*.payload"))]
    lines = [l for p_ in payloads for l in p_.strip().split("\n")]
    actions = [json.loads(l) for l in lines[0::2]]
    docs = [json.loads(l) for l in lines[1::2]]
    assert all(a == {"index": {"_index": "index_name"}} for a in actions)
    assert len(docs) == 10, f"expected exactly the 10 pre-poison docs, got {len(docs)}"
    assert all(d["field_a"] == "AAA" for d in docs)


def test_file_es_split_strict_raises(spark, tmp_path):
    """strict: true -> the poison single event propagates (the
    reference Fatals, elasticsearch.go:398-404)."""
    import pytest

    from file_d_spark.sinks import sink_elasticsearch

    df = spark.createDataFrame([("#" * 300,)], "s string").coalesce(1)
    out = str(tmp_path / "es")
    with pytest.raises(Exception) as ei:
        sink_elasticsearch(
            df,
            {
                "index_format": "index_name",
                "split_batch": True,
                "strict": True,
                "transport": _limited_collector(out, 200),
            },
        )
    assert "PayloadTooLarge" in str(ei.value) or "PayloadTooLarge" in repr(ei.value)


# ---------------------------------------------------------------------------
# http_file: http clients -> pipeline -> file output
# ---------------------------------------------------------------------------


def test_http_file(spark, tmp_path):
    """Replays e2e/http_file: several clients POST the sample bodies to
    the http input; the pipeline (discard gated on should_drop, mask
    'world' with leak marker) writes every processed event to the file
    output; line count == clients*lines (http_file.go:70-76).

    The config's join action is gated `match_fields: stream: stderr` —
    none of the sample events carries it, so no event traverses the
    join; the typed engine compiles the chain those events DO traverse
    (a conditional shape-changer cannot hold two schemas)."""
    import urllib.request

    from file_d_spark import Pipeline
    from file_d_spark.sources.ingest import HttpIngestServer

    samples = [{"ok": "google"}, {"ping": "pong"}, {"hello": "world"}]
    spool = str(tmp_path / "spool")
    srv = HttpIngestServer(spool).start()
    try:
        count, lines = 3, 3
        for _ in range(count):
            for j in range(lines):
                body = json.dumps(samples[j % len(samples)]).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/?login=e2e-test",
                    data=body,
                    method="POST",
                )
                urllib.request.urlopen(req)
    finally:
        srv.stop()

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {
                    "schema": "ok string, ping string, hello string"
                },
            },
            "input": {"type": "http", "spool_dir": spool},
            "actions": [
                {
                    "type": "discard",
                    "match_fields": {"should_drop": "ok"},
                    "match_mode": "or",
                },
                {
                    "type": "mask",
                    "masks": [{"re": "world"}],
                    "mask_applied_field": "leak",
                    "mask_applied_value": "true",
                },
            ],
            "output": {
                "type": "file",
                "target_file": str(tmp_path / "out" / "file-d.log"),
            },
        }
    )
    df = p.run_batch(spark)
    p.write(df)
    import glob as _glob

    # the file sink writes a Spark json directory at target_file
    files = _glob.glob(str(tmp_path / "out" / "**" / "part-*"), recursive=True)
    assert files, "no files with processed events"
    rows = []
    for f in files:
        with open(f) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert len(rows) == count * lines, "wrong number of processed events"
    leaked = [r for r in rows if r.get("leak") == "true"]
    assert len(leaked) == count  # one hello-world sample per client
    assert all(r["hello"] == "*****" for r in leaked)


# ---------------------------------------------------------------------------
# file_loki: file -> loki push payloads
# ---------------------------------------------------------------------------


def test_file_loki(spark, tmp_path):
    """Replays e2e/file_loki: the 12 sample events (two containers x 6
    messages, sample.go) flow file -> loki; payloads carry the
    configured label set and one [nano_ts, line] value per event, and
    every message round-trips (file_loki.go Validate checks messages
    per label + timestamp presence)."""
    from file_d_spark import Pipeline
    from file_d_spark.sinks import sink_loki

    samples = [
        {"timestamp": "", "k8s_container": c, "message": m}
        for c in ("container", "container2")
        for m in ("started", "message1", "message2", "message3", "message4",
                  "stopped")
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "loki.log", "w") as fh:
        for s in samples:
            fh.write(json.dumps(s) + "\n")

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {
                    "schema": "timestamp string, k8s_container string, "
                              "message string"
                },
            },
            "input": {
                "type": "file",
                "watching_dir": str(in_dir),
                "filename_pattern": "loki.log",
            },
        }
    )
    out = str(tmp_path / "loki")
    sink_loki(
        p.run_batch(spark).coalesce(1),
        {
            "labels": {"label1": "value1"},
            "message_field": "message",
            "timestamp_field": "timestamp",
            "transport": _collector_loki(out),
        },
    )
    import glob as _glob

    payloads = [
        json.loads(open(f).read())
        for f in sorted(_glob.glob(f"{out}/*.payload"))
    ]
    assert payloads
    values = []
    for pl in payloads:
        for stream in pl["streams"]:
            assert stream["stream"] == {"label1": "value1"}
            values += stream["values"]
    assert len(values) == len(samples)
    msgs = {}
    for nano, line in values:
        assert int(nano) > 0  # loki rejects zero/absent stamps
        d = json.loads(line)
        msgs.setdefault(d["k8s_container"], set()).add(d["message"])
    assert msgs == {
        "container": {"started", "message1", "message2", "message3",
                      "message4", "stopped"},
        "container2": {"started", "message1", "message2", "message3",
                       "message4", "stopped"},
    }


def _collector_loki(tmpdir):
    import os

    os.makedirs(tmpdir, exist_ok=True)

    def send(payload: str):
        import os
        import tempfile

        fd, path = tempfile.mkstemp(dir=tmpdir, suffix=".payload")
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)

    return send


# ---------------------------------------------------------------------------
# file_socket: file -> socket sink (tcp + udp)
# ---------------------------------------------------------------------------


def test_file_socket_tcp_and_udp(spark, tmp_path):
    """Replays e2e/file_socket: Count newline-delimited JSON events flow
    file -> socket output; the test server must receive exactly Count
    messages, each carrying the 'message' field
    (file_socket.go:59-67)."""
    import socket as socketmod
    import socketserver
    import threading

    from file_d_spark import Pipeline
    from file_d_spark.sinks import sink_socket

    count = 10
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    with open(in_dir / "messages.log", "w") as fh:
        for i in range(count):
            fh.write(json.dumps({"id": i, "message": "test"}) + "\n")

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "id long, message string"},
            },
            "input": {
                "type": "file",
                "watching_dir": str(in_dir),
                "filename_pattern": "messages.log",
            },
        }
    )
    df = p.run_batch(spark).coalesce(1)

    # tcp
    received = []
    class Handler(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                received.append(json.loads(line))

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        sink_socket(df, {
            "network": "tcp",
            "address": f"127.0.0.1:{srv.server_address[1]}",
        })
        import time as _t
        deadline = _t.time() + 10
        while len(received) < count and _t.time() < deadline:
            _t.sleep(0.1)
    finally:
        srv.shutdown()
    assert len(received) == count
    assert all("message" in m and m["message"] == "test" for m in received)
    assert sorted(m["id"] for m in received) == list(range(count))

    # udp
    udp_received = []
    usock = socketmod.socket(socketmod.AF_INET, socketmod.SOCK_DGRAM)
    usock.bind(("127.0.0.1", 0))
    usock.settimeout(10)
    uport = usock.getsockname()[1]

    def drain():
        try:
            while len(udp_received) < count:
                data, _ = usock.recvfrom(65536)
                for line in data.decode().splitlines():
                    if line.strip():
                        udp_received.append(json.loads(line))
        except OSError:
            pass

    t = threading.Thread(target=drain, daemon=True)
    t.start()
    sink_socket(df, {"network": "udp", "address": f"127.0.0.1:{uport}"})
    t.join(10)
    usock.close()
    assert len(udp_received) == count
    assert all(m["message"] == "test" for m in udp_received)


# ---------------------------------------------------------------------------
# file_file: many files in parallel -> pipeline -> file output
# ---------------------------------------------------------------------------


def test_file_file(spark, tmp_path):
    """Replays e2e/file_file: Count files x Lines events each land in
    the watched dir; the pipeline (discard gated on should_drop; the
    stderr-gated join matches no sample event, see test_http_file)
    writes them all to the file output — line count == Count*Lines
    (file_file.go:47-76).  The streaming restart-no-dup variant of this
    scenario lives in test_pipeline_stream."""
    from file_d_spark import Pipeline

    count, lines = 4, 25
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for c in range(count):
        with open(in_dir / f"pod_ns_container-{c}.log", "w") as fh:
            for j in range(lines):
                fh.write(json.dumps({"file": c, "line": j, "log": "msg"}) + "\n")

    p = Pipeline.from_dict(
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {
                    "schema": "file long, line long, log string"
                },
            },
            "input": {
                "type": "file",
                "watching_dir": str(in_dir),
                "filename_pattern": "pod_ns_container-*",
            },
            "actions": [
                {
                    "type": "discard",
                    "match_fields": {"should_drop": "ok"},
                    "match_mode": "or",
                },
            ],
            "output": {
                "type": "file",
                "target_file": str(tmp_path / "out" / "file-d.log"),
            },
        }
    )
    df = p.run_batch(spark)
    p.write(df)
    import glob as _glob

    files = _glob.glob(str(tmp_path / "out" / "**" / "part-*"), recursive=True)
    assert files, "no files with processed events"
    rows = []
    for f in files:
        with open(f) as fh:
            rows += [json.loads(l) for l in fh if l.strip()]
    assert len(rows) == count * lines, "wrong number of processed events"
    per_file = {}
    for r in rows:
        per_file.setdefault(r["file"], set()).add(r["line"])
    assert all(v == set(range(lines)) for v in per_file.values())
