"""Daemon entrypoint (python -m file_d_spark) tests.

Mirrors the reference's cmd/file.d surface
(/root/reference/cmd/file.d/file.d.go:76-91): repeatable --config
merge, full config->pipelines->streams->sink drain with --once, and
the daemon control plane (live/ready/metrics/log-level/play/pipelines).
"""

import json
import os
import re
import urllib.request

import pytest

from file_d_spark.__main__ import load_pipelines, main, serve_control_plane


def _write(path, text):
    with open(path, "w") as fh:
        fh.write(text)
    return path


def test_load_pipelines_merges_and_rejects_duplicates(tmp_path):
    a = _write(tmp_path / "a.yaml", """
pipelines:
  one:
    actions: []
""")
    b = _write(tmp_path / "b.yaml", """
pipelines:
  two:
    actions: []
""")
    merged = load_pipelines([str(a), str(b)])
    assert sorted(merged) == ["one", "two"]
    with pytest.raises(ValueError, match="more than one config"):
        load_pipelines([str(a), str(a)])


def test_main_once_drains_file_to_file(tmp_path, spark):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    ck = tmp_path / "ck"
    src.mkdir()
    _write(src / "events.jsonl", "\n".join(
        json.dumps({"level": lvl, "message": f"m{i}"})
        for i, lvl in enumerate(["info", "debug", "info", "error"])
    ))
    cfg = _write(tmp_path / "fd.yaml", f"""
pipelines:
  demo:
    settings:
      decoder: json
      decoder_params: {{schema: "level string, message string"}}
    input:
      type: file
      path: {src}
      filename_pattern: "*.jsonl"
    actions:
      - type: discard
        do_if: {{op: equal, field: level, values: [debug]}}
    output:
      type: file
      path: {dst}
      format: json
""")
    rc = main([
        "--config", str(cfg),
        "--checkpoint-root", str(ck),
        "--http", "off",
        "--once",
        "--cpus", "4",
    ])
    assert rc == 0
    rows = []
    for root, _dirs, files in os.walk(dst):
        for f in files:
            if f.endswith(".json"):
                with open(os.path.join(root, f)) as fh:
                    rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(r["message"] for r in rows) == ["m0", "m2", "m3"]
    assert all(r["level"] != "debug" for r in rows)


def test_control_plane_endpoints(spark):
    class FakeQuery:
        isActive = True
        status = {"message": "ok"}
        recentProgress = [{"batchId": 0, "sink": {"numOutputRows": 7}},
                          {"batchId": 1, "sink": {"numOutputRows": 5}}]

    state = {"stopping": False}
    srv = serve_control_plane(
        spark, {"demo": FakeQuery()}, state, "127.0.0.1", 0
    )
    try:
        port = srv.server_address[1]
        base = f"http://127.0.0.1:{port}"
        assert urllib.request.urlopen(f"{base}/live", timeout=30).status == 200
        assert urllib.request.urlopen(f"{base}/ready", timeout=30).status == 200
        pipes = json.loads(
            urllib.request.urlopen(f"{base}/pipelines", timeout=30).read())
        assert pipes["demo"]["active"] is True
        metrics = urllib.request.urlopen(
            f"{base}/metrics", timeout=30).read().decode()
        assert 'pipeline="demo"' in metrics and "12" in metrics

        def scrape_total():
            text = urllib.request.urlopen(
                f"{base}/metrics", timeout=30).read().decode()
            for line in text.splitlines():
                if re.match(r"file_d_output_plugin_events_count_total\b|file_d_output_plugin_events_count_total\{", line):
                    return float(line.rsplit(" ", 1)[1])
            raise AssertionError("counter line missing")

        # counter MONOTONICITY across the recentProgress ring (ADVICE
        # r7): old entries rolling off must not decrease the total, a
        # repeated batchId (no-data tick) must not double-count, and a
        # new batch adds exactly its delta
        assert scrape_total() == 12
        FakeQuery.recentProgress = [
            {"batchId": 1, "sink": {"numOutputRows": 5}},  # repeat: skip
            {"batchId": 2, "sink": {"numOutputRows": 3}},
        ]
        assert scrape_total() == 15
        FakeQuery.recentProgress = [{"batchId": 3, "sink": {"numOutputRows": 1}}]
        assert scrape_total() == 16
        # restart: a NEW runId resets batchIds to 0 — the counter must
        # keep counting (ADVICE r8: the old high-water guard froze it
        # forever after any stop/start) while staying monotonic
        FakeQuery.runId = "run-2"
        FakeQuery.recentProgress = [
            {"batchId": 0, "sink": {"numOutputRows": 4}},
        ]
        assert scrape_total() == 20
        FakeQuery.recentProgress = [
            {"batchId": 0, "sink": {"numOutputRows": 4}},  # same: skip
            {"batchId": 1, "sink": {"numOutputRows": 2}},
        ]
        assert scrape_total() == 22
        play = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"{base}/api/v1/play",
            data=json.dumps({
                "events": [{"a": "x"}],
                "actions": [{"type": "modify", "b": "${a}!"}],
            }).encode(),
        ), timeout=120).read())
        assert play["result"] == [{"a": "x", "b": "x!"}]
        # stopping flips /ready to 503 (file.d.go:388-398)
        state["stopping"] = True
        try:
            urllib.request.urlopen(f"{base}/ready", timeout=30)
            code = 200
        except urllib.error.HTTPError as ex:
            code = ex.code
        assert code == 503
    finally:
        srv.shutdown()


def test_pprof_endpoints(spark):
    """Python-runtime pprof analogues on the daemon mux
    (fd/file.d.go:327-373): thread dump, sampled profile (folded
    stacks), heap stats, cmdline, freeosmem."""
    srv = serve_control_plane(spark, {}, {"stopping": False},
                              "127.0.0.1", 0)
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        idx = json.loads(
            urllib.request.urlopen(f"{base}/debug/pprof", timeout=30).read())
        assert "/debug/pprof/threads" in idx["profiles"]
        cmd = urllib.request.urlopen(
            f"{base}/debug/pprof/cmdline", timeout=30).read().decode()
        assert "python" in cmd or "pytest" in cmd
        threads = urllib.request.urlopen(
            f"{base}/debug/pprof/threads", timeout=30).read().decode()
        assert "thread " in threads and "File " in threads  # real stacks
        prof = urllib.request.urlopen(
            f"{base}/debug/pprof/profile?seconds=0.2", timeout=30
        ).read().decode()
        # folded-stack lines end with a sample count (may be empty if
        # every other thread was idle in C code, but format must hold)
        for line in prof.splitlines():
            assert line.rsplit(" ", 1)[1].isdigit()
        first = urllib.request.urlopen(
            f"{base}/debug/pprof/heap", timeout=30).read().decode()
        second = urllib.request.urlopen(
            f"{base}/debug/pprof/heap", timeout=30).read().decode()
        assert "tracemalloc started" in first or "traced current=" in first
        assert "traced current=" in second
        freed = json.loads(urllib.request.urlopen(
            f"{base}/freeosmem", timeout=30).read())
        assert "collected" in freed
    finally:
        srv.shutdown()
        import tracemalloc

        tracemalloc.stop()


def test_daemon_sigterm_graceful(tmp_path):
    """Real daemon subprocess: serves /ready, stops cleanly on SIGTERM
    (file.d.go main: signal handler -> pipeline stop -> exit 0)."""
    import signal
    import subprocess
    import sys
    import time

    src = tmp_path / "in"
    src.mkdir()
    _write(src / "e.jsonl", json.dumps({"level": "info", "message": "m"}))
    cfg = _write(tmp_path / "fd.yaml", f"""
pipelines:
  demo:
    settings:
      decoder: json
      decoder_params: {{schema: "level string, message string"}}
    input:
      type: file
      path: {src}
      filename_pattern: "*.jsonl"
    output:
      type: file
      path: {tmp_path}/out
      format: json
""")
    proc = subprocess.Popen(
        [sys.executable, "-m", "file_d_spark",
         "--config", str(cfg),
         "--checkpoint-root", str(tmp_path / "ck"),
         "--http", "127.0.0.1:0", "--cpus", "2"],
        env={**os.environ, "PYTHONPATH": "/root/repo"},
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        # the daemon binds an ephemeral port; poll until the stream is
        # running (output dir appears), then signal
        deadline = time.time() + 120
        while time.time() < deadline and not (tmp_path / "out").exists():
            if proc.poll() is not None:
                raise AssertionError(
                    proc.stdout.read().decode(errors="replace")[-2000:])
            time.sleep(0.5)
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
        assert rc == 0, proc.stdout.read().decode(errors="replace")[-2000:]
    finally:
        if proc.poll() is None:
            proc.kill()


def test_control_plane_reset_endpoint(tmp_path, spark):
    """POST /pipelines/<name>/0/reset drops a TailResetter request file
    (resetter.go:34-43) for tail-file pipelines; others 404."""
    from file_d_spark import Pipeline
    from file_d_spark.__main__ import build_resetters

    cfg = f"""
pipelines:
  tailed:
    input:
      type: file
      tail: true
      path: {tmp_path}/logs
      reset_dir: {tmp_path}/resets
    output: {{type: devnull}}
  plain:
    input: {{type: fake}}
    output: {{type: devnull}}
"""
    pipelines = Pipeline.all_from_yaml(cfg)
    resetters = build_resetters(pipelines)
    assert sorted(resetters) == ["tailed"]

    srv = serve_control_plane(
        spark, {}, {"stopping": False}, "127.0.0.1", 0, resetters=resetters
    )
    try:
        port = srv.server_address[1]
        resp = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/pipelines/tailed/0/reset",
            data=b'{"file": "/var/log/app.log"}',
        ), timeout=30).read())
        assert resp["status"] == "ok"
        reqs = os.listdir(tmp_path / "resets")
        assert len(reqs) == 1
        body = json.loads((tmp_path / "resets" / reqs[0]).read_text())
        assert body.get("file") == "/var/log/app.log"
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/pipelines/plain/0/reset",
                data=b"{}"), timeout=30)
            code = 200
        except urllib.error.HTTPError as ex:
            code = ex.code
        assert code == 404
    finally:
        srv.shutdown()


def test_main_once_multiple_pipelines(tmp_path, spark):
    """Two pipelines in one config drain concurrently to separate sinks
    (the reference runs all configured pipelines side by side,
    fd/file.d.go:78-86)."""
    for name in ("p1", "p2"):
        (tmp_path / name).mkdir()
        _write(tmp_path / name / "e.jsonl", "\n".join(
            json.dumps({"n": i, "src": name}) for i in range(5)))
    cfg = _write(tmp_path / "fd.yaml", f"""
pipelines:
  p1:
    settings:
      decoder: json
      decoder_params: {{schema: "n long, src string"}}
    input: {{type: file, path: {tmp_path}/p1, filename_pattern: "*.jsonl"}}
    actions:
      - {{type: discard, do_if: {{op: int_val_cmp, field: n, cmp_op: ge, value: 3}}}}
    output: {{type: file, path: {tmp_path}/out1, format: json}}
  p2:
    settings:
      decoder: json
      decoder_params: {{schema: "n long, src string"}}
    input: {{type: file, path: {tmp_path}/p2, filename_pattern: "*.jsonl"}}
    output: {{type: file, path: {tmp_path}/out2, format: json}}
""")
    rc = main([
        "--config", str(cfg), "--checkpoint-root", str(tmp_path / "ck"),
        "--http", "off", "--once", "--cpus", "4",
    ])
    assert rc == 0

    def rows(d):
        out = []
        for root, _dirs, files in os.walk(d):
            for f in files:
                if f.endswith(".json"):
                    with open(os.path.join(root, f)) as fh:
                        out += [json.loads(l) for l in fh if l.strip()]
        return out

    r1, r2 = rows(tmp_path / "out1"), rows(tmp_path / "out2")
    assert sorted(r["n"] for r in r1) == [0, 1, 2]      # gated
    assert sorted(r["n"] for r in r2) == [0, 1, 2, 3, 4]  # full
    assert {r["src"] for r in r1} == {"p1"} and {r["src"] for r in r2} == {"p2"}
