"""PipelineInspector: /info /sample /ban_list surface
(/root/reference/pipeline/pipeline.go:959-1033) and the debug action's
zap-sampler semantics (debug.go:46,83)."""

import json
import urllib.request

from file_d_spark import Pipeline
from file_d_spark.introspect import PipelineInspector


def two_action_inspector(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(10)],
        "n int, kind string",
    )
    p = Pipeline.from_dict(
        {
            "actions": [
                {"type": "discard", "do_if": {"op": "equal", "field": "kind", "values": ["drop"]}},
                {"type": "modify", "tag": "x${n}"},
            ]
        }
    )
    return PipelineInspector(p, df)


def test_info_counters(spark):
    insp = two_action_inspector(spark)
    assert insp.result.count() == 5
    assert insp.info(0) == [
        {"status": "received", "count": 10},
        {"status": "discarded", "count": 5},
        {"status": "passed", "count": 5},
    ]
    assert insp.info(1) == [
        {"status": "received", "count": 5},
        {"status": "discarded", "count": 0},
        {"status": "passed", "count": 5},
    ]


def test_sample_before_after(spark):
    insp = two_action_inspector(spark)
    s = insp.sample(1)
    assert "tag" not in s["before"]
    assert s["after"]["tag"] == f"x{s['after']['n']}"


def test_ban_list(spark):
    df = spark.createDataFrame(
        [("spammy", f"2024-01-01T00:00:{i:02d}") for i in range(5)]
        + [("quiet", "2024-01-01T00:00:00")],
        "source_name string, ts string",
    )
    p = Pipeline.from_dict(
        {
            "actions": [
                {"type": "antispam", "threshold": 3, "maintenance_interval": "1m"}
            ]
        }
    )
    insp = PipelineInspector(p, df)
    assert insp.ban_list() == [{"action": 0, "source": "spammy"}]


def test_http_surface(spark):
    insp = two_action_inspector(spark)
    srv = insp.serve(port=0)
    try:
        port = srv.server_address[1]
        base = f"http://127.0.0.1:{port}/pipelines/pipeline"

        def get(path):
            with urllib.request.urlopen(base + path, timeout=30) as r:
                return json.loads(r.read())

        info = get("/action/0/info")
        assert {e["status"]: e["count"] for e in info} == {
            "received": 10, "discarded": 5, "passed": 5,
        }
        sample = get("/action/1/sample")
        assert sample["after"]["tag"].startswith("x")
        assert get("/ban_list") == []
    finally:
        srv.shutdown()


def test_debug_sampling_first_thereafter(spark):
    from file_d_spark.metrics import DEBUG_LOG

    DEBUG_LOG.clear()
    df = spark.createDataFrame([(i,) for i in range(20)], "n int")
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "debug",
                    "first": 3,
                    "thereafter": 5,
                    "order_fields": ["n"],
                    "collect": True,
                    "message": "probe",
                }
            ]
        }
    )
    out = p.apply(df)
    assert out.count() == 20  # passthrough
    logged = sorted(e["event"]["n"] for e in DEBUG_LOG if e["message"] == "probe")
    # first 3 (n=0,1,2 -> rn 1..3), then every 5th after: rn 8, 13, 18
    assert logged == [0, 1, 2, 7, 12, 17]


def test_prometheus_scrape_and_health(spark):
    """/metrics serves file_d-namespaced counters in prometheus text
    format; /live is always 200; /ready flips to 503 when stopping
    (fd/file.d.go:341-345,388-398)."""
    from file_d_spark.metrics import parse_prometheus_text

    insp = two_action_inspector(spark)
    srv = insp.serve(port=0)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/live", timeout=30) as r:
            assert r.status == 200
        with urllib.request.urlopen(base + "/ready", timeout=30) as r:
            assert r.status == 200

        with urllib.request.urlopen(base + "/metrics", timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
        samples = parse_prometheus_text(body)
        name = insp.plan.name
        assert samples[(
            "file_d_input_plugin_events_count_total",
            (("pipeline", name),),
        )] == 10
        assert samples[(
            "file_d_output_plugin_events_count_total",
            (("pipeline", name),),
        )] == 5
        assert samples[(
            "file_d_action_events_count_total",
            (("action", "0_discard"), ("pipeline", name), ("status", "discarded")),
        )] == 5
        assert samples[(
            "file_d_action_events_count_total",
            (("action", "1_modify"), ("pipeline", name), ("status", "passed")),
        )] == 5
        # exposition hygiene: TYPE lines present exactly once per metric
        assert body.count("# TYPE file_d_action_events_count_total counter") == 1

        insp.stopping = True
        from urllib.error import HTTPError

        try:
            urllib.request.urlopen(base + "/ready", timeout=30)
            assert False, "expected 503 when stopping"
        except HTTPError as e:
            assert e.code == 503
        # live stays green during drain
        with urllib.request.urlopen(base + "/live", timeout=30) as r:
            assert r.status == 200
    finally:
        srv.shutdown()


def test_prom_registry_escaping_and_gauge():
    from file_d_spark.metrics import PromRegistry, parse_prometheus_text

    reg = PromRegistry()
    reg.inc("c_total", 2, path='a"b\\c')
    reg.inc("c_total", 3, path='a"b\\c')
    reg.set("g", 1.5, kind="x")
    text = reg.render()
    samples = parse_prometheus_text(text)
    assert samples[("file_d_c_total", (("path", 'a\\"b\\\\c'),))] == 5
    assert samples[("file_d_g", (("kind", "x"),))] == 1.5
    assert "# TYPE file_d_g gauge" in text


def test_pipeline_dump_and_log_level(spark):
    """GET /pipelines/<name> overview dump (pipeline.go:942-949) and
    the zap-style /log/level handler (file.d.go:347)."""
    import json as _json
    import logging
    import urllib.request

    from file_d_spark import Pipeline
    from file_d_spark.introspect import PipelineInspector

    df = spark.createDataFrame([("a",), ("b",)], "f string")
    insp = PipelineInspector(
        Pipeline.from_dict(
            {
                "actions": [
                    {"type": "discard", "do_if": {
                        "op": "equal", "field": "f", "values": ["a"]}},
                ],
            },
            name="dumpme",
        ),
        df,
    )
    srv = insp.serve(port=0)
    try:
        port = srv.server_address[1]
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/pipelines/dumpme", timeout=60
        ).read().decode()
        assert "<pre>" in page and "pipeline dumpme" in page
        assert "action 0 discard: received=2 passed=1 discarded=1" in page
        assert "f: string" in page

        lvl = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/log/level", timeout=60).read())
        assert "level" in lvl

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/log/level",
            data=b'{"level": "debug"}', method="PUT")
        resp = _json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert resp == {"level": "debug"}
        assert logging.getLogger("file_d_spark").level == logging.DEBUG
        # restore + bad level -> 400
        logging.getLogger("file_d_spark").setLevel(logging.NOTSET)
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/log/level",
            data=b'{"level": "nope"}', method="PUT")
        try:
            urllib.request.urlopen(bad, timeout=60)
            code = 200
        except urllib.error.HTTPError as ex:
            code = ex.code
        assert code == 400
    finally:
        srv.shutdown()


def test_custom_action_metrics(spark):
    """Actions with metric_name/metric_labels emit
    <name>_events_count_total / _events_size_total with label values
    from event fields (pipeline.go:683-716, processor.go:300-330);
    metric_skip_status drops the status label and the received series;
    a missing label field reads "not_set"."""
    from file_d_spark import Pipeline
    from file_d_spark.introspect import PipelineInspector

    df = spark.createDataFrame(
        [("k8s", "a"), ("k8s", "b"), ("vm", "c"), (None, "d")],
        "source string, msg string",
    )
    insp = PipelineInspector(
        Pipeline.from_dict({"actions": [
            {"type": "discard",
             "do_if": {"op": "equal", "field": "source", "values": ["vm"]},
             "metric_name": "drop_vm",
             "metric_labels": ["source"]},
            {"type": "add_host", "field": "host",
             "metric_name": "hosted", "metric_skip_status": True},
        ]}),
        df,
    )
    body = insp.prometheus()
    assert ('file_d_drop_vm_events_count_total{source="k8s",'
            'status="received"} 2') in body
    assert ('file_d_drop_vm_events_count_total{source="vm",'
            'status="discarded"} 1') in body
    assert ('file_d_drop_vm_events_count_total{source="vm",'
            'status="passed"} 0') in body
    assert ('file_d_drop_vm_events_count_total{source="not_set",'
            'status="passed"} 1') in body
    # skip_status: one series, no status label, received not counted
    assert "file_d_hosted_events_count_total 3" in body
    assert 'file_d_hosted_events_count_total{' not in body
    assert "file_d_drop_vm_events_size_total{" in body
    # the metric_* keys must not leak into plugin params
    from file_d_spark.actions import build_action

    act = build_action({"type": "add_host", "metric_name": "x",
                        "metric_labels": ["a"], "metric_skip_status": True})
    assert "metric_name" not in act.params


def test_mask_applied_metric(spark):
    """Per-mask applied_metric_name/labels (mask.go:256, metrics.go):
    counts events the mask fired on, labelled from event fields;
    requires applied_field so the lazy engine has fired evidence."""
    import pytest

    from file_d_spark import Pipeline
    from file_d_spark.introspect import PipelineInspector

    df = spark.createDataFrame(
        [("card 1234", "shop"), ("no digits", "shop"), ("pin 77", "bank")],
        "msg string, svc string",
    )
    insp = PipelineInspector(
        Pipeline.from_dict({"actions": [
            {"type": "mask", "masks": [
                {"re": r"\d+", "groups": [0],
                 "applied_field": "masked",
                 "applied_metric_name": "digits_masked",
                 "applied_metric_labels": ["svc"]},
            ]},
        ]}),
        df,
    )
    body = insp.prometheus()
    assert 'file_d_digits_masked{svc="shop"} 1' in body
    assert 'file_d_digits_masked{svc="bank"} 1' in body

    with pytest.raises(ValueError, match="applied_field"):
        PipelineInspector(
            Pipeline.from_dict({"actions": [
                {"type": "mask", "masks": [
                    {"re": r"\d+", "groups": [0],
                     "applied_metric_name": "x"},
                ]},
            ]}),
            df,
        ).prometheus()
