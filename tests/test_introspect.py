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
