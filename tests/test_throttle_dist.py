"""throttle limit_distribution: per-value ratio shares of the limit
(F5 fixture family)."""

from file_d_spark import Pipeline


def test_throttle_limit_distribution(spark):
    rows = []
    for i in range(30):
        sev = "error" if i % 3 == 0 else ("warn" if i % 3 == 1 else "info")
        rows.append(("svc", f"2024-01-01T00:00:{i:02d}Z", sev, i))
    df = spark.createDataFrame(rows, "k string, time string, severity string, n long")
    p = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "throttle",
                    "throttle_field": "k",
                    "time_field": "time",
                    "time_field_format": "rfc3339",
                    "bucket_interval": "1m",
                    "buckets_count": 100000,
                    "default_limit": 10,
                    "order_fields": ["n"],
                    "limit_distribution": {
                        "field": "severity",
                        "enabled": True,
                        "ratios": [
                            {"ratio": 0.5, "values": ["error"]},
                            {"ratio": 0.3, "values": ["warn"]},
                        ],
                    },
                }
            ]
        }
    )
    out = p.apply(df)
    counts = {r.severity: r.c for r in out.groupBy("severity").count().withColumnRenamed("count", "c").collect()}
    # limit 10: error 50% -> 5, warn 30% -> 3, default 20% -> 2
    assert counts == {"error": 5, "warn": 3, "info": 2}


def test_throttle_negative_limit_unlimited(spark):
    """throttle_test.go:153-181 TestThrottleNoLimit: rules with negative
    limits and a negative default admit every event."""
    from tests.test_actions import run_actions

    rows = [(i, f"pod{i % 3}", f"ns_{i % 2 + 1}", "2024-01-01T00:00:%02dZ" % (i % 60)) for i in range(200)]
    out = run_actions(
        spark,
        rows,
        "event_id long, k8s_pod string, k8s_ns string, time string",
        [
            {
                "type": "throttle",
                "throttle_field": "k8s_pod",
                "bucket_interval": "100ms",
                "buckets_count": 2,
                "default_limit": -20,
                "rules": [
                    {"limit": -2, "conditions": {"k8s_ns": "ns_1"}},
                    {"limit": -3, "conditions": {"k8s_ns": "ns_2"}},
                ],
            }
        ],
    )
    assert out.count() == 200
