"""Kafka contract tests — no broker in this container, so these pin
the option mapping and the wire-frame transforms that a live kafka
connection would exercise (the format('kafka') call itself is the only
untested seam, and it is configuration-only).

Reference: /root/reference/plugin/input/kafka/kafka.go,
/root/reference/plugin/output/kafka/kafka.go."""

import json

from pyspark.sql import functions as F

from file_d_spark.config import PipelinePlan
from file_d_spark.sinks import kafka_sink_frame, kafka_sink_options
from file_d_spark.sources import decode_kafka_frame, kafka_source_options

KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int, "
    "headers array<struct<key:string,value:binary>>"
)


def test_source_option_mapping():
    opts = kafka_source_options(
        {
            "brokers": ["b1:9092", "b2:9092"],
            "topics": ["t1", "t2"],
            "offset": "oldest",
            "consumer_group": "grp",
            "client_id": "cid",
            "fetch_max_bytes": 1024,
            "fetch_min_bytes": 2,
            "consumer_max_wait_time": "500ms",
            "session_timeout": "30s",
            "heartbeat_interval": "5s",
        }
    )
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "t1,t2"
    assert opts["startingOffsets"] == "earliest"
    assert opts["kafka.group.id"] == "grp"
    assert opts["kafka.client.id"] == "cid"
    assert opts["kafka.fetch.max.bytes"] == "1024"
    assert opts["kafka.fetch.min.bytes"] == "2"
    assert opts["kafka.fetch.max.wait.ms"] == "500"
    assert opts["kafka.session.timeout.ms"] == "30000"
    assert opts["kafka.heartbeat.interval.ms"] == "5000"
    assert opts["includeHeaders"] == "true"
    # default offset=newest -> latest
    assert kafka_source_options({})["startingOffsets"] == "latest"


def test_source_sasl_mapping():
    opts = kafka_source_options(
        {
            "is_sasl_enabled": True,
            "sasl_mechanism": "PLAIN",
            "sasl_username": "u",
            "sasl_password": "p",
        }
    )
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert 'username="u"' in opts["kafka.sasl.jaas.config"]
    assert "PlainLoginModule" in opts["kafka.sasl.jaas.config"]
    opts = kafka_source_options(
        {"is_sasl_enabled": True, "is_ssl_enabled": True}
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert "ScramLoginModule" in opts["kafka.sasl.jaas.config"]
    assert kafka_source_options({"is_ssl_enabled": True})[
        "kafka.security.protocol"
    ] == "SSL"


def test_decode_kafka_frame_json(spark):
    plan = PipelinePlan.from_dict(
        "p",
        {
            "settings": {
                "decoder": "json",
                "decoder_params": {"schema": "a int, b string"},
            },
            "actions": [],
        },
    )
    rows = [
        (
            b"k1",
            json.dumps({"a": 1, "b": "x"}).encode(),
            "logs",
            0,
            42,
            None,
            0,
            [("h1", b"v1"), ("h2", b"v2")],
        )
    ]
    df = spark.createDataFrame(rows, KAFKA_WIRE_SCHEMA)
    out = decode_kafka_frame(df, plan)
    assert {"a", "b", "_topic", "_partition", "_offset", "_headers"} <= set(
        out.columns
    )
    r = out.collect()[0]
    assert (r.a, r.b) == (1, "x")
    assert (r._topic, r._partition, r._offset) == ("logs", 0, 42)
    assert r._headers == {"h1": "v1", "h2": "v2"}


def test_decode_kafka_frame_raw_without_headers(spark):
    plan = PipelinePlan.from_dict(
        "p", {"settings": {"decoder": "raw"}, "actions": []}
    )
    df = spark.createDataFrame(
        [(None, b"hello", "t", 3, 7, None, 0)],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int",
    )
    r = decode_kafka_frame(df, plan).collect()[0]
    assert r.message == "hello"
    assert (r._topic, r._partition, r._offset) == ("t", 3, 7)
    assert "_headers" not in decode_kafka_frame(df, plan).columns


def test_sink_option_mapping():
    opts = kafka_sink_options(
        {
            "brokers": "b:9092",
            "default_topic": "out",
            "ack": "all-isr",
            "retry": 3,
            "max_message_bytes": 500,
            "compression": "zstd",
        }
    )
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.retries"] == "3"
    assert opts["kafka.max.request.size"] == "500"
    assert opts["kafka.compression.type"] == "zstd"
    assert opts["topic"] == "out"
    # topic routed per event -> no static topic option
    assert "topic" not in kafka_sink_options(
        {"use_topic_field": True, "default_topic": "out"}
    )
    assert kafka_sink_options({"ack": "no"})["kafka.acks"] == "0"
    assert kafka_sink_options({})["kafka.acks"] == "1"


def test_sink_frame_topic_routing(spark):
    df = spark.createDataFrame(
        [(1, "a", "custom"), (2, "b", None)], "x int, y string, topic string"
    )
    out = kafka_sink_frame(
        df, {"use_topic_field": True, "default_topic": "fallback"}
    )
    assert set(out.columns) == {"value", "topic"}
    rows = {json.loads(r.value)["x"]: r for r in out.collect()}
    assert rows[1].topic == "custom"
    assert rows[2].topic == "fallback"
    assert json.loads(rows[1].value) == {"x": 1, "y": "a", "topic": "custom"}
    # without use_topic_field only value is produced
    out2 = kafka_sink_frame(df.select("x", "y"), {"default_topic": "t"})
    assert out2.columns == ["value"]


def test_capacity_maps_to_max_offsets_per_trigger():
    """Pipeline capacity (the reference's bounded event pool) becomes
    per-trigger offset admission on the streaming kafka reader; an
    explicit max_offsets_per_trigger option wins; batch reads get no
    trigger option at all."""
    base = {"brokers": ["b:9092"], "topics": ["t"]}
    opts = kafka_source_options(dict(base), capacity=2048, streaming=True)
    assert opts["maxOffsetsPerTrigger"] == "2048"
    opts = kafka_source_options(
        dict(base, max_offsets_per_trigger=500), capacity=2048, streaming=True
    )
    assert opts["maxOffsetsPerTrigger"] == "500"
    assert "maxOffsetsPerTrigger" not in kafka_source_options(
        dict(base), capacity=2048, streaming=False
    )
