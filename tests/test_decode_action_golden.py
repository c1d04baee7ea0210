"""Golden pairs for the decode action, mirroring
/root/reference/plugin/action/decode/decode_test.go rows not yet
covered by test_decode_action.py."""

from file_d_spark.engine import Pipeline

PG_LINE = (
    "2021-06-22 16:24:27 GMT [7291] => [3-1] "
    'client=test_client,db=test_db,user=test_user LOG:  '
    'listening on Unix socket "/var/run/postgresql/.s.PGSQL.5432"'
)


def run(spark, line, cfg, level="error"):
    df = spark.createDataFrame([(level, line)], "level string, log string")
    return Pipeline.from_dict({"actions": [cfg]}).apply(df).collect()[0]


def test_decode_json_not_obj(spark):
    """decode_test.go json_not_obj: the reference passes the event
    untouched on decode failure.  Typed-engine divergence: the target
    column is map-typed for every row, so an unparsable payload can
    only become a NULL map — the rest of the event is untouched
    (documented in actions/json_ops.py)."""
    row = run(spark, "not obj", {"type": "decode", "field": "log"})
    d = row.asDict()
    assert d["level"] == "error"
    assert d["log"] is None


def test_decode_postgres(spark):
    row = run(spark, PG_LINE, {"type": "decode", "field": "log", "decoder": "postgres"})
    assert row.time == "2021-06-22 16:24:27 GMT"
    assert row.pid == "7291"
    assert row.pid_message_number == "3-1"
    assert (row.client, row.db, row.user) == ("test_client", "test_db", "test_user")
    # postgres decodes its remainder back into "log" (overwrite in place)
    assert row.log == 'listening on Unix socket "/var/run/postgresql/.s.PGSQL.5432"'
    assert row.level == "error"


def test_decode_postgres_prefix(spark):
    row = run(
        spark,
        PG_LINE,
        {"type": "decode", "field": "log", "decoder": "postgres", "prefix": "p_"},
    )
    d = row.asDict()
    assert d["p_time"] == "2021-06-22 16:24:27 GMT"
    assert d["p_pid"] == "7291"
    assert d["p_log"] == 'listening on Unix socket "/var/run/postgresql/.s.PGSQL.5432"'


def test_decode_nginx_error_level_overwrite(spark):
    """without a prefix the decoded level REPLACES the event's level
    (decode_test.go nginx_error: level warn -> error)."""
    row = run(
        spark,
        "2022/08/17 10:49:27 [error] 2725122#2725122: *792412315 "
        "lua udp socket read timed out, context: ngx.timer\n",
        {"type": "decode", "field": "log", "decoder": "nginx_error"},
        level="warn",
    )
    assert row.level == "error"
    assert row.time == "2022/08/17 10:49:27"
    assert (row.pid, row.tid, row.cid) == ("2725122", "2725122", "792412315")
    assert row.message == "lua udp socket read timed out, context: ngx.timer"


def test_decode_nginx_error_prefix_keeps_level(spark):
    row = run(
        spark,
        "2022/08/17 10:49:27 [error] 2725122#2725122: *792412315 "
        "lua udp socket read timed out, context: ngx.timer",
        {"type": "decode", "field": "log", "decoder": "nginx_error", "prefix": "p_"},
        level="warn",
    )
    d = row.asDict()
    assert d["level"] == "warn"
    assert d["p_level"] == "error"
    assert d["p_message"] == "lua udp socket read timed out, context: ngx.timer"


def test_decode_nginx_error_custom_fields(spark):
    row = run(
        spark,
        "2022/08/18 09:29:37 [error] 844935#844935: *44934601 upstream timed out "
        "(110: Operation timed out), while connecting to upstream, "
        'client: 10.125.172.251, server: , request: "POST /download HTTP/1.1", '
        'upstream: "http://10.117.246.15:84/download", '
        'host: "mpm-youtube-downloader-38.name.tldn:84"\n',
        {
            "type": "decode",
            "field": "log",
            "decoder": "nginx_error",
            "params": {"nginx_with_custom_fields": True},
        },
        level="warn",
    )
    assert row.level == "error"
    assert row.time == "2022/08/18 09:29:37"
    assert (row.pid, row.tid, row.cid) == ("844935", "844935", "44934601")
    assert row.message == (
        "upstream timed out (110: Operation timed out), while connecting to upstream"
    )
    cf = row.custom_fields
    assert cf["client"] == "10.125.172.251"
    assert cf["server"] == ""
    assert cf["request"] == "POST /download HTTP/1.1"
    assert cf["upstream"] == "http://10.117.246.15:84/download"
    assert cf["host"] == "mpm-youtube-downloader-38.name.tldn:84"


def test_decode_protobuf_action(spark):
    """decode_test.go protobuf/protobuf_prefix through the decode
    action, via the pure-Python fallback."""
    from tests.test_protobuf_golden import INPUT, PROTO

    df = spark.createDataFrame([("error", bytes(INPUT))], "level string, log binary")
    for prefix, get in (("", lambda r, n: r.asDict()[n]), ("p_", lambda r, n: r.asDict()["p_" + n])):
        cfg = {
            "type": "decode",
            "field": "log",
            "decoder": "protobuf",
            "params": {"proto_file": PROTO, "proto_message": "MyMessage"},
        }
        if prefix:
            cfg["prefix"] = prefix
        row = Pipeline.from_dict({"actions": [cfg]}).apply(df).collect()[0]
        data = get(row, "data")
        assert data.string_data == "my_string" and data.int_data == 123
        internal = get(row, "internal_data")
        assert list(internal.my_strings) == ["str1", "str2"]
        assert internal.is_valid is True
        assert get(row, "version") == "10"
