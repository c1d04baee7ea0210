"""Golden decode-action cases replayed from the reference's own test
table (/root/reference/plugin/action/decode/decode_test.go:35-420).
Typed-engine divergences (documented): schemaless json lands as a map
under the source field instead of splatting at root; nginx custom
fields land in a custom_fields map."""

from __future__ import annotations

from file_d_spark import Pipeline


def _decode(spark, line, cfg):
    df = spark.createDataFrame([("error", line)], "level string, log string")
    return Pipeline.from_dict({"actions": [cfg]}).apply(df).collect()[0]


def test_json_map(spark):
    row = _decode(
        spark,
        '{"field1":"value1","field2":"value2"}',
        {"type": "decode", "field": "log"},
    )
    assert row.level == "error"
    assert row.log == {"field1": "value1", "field2": "value2"}


def test_json_max_fields_size(spark):
    row = _decode(
        spark,
        '{"field1":"value long long long","field2":"value2","field3":true}',
        {
            "type": "decode",
            "field": "log",
            "decoder": "json",
            "params": {
                "json_max_fields_size": {"field1": 5, "field2": 10, "field3": 1}
            },
        },
    )
    # string fields truncated to their per-field cap; non-strings kept
    # whole (decode_test.go:69-88)
    assert row.log == {"field1": "value", "field2": "value2", "field3": "true"}


def test_json_max_fields_size_schema(spark):
    row = _decode(
        spark,
        '{"field1":"value long long long","field3":true}',
        {
            "type": "decode",
            "field": "log",
            "decoder": "json",
            "params": {
                "schema": "field1 string, field3 boolean",
                "json_max_fields_size": {"field1": 5, "field3": 1},
            },
        },
    )
    assert row.field1 == "value"
    assert row.field3 is True


def test_postgres(spark):
    row = _decode(
        spark,
        "2021-06-22 16:24:27 GMT [7291] => [3-1] "
        "client=test_client,db=test_db,user=test_user LOG:  "
        'listening on Unix socket "/var/run/postgresql/.s.PGSQL.5432"',
        {"type": "decode", "field": "log", "decoder": "postgres"},
    )
    assert row.time == "2021-06-22 16:24:27 GMT"
    assert row.pid == "7291"
    assert row.pid_message_number == "3-1"
    assert row.client == "test_client"
    assert row.db == "test_db"
    assert row.user == "test_user"
    assert row.log == 'listening on Unix socket "/var/run/postgresql/.s.PGSQL.5432"'


def test_postgres_prefix(spark):
    row = _decode(
        spark,
        "2021-06-22 16:24:27 GMT [7291] => [3-1] "
        "client=test_client,db=test_db,user=test_user LOG:  x",
        {"type": "decode", "field": "log", "decoder": "postgres", "prefix": "p_"},
    )
    assert row.p_time == "2021-06-22 16:24:27 GMT"
    assert row.p_user == "test_user"
    assert row.p_log == "x"


def test_nginx_error(spark):
    row = _decode(
        spark,
        "2022/08/17 10:49:27 [error] 2725122#2725122: *792412315 "
        "lua udp socket read timed out, context: ngx.timer\n",
        {"type": "decode", "field": "log", "decoder": "nginx_error"},
    )
    assert row.time == "2022/08/17 10:49:27"
    assert row.level == "error"
    assert row.pid == "2725122"
    assert row.tid == "2725122"
    assert row.cid == "792412315"
    assert row.message == "lua udp socket read timed out, context: ngx.timer"


def test_nginx_error_custom_fields(spark):
    row = _decode(
        spark,
        "2022/08/18 09:29:37 [error] 844935#844935: *44934601 "
        "upstream timed out (110: Operation timed out), while connecting "
        "to upstream, client: 10.125.172.251, server: , "
        'request: "POST /download HTTP/1.1", '
        'upstream: "http://10.117.246.15:84/download", '
        'host: "mpm-youtube-downloader-38.name.tldn:84"\n',
        {
            "type": "decode",
            "field": "log",
            "decoder": "nginx_error",
            "params": {"nginx_with_custom_fields": True},
        },
    )
    # decode_test.go:172-196: message cut at the first custom field;
    # values dequoted; empty "server: " kept as empty string
    assert row.message == (
        "upstream timed out (110: Operation timed out), while connecting to upstream"
    )
    assert row.custom_fields == {
        "client": "10.125.172.251",
        "server": "",
        "request": "POST /download HTTP/1.1",
        "upstream": "http://10.117.246.15:84/download",
        "host": "mpm-youtube-downloader-38.name.tldn:84",
    }


def test_syslog_rfc3164(spark):
    row = _decode(
        spark,
        "<34>Oct  5 22:14:15 mymachine.example.com myproc[10]: "
        "'myproc' failed on /dev/pts/8",
        {"type": "decode", "field": "log", "decoder": "syslog_rfc3164"},
    )
    assert row.priority == "34"
    assert row.facility == "4"
    assert row.severity == "2"
    assert row.timestamp == "Oct  5 22:14:15"
    assert row.hostname == "mymachine.example.com"
    assert row.app_name == "myproc"
    assert row.process_id == "10"
    assert row.message == "'myproc' failed on /dev/pts/8"


def test_syslog_rfc3164_string_priority(spark):
    row = _decode(
        spark,
        "<34>Oct  5 22:14:15 mymachine.example.com myproc[10]: x",
        {
            "type": "decode",
            "field": "log",
            "decoder": "syslog_rfc3164",
            "params": {
                "syslog_facility_format": "string",
                "syslog_severity_format": "string",
            },
        },
    )
    # syslog.go:112-189: AUTH / CRIT (not AUTHPRIV/CRITICAL)
    assert row.facility == "AUTH"
    assert row.severity == "CRIT"


def test_syslog_rfc5424_structured_data(spark):
    row = _decode(
        spark,
        "<165>1 2003-10-11T22:14:15.003Z mymachine.example.com myproc 10 ID47 "
        '[exampleSDID@32473 iut="3" eventSource="Application" eventID="1011"] '
        "An application event log",
        {"type": "decode", "field": "log", "decoder": "syslog_rfc5424"},
    )
    assert row.priority == "165"
    assert row.facility == "20"
    assert row.severity == "5"
    assert row.proto_version == "1"
    assert row.timestamp == "2003-10-11T22:14:15.003Z"
    assert row.hostname == "mymachine.example.com"
    assert row.app_name == "myproc"
    assert row.process_id == "10"
    assert row.message_id == "ID47"
    assert row.message == "An application event log"
    sd = row.structured_data["exampleSDID@32473"]
    assert sd["iut"] == "3"
    assert sd["eventSource"] == "Application"
    assert sd["eventID"] == "1011"


def test_json_extract_multi_types(spark):
    """json_extract_test.go:62-84 extract_multi: every JSON value type
    extracted to root as its textual form (objects/arrays as compact
    JSON; null as SQL NULL in the typed engine)."""
    line = (
        '{"test":"test_value","extracted_str":"str","extracted_int":10,'
        '"extracted_float":123.45,"extracted_bool":false,"extracted_null":null,'
        '"extracted_obj":{"ext1":"val1","ext2":25},"extracted_arr":[1,2,3,4,5]}'
    )
    df = spark.createDataFrame([("value1", line)], "field1 string, json_field string")
    row = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": [
                            "extracted_str",
                            "extracted_int",
                            "extracted_float",
                            "extracted_bool",
                            "extracted_null",
                            "extracted_obj",
                            "extracted_arr",
                        ],
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert row.extracted_str == "str"
    assert row.extracted_int == "10"
    assert row.extracted_float == "123.45"
    assert row.extracted_bool == "false"
    assert row.extracted_null is None
    assert row.extracted_obj == '{"ext1":"val1","ext2":25}'
    assert row.extracted_arr == "[1,2,3,4,5]"


def test_json_extract_nested_and_singular(spark):
    """json_extract_test.go:48-61,86-103: nested source field, nested
    extract paths (leaf name lands at root), deprecated singular
    extract_field config."""
    line = '{"ext1":{"ext2":{"ext3":{"ext4":"test4","ext5":10},"ext7":"test7"},"ext5":"test5"},"ext2":2,"ext6":"test6"}'
    df = spark.createDataFrame([(line,)], "json_field string")
    row = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": [
                            "ext1.ext2.ext3.ext4",
                            "ext1.ext5",
                            "ext6",
                            "ext1.ext2.ext7",
                        ],
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert (row.ext4, row.ext5, row.ext6, row.ext7) == (
        "test4",
        "test5",
        "test6",
        "test7",
    )

    row2 = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_field": "ext6",
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert row2.ext6 == "test6"


def test_json_max_fields_size_nested_golden(spark):
    """decoder/json_test.go valid_max_fields_size: nested paths
    truncate, non-string values (numbers, bools, arrays) pass through
    untouched regardless of a configured size."""
    line = (
        '{"f1":"v12345","f2":{"f2_1":100,"f2_2":{"f2_2_1":true,'
        '"f2_2_2":"v123456789"},"f2_3":[1,2,3]},"f3":null}'
    )
    schema = (
        "f1 string, f2 struct<f2_1:long, f2_2:struct<f2_2_1:boolean,"
        "f2_2_2:string>, f2_3:array<long>>, f3 string"
    )
    row = _decode(
        spark,
        line,
        {
            "type": "decode",
            "field": "log",
            "decoder": "json",
            "params": {
                "schema": schema,
                "json_max_fields_size": {
                    "": 1,
                    "not_exists": 100,
                    "f2.f2_1": 1,
                    "f2.f2_2.f2_2_1": 3,
                    "f1": 5,
                    "f2.f2_2.f2_2_2": 7,
                },
            },
        },
    )
    assert row.f1 == "v1234"
    assert row.f2.f2_1 == 100          # number: size 1 ignored
    assert row.f2.f2_2.f2_2_1 is True  # bool: size 3 ignored
    assert row.f2.f2_2.f2_2_2 == "v123456"
    assert list(row.f2.f2_3) == [1, 2, 3]


def test_json_max_fields_size_nested_single(spark):
    """decoder/json_test.go valid_max_fields_size_single."""
    line = (
        '{"f1":"v12345","f2":{"f2_1":100,"f2_2":{"f2_2_1":true,'
        '"f2_2_2":"v123456789"},"f2_3":[1,2,3]},"f3":null}'
    )
    schema = (
        "f1 string, f2 struct<f2_1:long, f2_2:struct<f2_2_1:boolean,"
        "f2_2_2:string>, f2_3:array<long>>, f3 string"
    )
    row = _decode(
        spark,
        line,
        {
            "type": "decode",
            "field": "log",
            "decoder": "json",
            "params": {
                "schema": schema,
                "json_max_fields_size": {"f2.f2_2.f2_2_2": 4},
            },
        },
    )
    assert row.f1 == "v12345"
    assert row.f2.f2_2.f2_2_2 == "v123"


def test_json_max_fields_size_non_integer_rejected(spark):
    import pytest

    with pytest.raises(Exception):
        _decode(
            spark,
            '{"t":"x"}',
            {
                "type": "decode",
                "field": "log",
                "decoder": "json",
                "params": {
                    "schema": "t string",
                    "json_max_fields_size": {"t": 1.2},
                },
            },
        )


def test_json_extract_multi_nested_golden(spark):
    """json_extract_test.go extract_multi_nested."""
    line = (
        '{"ext1":{"ext2":{"ext3":{"ext4":"test4","ext5":10},"ext7":"test7"},'
        '"ext5":"test5"},"ext2":2,"ext6":"test6"}'
    )
    df = spark.createDataFrame([("value1", line)], "field1 string, json_field string")
    row = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": [
                            "ext1.ext2.ext3.ext4",
                            "ext1.ext5",
                            "ext6",
                            "ext1.ext2.ext7",
                        ],
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert row.ext4 == "test4"
    assert row.ext5 == "test5"
    assert row.ext6 == "test6"
    assert row.ext7 == "test7"


def test_json_extract_partial_json_golden(spark):
    """json_extract_test.go partial_json: a field fully present before
    the truncation is recovered; the truncated one is absent."""
    line = '{"test":"test_value","extracted1":"text","extracted2":"long text ...'
    df = spark.createDataFrame([("value1", line)], "field1 string, json_field string")
    row = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": ["extracted1", "extracted2"],
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert row.extracted1 == "text"
    assert row.extracted2 is None


def test_json_extract_duple_and_prefix_golden(spark):
    """extracted_field_duple + extract_with_prefix."""
    line = '{"test":"test_value","extracted":"text"}'
    df = spark.createDataFrame([("value1", line)], "field1 string, json_field string")
    row = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_field": "extracted",
                        "extract_fields": ["extracted"],
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert row.extracted == "text"

    line2 = '{"test":"test_value","extracted1":"text1","extracted2":"text2"}'
    df2 = spark.createDataFrame([("value1", line2)], "field1 string, json_field string")
    row2 = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": ["extracted1", "extracted2"],
                        "prefix": "ext_",
                    }
                ]
            }
        )
        .apply(df2)
        .collect()[0]
    )
    assert row2.asDict()["ext_extracted1"] == "text1"
    assert row2.asDict()["ext_extracted2"] == "text2"


def test_json_extract_partial_json_scalars(spark):
    """Truncated-JSON salvage extends to non-string scalars: numbers
    and booleans fully present before the cut are recovered in the
    same string form get_json_object yields; a literal null stays
    NULL (as the strict parse would return); the half-written number
    at the cut is NOT recovered as a corrupted value when followed by
    nothing that completes it."""
    line = '{"n":42,"f":-3.5e2,"b":true,"z":null,"cut":"oops'
    df = spark.createDataFrame([(line,)], "json_field string")
    row = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": ["n", "f", "b", "z", "cut"],
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert row.n == "42"
    assert row.f == "-3.5e2"
    assert row.b == "true"
    assert row.z is None
    assert row.cut is None

    # intact JSON still goes through the strict parser (same values)
    line2 = '{"n":42,"b":false,"z":null,"s":"ok"}'
    df2 = spark.createDataFrame([(line2,)], "json_field string")
    row2 = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": ["n", "b", "z", "s"],
                    }
                ]
            }
        )
        .apply(df2)
        .collect()[0]
    )
    assert row2.n == "42"
    assert row2.b == "false"
    assert row2.z is None
    assert row2.s == "ok"


def test_json_extract_no_salvage_of_cut_number(spark):
    """A number the truncation cut mid-digits must NOT be recovered —
    '{"n":12' might have been 123456."""
    df = spark.createDataFrame([('{"a":7,"n":12',)], "json_field string")
    row = (
        Pipeline.from_dict(
            {
                "actions": [
                    {
                        "type": "json_extract",
                        "field": "json_field",
                        "extract_fields": ["a", "n"],
                    }
                ]
            }
        )
        .apply(df)
        .collect()[0]
    )
    assert row.a == "7"   # complete (comma-delimited) -> recovered
    assert row.n is None  # cut at EOF -> not recovered
