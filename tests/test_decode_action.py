"""decode action: mid-pipeline decoders, keep_origin, prefix; the
json_decode map fallback (schemaless)."""

from file_d_spark import Pipeline


def test_decode_cri_keep_origin(spark):
    df = spark.createDataFrame(
        [("2024-01-01T00:00:00.0Z stderr P partial line",)], "line string"
    )
    out = Pipeline.from_dict(
        {
            "actions": [
                {"type": "decode", "decoder": "cri", "field": "line", "keep_origin": True}
            ]
        }
    ).apply(df)
    row = out.collect()[0]
    assert row.line.startswith("2024-")  # origin kept
    assert row.stream == "stderr"
    assert row.is_partial is True
    assert row.log == "partial line"


def test_decode_nginx_prefix(spark):
    df = spark.createDataFrame(
        [("2022/08/17 10:49:27 [error] 1#2: *3 boom",)], "line string"
    )
    out = Pipeline.from_dict(
        {
            "actions": [
                {"type": "decode", "decoder": "nginx_error", "field": "line", "prefix": "ngx_"}
            ]
        }
    ).apply(df)
    row = out.collect()[0]
    assert row.ngx_level == "error"
    assert row.ngx_message == "boom"
    assert "line" not in out.columns  # origin dropped by default


def test_json_decode_schemaless_map(spark):
    df = spark.createDataFrame([('{"a":"1","b":"x"}',)], "payload string")
    out = Pipeline.from_dict(
        {"actions": [{"type": "json_decode", "field": "payload"}]}
    ).apply(df)
    row = out.collect()[0]
    # schemaless: parsed map replaces the field (typed engine cannot
    # splat unknown keys)
    assert row.payload == {"a": "1", "b": "x"}


def test_decode_csv_columns(spark):
    df = spark.createDataFrame([("x;y;z",)], "line string")
    out = Pipeline.from_dict(
        {
            "actions": [
                {
                    "type": "decode",
                    "decoder": "csv",
                    "field": "line",
                    "params": {"csv_columns": ["a", "b", "c"], "csv_delimiter": ";"},
                }
            ]
        }
    ).apply(df)
    row = out.collect()[0]
    assert (row.a, row.b, row.c) == ("x", "y", "z")
