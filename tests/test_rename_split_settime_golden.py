"""Golden pairs replaying the reference's rename, flatten, split, and
set_time action tests:

  /root/reference/plugin/action/rename/rename_test.go (TestRename,
  TestRenamingSequence, TestUnescapeMap)
  /root/reference/plugin/action/flatten/flatten_test.go (TestFlatten)
  /root/reference/plugin/action/split/split_test.go (TestPlugin_Do,
  TestPlugin_DoArray)
  /root/reference/plugin/action/set_time/set_time_test.go (TestPlugin_Do)

Typed-engine divergences (documented in the action docstrings): an
emptied parent struct is dropped rather than kept as ``{}``; with
``override: false`` a kept value surfaces through the string-typed
column; rfc3339 renders in the pinned UTC session zone (same instant,
normalized offset).
"""

from datetime import datetime, timezone

from pyspark.sql import types as T

from tests.test_actions import run_actions

# the reference's injected clock: 2006-01-02T15:04:05+07:00
NOW = "2006-01-02T15:04:05+07:00"
NOW_DT = datetime.fromisoformat("2006-01-02T15:04:05+07:00")
NOW_UNIX = int(NOW_DT.timestamp())

RENAME_CFG = {
    "field_1": "renamed_field_1",
    "field_2": "renamed_field_2",
    "field_4.field_5": "renamed_field_5",
    "field_5": "renamed_field_2",
    "k8s_node_label_topology\\.kubernetes\\.io/zone": "renamed_field.escaped",
    "override": "false",
}


def _rename(spark, rows, schema):
    return run_actions(
        spark, rows, schema, [{"type": "rename", **RENAME_CFG}]
    ).collect()[0]


def test_rename_simple(spark):
    r = _rename(spark, [("value_1",)], "field_1 string")
    assert r.asDict() == {"renamed_field_1": "value_1"}
    r = _rename(spark, [("value_2",)], "field_2 string")
    assert r.asDict() == {"renamed_field_2": "value_2"}


def test_rename_untouched_field_passes(spark):
    r = _rename(spark, [("value_3",)], "field_3 string")
    assert r.asDict() == {"field_3": "value_3"}


def test_rename_nested_moves_to_root(spark):
    # reference keeps {"field_4":{}}; typed structs can't be empty so
    # the emptied parent is dropped — the moved leaf is what matters
    r = _rename(
        spark, [(("value_5",),)], "field_4 struct<field_5 string>"
    )
    d = r.asDict()
    assert d["renamed_field_5"] == "value_5"
    assert d.get("field_4") in (None, {})


def test_rename_escaped_dots_key(spark):
    schema = T.StructType(
        [T.StructField("k8s_node_label_topology.kubernetes.io/zone", T.StringType())]
    )
    r = _rename(spark, [("value_6",)], schema)
    assert r.asDict() == {"renamed_field.escaped": "value_6"}


def test_rename_sequence_cascades(spark):
    # TestRenamingSequence: pairs apply in config order over the same
    # event, so key1's value cascades all the way to key8
    cfg = {f"key{i}": f"key{i + 1}" for i in range(1, 8)}
    r = run_actions(
        spark, [("value_1",)], "key1 string", [{"type": "rename", **cfg}]
    ).collect()[0]
    assert r.asDict() == {"key8": "value_1"}


def test_rename_underscore_escape(spark):
    # TestUnescapeMap: exactly one leading underscore is stripped
    r = run_actions(
        spark,
        [("a", "b")],
        "`_key` string, key2 string",
        [{"type": "rename", "__key": "plain"}],
    ).collect()[0]
    assert r.asDict() == {"plain": "a", "key2": "b"}


def test_flatten_golden(spark):
    r = run_actions(
        spark,
        [(("b", "d"),)],
        "complex struct<a string, c string>",
        [{"type": "flatten", "field": "complex", "prefix": "flat_"}],
    ).collect()[0]
    assert r.asDict() == {"flat_a": "b", "flat_c": "d"}


def test_split_golden(spark):
    rows = [
        ([("go",), ("rust",), ("c++",)],),
        ([("python",), ("ruby",), ("js",)],),
    ]
    out = run_actions(
        spark,
        rows,
        "data array<struct<message string>>",
        [{"type": "split", "field": "data"}],
    )
    got = [r.message for r in out.collect()]
    assert sorted(got) == sorted(["go", "rust", "c++", "python", "ruby", "js"])


def _set_time(spark, rows, schema, **cfg):
    return run_actions(
        spark, rows, schema, [{"type": "set_time", "now": NOW, **cfg}]
    ).collect()[0]


def test_set_time_unix(spark):
    r = _set_time(spark, [("x",)], "message string", format="unixtime", field="time")
    assert r.time == NOW_UNIX


def test_set_time_unix_nano_legacy_alias(spark):
    r = _set_time(
        spark, [("x",)], "message string", format="timestampnano", field="time"
    )
    assert r.time == NOW_UNIX * 1_000_000_000


def test_set_time_custom_go_layout(spark):
    r = _set_time(
        spark, [("x",)], "message string", format="2006-01-02", field="my-time"
    )
    assert r["my-time"] == "2006-01-02"


def test_set_time_rfc3339(spark):
    r = _set_time(spark, [("x",)], "message string", format="rfc3339", field="myTime")
    # same instant as "2006-01-02T15:04:05+07:00", UTC-rendered
    want = datetime.fromtimestamp(NOW_UNIX, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    assert r.myTime == want


def test_set_time_override_false_keeps_value(spark):
    r = _set_time(
        spark, [(123,)], "time long",
        format="rfc3339", field="time", override=False,
    )
    assert r.time == "123"  # typed column; value preserved as string


def test_set_time_override_true_replaces(spark):
    r = _set_time(
        spark, [(123,)], "time long",
        format="unixtime", field="time", override=True,
    )
    assert r.time == NOW_UNIX


def test_set_time_dots_field_is_literal_root_name(spark):
    # set_time.go:72 digs ONE segment: "a.b.c" is a root field name
    r = _set_time(
        spark,
        [((("v",),),)],
        "a struct<b struct<c string>>",
        format="timestampmilli",
        field="a.b.c",
        override=True,
    )
    d = r.asDict(recursive=True)
    assert d["a"] == {"b": {"c": "v"}}  # nested path untouched
    assert d["a.b.c"] == NOW_UNIX * 1000


def test_json_decode_prefix_golden(spark):
    # json_decode_test.go TestDecode: {"log":"{\"field2\":...}"} with
    # prefix "prefix." -> {"prefix.field2":"value2","prefix.field3":
    # "value3"}, source field removed (schema'd splat path)
    r = run_actions(
        spark,
        [('{"field2":"value2","field3":"value3"}',)],
        "log string",
        [{
            "type": "json_decode", "field": "log", "prefix": "prefix.",
            "schema": "field2 string, field3 string",
        }],
    ).collect()[0]
    assert r.asDict() == {"prefix.field2": "value2", "prefix.field3": "value3"}


def test_json_decode_prefix_schemaless_map_keys(spark):
    # schemaless path: typed engines can't splat unknown keys to root —
    # the parsed map replaces the field, with the prefix on its KEYS
    r = run_actions(
        spark,
        [('{"field2":"value2"}',)],
        "log string",
        [{"type": "json_decode", "field": "log", "prefix": "prefix."}],
    ).collect()[0]
    assert r.log == {"prefix.field2": "value2"}
