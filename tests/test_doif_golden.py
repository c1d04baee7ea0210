"""do_if golden replay of the reference's own predicate corpus.

Every case below is transcribed from
/root/reference/pipeline/doif/do_if_test.go TestCheck (lines 550-1158)
and TestCheckLenCmpLtObject (lines 1181-1240): same trees, same event
JSON strings, same expected booleans.  Events are parsed into a single
VARIANT column (the dynamic-JSON data model the reference's insaneJSON
root corresponds to), so absent fields, type mismatches and nested
values follow the reference's runtime semantics rather than a static
schema's.
"""

import pytest
from pyspark.sql import functions as F

from file_d_spark.doif import compile_doif

# Stand-in for the Go test's runtime `timestamp`, anchored at :30 so
# second offsets stay inside the same minute.
TS = "2025-01-01T10:00:30Z"


def _ts(offset_s: int) -> str:
    return '{"ts":"2025-01-01T10:00:%02dZ"}' % (offset_s + 30)


# (name, tree, [(event_json, want)]) — trees use this repo's dict form
# of the reference YAML; field selectors are prefixed with the variant
# root column `ev` by the harness.
CASES = [
    (
        "equal",
        {"op": "equal", "field": "pod", "case_sensitive": True,
         "values": ["test-1", "test-2", "test-pod-123", "po-32"]},
        [
            ('{"pod":"test-1"}', True),
            ('{"pod":"test-2"}', True),
            ('{"pod":"test-3"}', False),
            ('{"pod":"TEST-2"}', False),
            ('{"pod":"test-pod-123"}', True),
            ('{"pod":"po-32"}', True),
            ('{"pod":"p-32"}', False),
            ('{"service":"test-1"}', False),
            ('{"pod":"test-123456789"}', False),
            ("", False),
            ('{"pod":{"key":"test-1"}}', False),
            ('{"pod":[{"key":"test-1"}]}', False),
        ],
    ),
    (
        "contains",
        {"op": "contains", "field": "pod", "case_sensitive": True,
         "values": ["test-1", "test-2"]},
        [
            ('{"pod":"my-test-1-pod"}', True),
            ('{"pod":"my-test-2-pod"}', True),
            ('{"pod":"my-test-3-pod"}', False),
            ('{"pod":"my-TEST-2-pod"}', False),
        ],
    ),
    (
        "contains_any",
        {"op": "contains_any", "field": "pod", "values": ["!#$"]},
        [
            ('{"pod":"my-test-pod!"}', True),
            ('{"pod":"#my-test-pod#"}', True),
            ('{"pod":"$$$"}', True),
            ('{"pod":"my-test-pod"}', False),
        ],
    ),
    (
        "prefix",
        {"op": "prefix", "field": "pod", "case_sensitive": True,
         "values": ["test-1", "test-2"]},
        [
            ('{"pod":"test-1-pod"}', True),
            ('{"pod":"test-2-pod"}', True),
            ('{"pod":"test-3-pod"}', False),
            ('{"pod":"TEST-2-pod"}', False),
        ],
    ),
    (
        "suffix",
        {"op": "suffix", "field": "pod", "case_sensitive": True,
         "values": ["test-1", "test-2"]},
        [
            ('{"pod":"my-test-1"}', True),
            ('{"pod":"my-test-2"}', True),
            ('{"pod":"my-test-3"}', False),
            ('{"pod":"my-TEST-2"}', False),
        ],
    ),
    (
        "regex",
        {"op": "regex", "field": "pod", "values": [r"test-\d"]},
        [
            ('{"pod":"my-test-1-pod"}', True),
            ('{"pod":"my-test-2-pod"}', True),
            ('{"pod":"my-test-3-pod"}', True),
            ('{"pod":"my-test-pod"}', False),
            ('{"pod":"my-pod-3-pod"}', False),
            ('{"pod":"my-TEST-4-pod"}', False),
        ],
    ),
    (
        "or",
        {"op": "or", "operands": [
            {"op": "equal", "field": "pod", "case_sensitive": True,
             "values": ["test-1", "test-2"]},
            {"op": "equal", "field": "pod", "case_sensitive": True,
             "values": ["test-3", "test-4"]},
        ]},
        [
            ('{"pod":"test-1"}', True),
            ('{"pod":"test-2"}', True),
            ('{"pod":"test-3"}', True),
            ('{"pod":"test-4"}', True),
            ('{"pod":"test-5"}', False),
            ('{"pod":"TEST-1"}', False),
            ('{"pod":"TEST-3"}', False),
        ],
    ),
    (
        "and",
        {"op": "and", "operands": [
            {"op": "prefix", "field": "pod", "case_sensitive": True,
             "values": ["test"]},
            {"op": "suffix", "field": "pod", "case_sensitive": True,
             "values": ["pod"]},
        ]},
        [
            ('{"pod":"test-1-pod"}', True),
            ('{"pod":"test-2-pod"}', True),
            ('{"pod":"test-1-service"}', False),
            ('{"pod":"my-test-pod"}', False),
        ],
    ),
    (
        "not",
        {"op": "not", "operands": [
            {"op": "equal", "field": "pod", "case_sensitive": True,
             "values": ["test-1", "test-2"]},
        ]},
        [
            ('{"pod":"test-1"}', False),
            ('{"pod":"test-2"}', False),
            ('{"pod":"TEST-2"}', True),
            ('{"pod":"test-3"}', True),
            ('{"pod":"test-4"}', True),
        ],
    ),
    (
        "equal_case_insensitive",
        {"op": "equal", "field": "pod", "case_sensitive": False,
         "values": ["Test-1", "tesT-2"]},
        [
            ('{"pod":"tEST-1"}', True),
            ('{"pod":"test-2"}', True),
            ('{"pod":"test-3"}', False),
            ('{"pod":"TEST-2"}', True),
        ],
    ),
    (
        "contains_case_insensitive",
        {"op": "contains", "field": "pod", "case_sensitive": False,
         "values": ["Test-1", "tesT-2"]},
        [
            ('{"pod":"my-tEST-1-pod"}', True),
            ('{"pod":"my-test-2-pod"}', True),
            ('{"pod":"my-test-3-pod"}', False),
            ('{"pod":"my-TEST-2-pod"}', True),
        ],
    ),
    (
        "prefix_case_insensitive",
        {"op": "prefix", "field": "pod", "case_sensitive": False,
         "values": ["Test-1", "tesT-2"]},
        [
            ('{"pod":"tEST-1-pod"}', True),
            ('{"pod":"test-2-pod"}', True),
            ('{"pod":"test-3-pod"}', False),
            ('{"pod":"TEST-2-pod"}', True),
        ],
    ),
    (
        "suffix_case_insensitive",
        {"op": "suffix", "field": "pod", "case_sensitive": False,
         "values": ["Test-1", "tesT-2"]},
        [
            ('{"pod":"my-teST-1"}', True),
            ('{"pod":"my-test-2"}', True),
            ('{"pod":"my-test-3"}', False),
            ('{"pod":"my-TEST-2"}', True),
        ],
    ),
    (
        "equal_nil_or_empty_string",
        {"op": "equal", "field": "test-field", "case_sensitive": False,
         "values": [None, ""]},
        [
            ('{"pod":"my-teST-1"}', True),
            ('{"pod":"my-test-2","test-field":null}', True),
            ('{"pod":"my-test-3","test-field":""}', True),
            ('{"pod":"my-TEST-2","test-field":"non-empty"}', False),
            ('{"pod":"my-TEST-2","test-field":{"key":"non-empty"}}', False),
            ('{"pod":"my-TEST-2","test-field":[{"key":"non-empty"}]}', False),
        ],
    ),
    (
        "byte_len_cmp_lt",
        {"op": "byte_len_cmp", "field": "msg", "cmp_op": "lt", "value": 4},
        [
            ('{"msg":""}', True),
            ('{"msg":1}', True),
            ('{"msg":12}', True),
            ('{"msg":123}', True),
            ('{"msg":1234}', False),
            ('{"msg":12345}', False),
            ('{"msg":123456}', False),
        ],
    ),
    (
        "byte_len_cmp_ge",
        {"op": "byte_len_cmp", "field": "msg", "cmp_op": "ge", "value": 4},
        [
            ('{"msg":""}', False),
            ('{"msg":1}', False),
            ('{"msg":12}', False),
            ('{"msg":123}', False),
            ('{"msg":1234}', True),
            ('{"msg":12345}', True),
            ('{"msg":123456}', True),
        ],
    ),
    (
        "byte_len_cmp_lt_empty_selector",
        {"op": "byte_len_cmp", "field": "", "cmp_op": "lt", "value": 4},
        [
            ('""', True),
            ("1", True),
            ("12", True),
            ("123", True),
            ("1234", False),
            ("12345", False),
            ("123456", False),
        ],
    ),
    (
        "byte_len_cmp_eq",
        {"op": "byte_len_cmp", "field": "msg", "cmp_op": "eq", "value": 2},
        [('{"msg":1}', False), ('{"msg":12}', True), ('{"msg":123}', False)],
    ),
    (
        "byte_len_cmp_ne",
        {"op": "byte_len_cmp", "field": "msg", "cmp_op": "ne", "value": 2},
        [('{"msg":1}', True), ('{"msg":12}', False), ('{"msg":123}', True)],
    ),
    (
        "array_len_cmp_lt",
        {"op": "array_len_cmp", "field": "numbers", "cmp_op": "lt", "value": 2},
        [
            ('{"numbers":[]}', True),
            ('{"numbers":[1]}', True),
            ('{"numbers":[1, 2]}', False),
            ('{"numbers":[1, 2, 3]}', False),
        ],
    ),
    (
        "array_len_cmp_ge",
        {"op": "array_len_cmp", "field": "numbers", "cmp_op": "ge", "value": 2},
        [
            ('{"numbers":[]}', False),
            ('{"numbers":[1]}', False),
            ('{"numbers":[1, 2]}', True),
            ('{"numbers":[1, 2, 3]}', True),
        ],
    ),
    (
        "array_len_cmp_lt_empty_selector",
        {"op": "array_len_cmp", "field": "", "cmp_op": "lt", "value": 2},
        [
            ("[]", True),
            ("[1]", True),
            ("[1, 2]", False),
            ("[1, 2, 3]", False),
        ],
    ),
    (
        "array_len_cmp_eq",
        {"op": "array_len_cmp", "field": "numbers", "cmp_op": "eq", "value": 2},
        [
            ('{"numbers":[1]}', False),
            ('{"numbers":[1, 2]}', True),
            ('{"numbers":[1, 2, 3]}', False),
        ],
    ),
    (
        "array_len_cmp_ne",
        {"op": "array_len_cmp", "field": "numbers", "cmp_op": "ne", "value": 2},
        [
            ('{"numbers":[1]}', True),
            ('{"numbers":[1, 2]}', False),
            ('{"numbers":[1, 2, 3]}', True),
        ],
    ),
    (
        "array_len_cmp_field_not_found",
        {"op": "array_len_cmp", "field": "some", "cmp_op": "lt", "value": 100},
        [('{"msg":"qwerty"}', False), ("[1, 2, 3]", False)],
    ),
    (
        "array_len_cmp_field_is_not_array",
        {"op": "array_len_cmp", "field": "items", "cmp_op": "lt", "value": 100},
        [
            ('{"items":123}', False),
            ('{"items":"abc"}', False),
            ('{"items":null}', False),
            ('{"items":{}}', False),
            ('{"items":[]}', True),
        ],
    ),
    (
        "int_val_cmp_ok",
        {"op": "int_val_cmp", "field": "count", "cmp_op": "ge", "value": 50},
        [('{"count":50}', True), ('{"count":51}', True), ('{"count":49}', False)],
    ),
    (
        "int_val_cmp_not_int",
        {"op": "int_val_cmp", "field": "count", "cmp_op": "ge", "value": 0},
        [
            ('{"count":"0"}', True),
            ('{"count":"n"}', False),
            ('{"count":[0]}', False),
            ('{"not_count":0}', False),
        ],
    ),
    (
        "ts_cmp_lt",
        {"op": "ts_cmp", "field": "ts", "cmp_op": "lt", "format": "rfc3339",
         "value": TS},
        [
            (_ts(-2), True),
            (_ts(-1), True),
            (_ts(0), False),
            (_ts(1), False),
            (_ts(2), False),
        ],
    ),
    (
        "ts_cmp_lt_value_shifted",
        {"op": "ts_cmp", "field": "ts", "cmp_op": "lt", "format": "rfc3339",
         "value": TS, "value_shift": 1_000_000_000},
        [
            (_ts(-2), True),
            (_ts(-1), True),
            (_ts(0), True),
            (_ts(1), False),
            (_ts(2), False),
        ],
    ),
    (
        "ts_cmp_ge",
        {"op": "ts_cmp", "field": "ts", "cmp_op": "ge", "format": "rfc3339",
         "value": TS},
        [
            (_ts(-2), False),
            (_ts(-1), False),
            (_ts(0), True),
            (_ts(1), True),
            (_ts(2), True),
        ],
    ),
    (
        "ts_cmp_eq",
        {"op": "ts_cmp", "field": "ts", "cmp_op": "eq", "format": "rfc3339",
         "value": TS},
        [(_ts(-1), False), (_ts(0), True), (_ts(1), False)],
    ),
    (
        "ts_cmp_eq_unixtime",
        {"op": "ts_cmp", "field": "ts", "cmp_op": "eq", "format": "unixtime",
         "value": "2024-12-31T21:00:00Z"},  # == time.Unix(1735678800, 0) UTC
        [
            ('{"ts":"1735678799"}', False),
            ('{"ts":"1735678800"}', True),
            ('{"ts":"1735678801"}', False),
        ],
    ),
    (
        "ts_cmp_ne",
        {"op": "ts_cmp", "field": "ts", "cmp_op": "ne", "format": "rfc3339",
         "value": TS},
        [(_ts(-1), True), (_ts(0), False), (_ts(1), True)],
    ),
]

def _prefix_tree(tree: dict) -> dict:
    out = dict(tree)
    if "operands" in out:
        out["operands"] = [_prefix_tree(t) for t in out["operands"]]
    if "field" in out:
        out["field"] = "ev." + out["field"] if out["field"] else "ev"
    return out


@pytest.mark.parametrize("name,tree,data", CASES, ids=[c[0] for c in CASES])
def test_doif_reference_corpus(spark, name, tree, data):
    df = spark.createDataFrame([(e,) for e, _ in data], "raw string")
    df = df.withColumn("ev", F.try_parse_json("raw"))
    pred = compile_doif(_prefix_tree(tree), df.schema)
    rows = df.select("raw", F.coalesce(pred, F.lit(False)).alias("got")).collect()
    got = {r.raw: r.got for r in rows}
    for event, want in data:
        assert got[event] is want, f"{name}: event {event!r}"


def test_byte_len_cmp_object(spark):
    """TestCheckLenCmpLtObject (do_if_test.go:1181-1240): byte length of
    an object node == its compact-JSON byte size (here 73), both through
    a field selector and through the empty (root) selector."""
    user_info = (
        '{"name":"jack","age":120,"hobbies":["football","diving"],'
        '"obj":{"a":"b"}}'
    )
    dry_len = len(user_info)  # 73, like len(userInfoDryJSON)
    wrapped = '{"user_info": %s}' % user_info

    df = spark.createDataFrame([(wrapped,)], "raw string").withColumn(
        "ev", F.try_parse_json("raw")
    )
    root_df = spark.createDataFrame([(user_info,)], "raw string").withColumn(
        "ev", F.try_parse_json("raw")
    )
    for cmp_value, want in [
        (dry_len - 1, False),
        (dry_len, False),
        (dry_len + 1, True),
        (dry_len + 2, True),
    ]:
        tree = {"op": "byte_len_cmp", "field": "ev.user_info",
                "cmp_op": "lt", "value": cmp_value}
        pred = compile_doif(tree, df.schema)
        assert df.select(F.coalesce(pred, F.lit(False)).alias("g")).head().g is want

        root_tree = {"op": "byte_len_cmp", "field": "ev",
                     "cmp_op": "lt", "value": cmp_value}
        pred = compile_doif(root_tree, root_df.schema)
        assert (
            root_df.select(F.coalesce(pred, F.lit(False)).alias("g")).head().g
            is want
        )


def test_byte_len_cmp_static_struct(spark):
    """Static (non-variant) struct and array columns also measure
    compact-JSON bytes, matching getNodeBytesSize."""
    df = spark.createDataFrame(
        [(("b",), [1, 2, 3])], "obj struct<a string>, nums array<int>"
    )
    # {"a":"b"} -> 9 bytes; [1,2,3] -> 7 bytes
    for field, n, want_true in [("obj", 9, True), ("obj", 8, False),
                                ("nums", 7, True), ("nums", 6, False)]:
        tree = {"op": "byte_len_cmp", "field": field, "cmp_op": "eq", "value": n}
        pred = compile_doif(tree, df.schema)
        got = df.select(F.coalesce(pred, F.lit(False)).alias("g")).head().g
        assert got is want_true, (field, n)


def test_ts_cmp_bad_constant_rejected(spark):
    """The reference errors at tree-build time on an unparseable ts_cmp
    constant (ts_cmp_op.go ctor); a NULL literal would silently leak
    three-valued logic through `not`."""
    df = spark.createDataFrame([("2024-01-01T00:00:00Z",)], "ts string")
    with pytest.raises(ValueError, match="unparseable constant"):
        compile_doif(
            {"op": "ts_cmp", "field": "ts", "cmp_op": "lt",
             "format": "rfc3339", "value": "not a time"},
            df.schema,
        )


def test_check_type_doc_example(spark):
    """check_type doc example (check_type_op.go doc block): discard
    NOT(check_type(log, [obj, arr]))."""
    events = [
        ('{"log":{"message":"test"}}', True),    # kept (not discarded)
        ('{"log":[{"message":"test"}]}', True),
        ('{"log":"test"}', False),
        ('{"log":123}', False),
        ('{"log":null}', False),
        ('{"not_log":{"test":"test"}}', False),
    ]
    df = spark.createDataFrame([(e,) for e, _ in events], "raw string")
    df = df.withColumn("ev", F.try_parse_json("raw"))
    discard = compile_doif(
        {"op": "not", "operands": [
            {"op": "check_type", "field": "ev.log", "values": ["obj", "arr"]}]},
        df.schema,
    )
    kept = {r.raw for r in df.filter(~F.coalesce(discard, F.lit(False))).collect()}
    for e, want_kept in events:
        assert (e in kept) is want_kept, e
