"""do_if predicate engine tests.

Golden pairs re-derived from the reference's doc examples
(/root/reference/pipeline/doif/field_op.go doc blocks,
check_type_op.go, ts_cmp_op.go) — which rows match which trees.
"""

import pytest
from pyspark.sql import functions as F

from file_d_spark.doif import compile_doif, compile_match_fields


@pytest.fixture(scope="module")
def pods(spark):
    return spark.createDataFrame(
        [
            ("test-pod-1", "test-service", None),
            ("test-pod-2", "test-service-2", "x"),
            ("test-pod", "test-service", "y"),
            ("my-test-pod", "service!", None),
            (None, "$$$", "z"),
        ],
        "pod string, service string, extra string",
    )


def matches(df, tree):
    pred = compile_doif(tree, df.schema)
    return [r.pod for r in df.filter(F.coalesce(pred, F.lit(False))).collect()]


def test_equal(pods):
    got = matches(pods, {"op": "equal", "field": "pod", "values": ["test-pod-1", "test-pod-2"]})
    assert got == ["test-pod-1", "test-pod-2"]


def test_equal_null_value(pods):
    got = matches(pods, {"op": "equal", "field": "pod", "values": [None]})
    assert got == [None]


def test_contains(pods):
    got = matches(pods, {"op": "contains", "field": "pod", "values": ["my-pod", "my-test"]})
    assert got == ["my-test-pod"]


def test_contains_any(pods):
    got = matches(pods, {"op": "contains_any", "field": "service", "values": ["!$#"]})
    assert got == ["my-test-pod", None]


def test_prefix_suffix(pods):
    assert matches(pods, {"op": "prefix", "field": "pod", "values": ["my-"]}) == ["my-test-pod"]
    assert matches(pods, {"op": "suffix", "field": "pod", "values": ["-1", "-2"]}) == [
        "test-pod-1",
        "test-pod-2",
    ]


def test_regex(pods):
    got = matches(pods, {"op": "regex", "field": "pod", "values": [r"test-pod-\d"]})
    assert got == ["test-pod-1", "test-pod-2"]


def test_case_insensitive(pods):
    got = matches(
        pods,
        {"op": "equal", "field": "pod", "values": ["TEST-POD"], "case_sensitive": False},
    )
    assert got == ["test-pod"]


def test_logical(pods):
    tree = {
        "op": "and",
        "operands": [
            {"op": "prefix", "field": "pod", "values": ["test-"]},
            {"op": "not", "operands": [{"op": "suffix", "field": "pod", "values": ["-2"]}]},
        ],
    }
    assert matches(pods, tree) == ["test-pod-1", "test-pod"]


def test_absent_field(pods):
    assert matches(pods, {"op": "equal", "field": "nope", "values": ["x"]}) == []
    # null value matches the absent field for every row
    got = matches(pods, {"op": "equal", "field": "nope", "values": [None]})
    assert len(got) == 5


def test_len_cmp(spark):
    df = spark.createDataFrame(
        [("abcde", [1, 2, 3], "7"), ("ab", [1], "100")],
        "s string, arr array<int>, n string",
    )
    t1 = {"op": "byte_len_cmp", "field": "s", "cmp_op": "ge", "value": 5}
    assert df.filter(compile_doif(t1, df.schema)).count() == 1
    t2 = {"op": "array_len_cmp", "field": "arr", "cmp_op": "eq", "value": 3}
    assert df.filter(compile_doif(t2, df.schema)).count() == 1
    t3 = {"op": "int_val_cmp", "field": "n", "cmp_op": "gt", "value": 50}
    assert df.filter(compile_doif(t3, df.schema)).count() == 1
    # typed container columns never match int_val_cmp (len_cmp_op.go:
    # 207-220) — and must not AnalysisException at plan build (ADVICE r7)
    for fld in ("arr", "o"):
        t4 = {"op": "int_val_cmp", "field": fld, "cmp_op": "ge", "value": 0}
        df2 = df.withColumn("o", F.struct(F.lit(1).alias("x")))
        assert df2.filter(compile_doif(t4, df2.schema)).count() == 0


def test_ts_cmp(spark):
    df = spark.createDataFrame(
        [("2000-01-01T00:00:00Z",), ("2011-01-01T00:00:00Z",), ("qwe",), (None,)],
        "timestamp string",
    )
    tree = {
        "op": "ts_cmp",
        "field": "timestamp",
        "cmp_op": "lt",
        "value": "2010-01-01T00:00:00Z",
        "format": "rfc3339",
    }
    pred = compile_doif(tree, df.schema)
    got = df.filter(F.coalesce(pred, F.lit(False))).collect()
    assert [r.timestamp for r in got] == ["2000-01-01T00:00:00Z"]


def test_check_type(spark):
    df = spark.createDataFrame(
        [(("a",), [1], "s", 1, None)],
        "o struct<x string>, a array<int>, s string, n long, z string",
    )
    schema = df.schema
    assert df.filter(compile_doif({"op": "check_type", "field": "o", "values": ["obj"]}, schema)).count() == 1
    assert df.filter(compile_doif({"op": "check_type", "field": "a", "values": ["arr"]}, schema)).count() == 1
    assert df.filter(compile_doif({"op": "check_type", "field": "n", "values": ["number"]}, schema)).count() == 1
    assert df.filter(compile_doif({"op": "check_type", "field": "z", "values": ["null"]}, schema)).count() == 1
    assert df.filter(compile_doif({"op": "check_type", "field": "missing", "values": ["nil"]}, schema)).count() == 1
    assert df.filter(compile_doif({"op": "check_type", "field": "s", "values": ["obj", "arr"]}, schema)).count() == 0


def test_match_fields(pods):
    pred = compile_match_fields({"pod": "/test-pod-\\d/"}, pods.schema)
    assert pods.filter(pred).count() == 2
    pred2 = compile_match_fields(
        {"pod": "test-pod", "service": "test-service"}, pods.schema, mode="and"
    )
    assert pods.filter(pred2).count() == 1
    pred3 = compile_match_fields(
        {"pod": "test-pod", "service": "test-service"},
        pods.schema,
        mode="or",
        invert=True,
    )
    assert pods.filter(F.coalesce(pred3, F.lit(False))).count() == 3
