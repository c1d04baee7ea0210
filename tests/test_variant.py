"""Schemaless (VariantType) event mode: decoder variant option, do_if
field ops and runtime check_type over variant paths — the dynamic-JSON
parity layer (reference events are schemaless; SURVEY §1.1)."""

import pytest
from pyspark.sql import functions as F

from file_d_spark import Pipeline
from file_d_spark.doif import compile_doif


@pytest.fixture(scope="module")
def vdf(spark):
    rows = [
        ('{"log":{"message":"test"},"level":"error","n":5,"arr":[1,2]}',),
        ('{"log":[{"message":"x"}],"level":"warn","n":"9"}',),
        ('{"log":"plain","level":"info"}',),
        ('{"log":123,"nope":1}',),
        ('{"log":null}',),
    ]
    df = spark.createDataFrame(rows, "raw string")
    return df.withColumn("event", F.parse_json("raw"))


def test_variant_field_op(vdf):
    pred = compile_doif(
        {"op": "equal", "field": "event.level", "values": ["error", "warn"]},
        vdf.schema,
    )
    assert vdf.filter(pred).count() == 2


def test_variant_nested_path(spark, vdf):
    pred = compile_doif(
        {"op": "prefix", "field": "event.log.message", "values": ["te"]},
        vdf.schema,
    )
    got = [r.raw for r in vdf.filter(F.coalesce(pred, F.lit(False))).collect()]
    assert len(got) == 1 and '"message":"test"' in got[0].replace(" ", "")


def test_variant_check_type(vdf):
    """Runtime type dispatch on variant values — the reference's
    check_type doc example (check_type_op.go): keep only object/array
    logs."""
    tree = {
        "op": "not",
        "operands": [
            {"op": "check_type", "field": "event.log", "values": ["obj", "arr"]}
        ],
    }
    p = Pipeline.from_dict({"actions": [{"type": "discard", "do_if": tree}]})
    out = p.apply(vdf)
    # {"log":{...}} and {"log":[...]} survive; string/number/null/absent dropped
    assert out.count() == 2


def test_variant_int_cmp(vdf):
    pred = compile_doif(
        {"op": "int_val_cmp", "field": "event.n", "cmp_op": "ge", "value": 5},
        vdf.schema,
    )
    # 5 and "9" both compare as ints (reference digs+parses)
    assert vdf.filter(pred).count() == 2


def test_variant_decoder_pipeline(spark):
    df = spark.createDataFrame([('{"a": {"b": "deep"}}',)], "value string")
    p = Pipeline.from_dict(
        {
            "settings": {"decoder": "json", "decoder_params": {"variant": True}},
            "input": {"type": "fake"},
        }
    )
    from file_d_spark.sources import _decode_lines

    decoded = _decode_lines(df, p.plan, meta_cols=[])
    row = decoded.select(
        F.try_variant_get("event", "$.a.b", "string").alias("b")
    ).collect()[0]
    assert row.b == "deep"
