"""Golden replay of the reference meta-templater test corpus
(/root/reference/pipeline/metadata/templater_test.go::TestTemplaterRender).

Each case's ``data`` map becomes a one-row DataFrame (keys as columns)
and the rendered template fields are compared.  The "No value" case's
Go template-execution *error strings* are not reproduced — those
fields render null here (documented divergence in
sources/templater.py); the case still checks that the present
references resolve and absent single-value fields are omitted.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from file_d_spark.sources import apply_meta_templates


def render(spark, templates, df):
    out = apply_meta_templates(df, templates)
    row = out.collect()[0]
    return {k: row[k] for k in out.columns if k in templates}


def test_single_value(spark):
    df = spark.createDataFrame([("topic",)], "topic string")
    assert render(spark, {"topic2": "{{ .topic }}"}, df) == {"topic2": "topic"}


def test_template_value(spark):
    df = spark.createDataFrame([("topic",)], "topic string")
    assert render(spark, {"out": "topic_{{ .topic }}"}, df) == {"out": "topic_topic"}


def test_reuse_value(spark):
    df = spark.createDataFrame([("topic",)], "topic string")
    got = render(
        spark, {"topic1": "{{ .topic }}", "topic2": "{{ .topic1 }}"}, df
    )
    assert got == {"topic1": "topic", "topic2": "topic"}


def test_default_with_present_value(spark):
    df = spark.createDataFrame([("topic",)], "topic string")
    got = render(
        spark, {"out": '{{ .topic  | default "default_topic" }}'}, df
    )
    assert got == {"out": "topic"}


def test_hold_values_chain(spark):
    df = spark.createDataFrame([("topic", 1)], "topic string, partition int")
    got = render(
        spark,
        {
            "partition_name": "partition_{{ .partition }}",
            "partition_fullname": "partition {{ .partition_name }}, topic: {{ .topic }}",
            "partition_fullname2": "{{ .partition_fullname }}",
        },
        df,
    )
    assert got == {
        "partition_name": "partition_1",
        "partition_fullname": "partition partition_1, topic: topic",
        "partition_fullname2": "partition partition_1, topic: topic",
    }


def test_default_values_corpus(spark):
    """The 'Default values' case: empty headers map falls back to the
    literal default / to another rendered field; if/else renders the
    anonymous branch on nil auth."""
    df = spark.createDataFrame(
        [({}, "kafka1:9093", None)],
        "headers map<string,string>, broker string, auth string",
    )
    got = render(
        spark,
        {
            "broker_header_default": '{{ index .headers "key" | default "localhost:9093" }}',
            "broker_name": "{{ .broker }}",
            "broker_fullname": "{{ .broker_name }}",
            "broker_header": '{{ index .headers "key" | default .broker_fullname }}',
            "user": '{{ if .auth }}{{ .auth | default "anonymous" }}'
                    '{{ else }}{{ "anonymous" }}{{ end }}',
        },
        df,
    )
    assert got == {
        "broker_header_default": "localhost:9093",
        "broker_name": "kafka1:9093",
        "broker_fullname": "kafka1:9093",
        "broker_header": "kafka1:9093",
        "user": "anonymous",
    }


def test_if_truthy_branch(spark):
    df = spark.createDataFrame([("alice",)], "auth string")
    got = render(
        spark,
        {"user": '{{ if .auth }}{{ .auth }}{{ else }}{{ "anonymous" }}{{ end }}'},
        df,
    )
    assert got == {"user": "alice"}


def test_nested_fields_corpus(spark):
    """'Nested fields': array element under a struct, held value."""
    df = spark.createDataFrame([(1,)], "x int").select(
        F.struct(F.array(F.lit("kafka1:9093")).alias("broker")).alias("headers")
    )
    got = render(
        spark,
        {
            "broker_header": "{{ index .headers.broker 0 }}",
            "broker": "{{ .broker_header }}",
        },
        df,
    )
    assert got == {"broker_header": "kafka1:9093", "broker": "kafka1:9093"}


def test_absent_single_value_omitted(spark):
    """'No value': {{ .header }} with no source and no template named
    header -> the field is omitted entirely (reference logs & skips)."""
    df = spark.createDataFrame([("x",)], "topic string")
    out = apply_meta_templates(df, {"header2": "{{ .header }}"})
    assert "header2" not in out.columns


def test_meta_prefixed_columns_still_resolve(spark):
    """Source meta columns use the _name convention (kafka wire frame:
    _topic/_partition/_offset)."""
    df = spark.createDataFrame([("t1", 3)], "_topic string, _partition int")
    got = render(
        spark, {"route": "{{ .topic }}/{{ .partition }}"}, df
    )
    assert got == {"route": "t1/3"}


def test_index_int_on_map_renders_null(spark):
    """Go errors on an int index into a map; we render null (the
    reference stores the error STRING — divergence documented)."""
    df = spark.createDataFrame([({},)], "headers map<string,string>")
    out = apply_meta_templates(df, {"h": "x{{ index .headers 0 }}"})
    assert out.collect()[0]["h"] == "x"
