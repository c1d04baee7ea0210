from pyspark.sql import functions as F

from file_d_spark.fields import (
    drop_field,
    parse_selector,
    rename_field,
    set_field,
)


def test_parse_selector_basic():
    assert parse_selector("a.b.c") == ["a", "b", "c"]
    assert parse_selector(r"exception\.type") == ["exception.type"]
    assert parse_selector(r"a.b\.c.d") == ["a", "b.c", "d"]
    assert parse_selector("") == []


def test_set_field_nested(spark):
    df = spark.createDataFrame([(1, ("x", 2))], "id int, s struct<a string, b int>")
    out = set_field(df, ["s", "c"], F.lit("new"))
    row = out.collect()[0]
    assert row.s.a == "x" and row.s.c == "new"
    # create a brand-new nested path
    out2 = set_field(df, ["meta", "k8s", "pod"], F.lit("p1"))
    assert out2.collect()[0].meta.k8s.pod == "p1"


def test_drop_and_rename(spark):
    df = spark.createDataFrame([(1, ("x", 2))], "id int, s struct<a string, b int>")
    out = drop_field(df, ["s", "a"])
    assert out.schema["s"].dataType.fieldNames() == ["b"]
    out2 = rename_field(df, ["s", "a"], ["top"], override=True)
    row = out2.collect()[0]
    assert row.top == "x"
    assert out2.schema["s"].dataType.fieldNames() == ["b"]
    # override=False keeps existing target
    out3 = rename_field(df, ["s", "a"], ["id"], override=False)
    assert out3.collect()[0].id == 1
    # missing source is a no-op
    out4 = rename_field(df, ["nope"], ["x"])
    assert out4.columns == df.columns
