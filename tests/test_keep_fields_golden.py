"""Golden pairs for keep_fields, mirroring
/root/reference/plugin/action/keep_fields/keep_fields_test.go.
Typed-engine divergence: an event keeping nothing becomes a null
placeholder row (Spark cannot express an empty struct / column-less
row), where the reference emits ``{}``."""

from tests.test_actions import run_actions


def keep(spark, rows, schema, fields):
    return run_actions(
        spark, rows, schema, [{"type": "keep_fields", "fields": fields}]
    )


def test_keep_fields_flat(spark):
    out = keep(
        spark,
        [("value_1", None), (None, "value_2")],
        "field_1 string, field_2 string",
        ["field_1", "field_2"],
    )
    rows = [r.asDict() for r in out.collect()]
    assert rows == [
        {"field_1": "value_1", "field_2": None},
        {"field_1": None, "field_2": "value_2"},
    ]


def test_keep_nested_fields(spark):
    """keep a.b.c, a.b.d, a.d, f over {"a":{"b":{"c":1,"d":1}},"d":1}
    → {"a":{"b":{"c":1,"d":1}}}."""
    out = keep(
        spark,
        [(((1, 1), None), 1)],
        "a struct<b:struct<c:long,d:long>, d:long>, d long",
        ["a.b.c", "a.b.d", "a.d", "f"],
    )
    r = out.collect()[0]
    d = r.asDict(recursive=True)
    assert d == {"a": {"b": {"c": 1, "d": 1}, "d": None}}


def test_keep_nested_through_array_drops(spark):
    """{"a":{"b":[1,2],"d":1}} with keep a.b.c/a.b.d/a.d/f: paths into
    the array don't resolve, so b is dropped → {"a":{"d":1}}."""
    out = keep(
        spark,
        [(([1, 2], 1),)],
        "a struct<b:array<long>, d:long>",
        ["a.b.c", "a.b.d", "a.d", "f"],
    )
    assert out.collect()[0].asDict(recursive=True) == {"a": {"d": 1}}


def test_keep_fields_subsumption_any_order(spark):
    """keep_fields_test.go TestRemoveNestedFieldsInConfig: ["a.b",
    "a.c","a"] keeps the whole of a — and order must not matter."""
    schema = "a struct<d:long>"
    rows = [((123,),)]
    for fields in (["a.b", "a.c", "a"], ["a", "a.b", "a.c"]):
        out = keep(spark, rows, schema, fields)
        assert out.collect()[0].asDict(recursive=True) == {"a": {"d": 123}}, fields


def test_keep_fields_all_saved_identity(spark):
    """TestKeepNestedFieldsAllSaved: listing every (existing or not)
    field is the identity projection."""
    schema = (
        "level11 string, level12 string, level13 long, level14 boolean, "
        "some11 struct<k1:string,k2:string,k3:string>, "
        "some12 struct<k1:string,k2:string,k3:string>, "
        "some13 struct<k1:string,k2:string,k3:string>, "
        "some14 struct<k1:string,k2:string,k3:string>, "
        "qwe31 struct<k1:string,k2:string,k3:struct<k1:string,k2:string,k3:string>>, "
        "qwe32 struct<k1:string,k2:string,k3:struct<k1:string,k2:string,k3:string>>"
    )
    kv = ("v1", "v2", "v3")
    row = (
        "qwerty", "some", 123, True,
        kv, kv, kv, kv,
        ("v1", "v2", kv), ("v1", "v2", kv),
    )
    fields = [
        "level11", "level12", "level13", "level14",
        "level15", "level16", "level17", "level18",
        "some11.k1", "some11.k2", "some11.k3",
        "some12",
        "some13.k1", "some13.k2", "some13.k3",
        "some14.k1", "some14.k2", "some14.k3",
        "some14.k4", "some14.k5", "some14.k6",
        "qwe31.k1", "qwe31.k2", "qwe31.k3.k1", "qwe31.k3.k2", "qwe31.k3.k3",
        "qwe32.k1", "qwe32.k2", "qwe32.k3",
    ]
    df_in = spark.createDataFrame([row], schema)
    out = keep(spark, [row], schema, fields)
    assert out.collect()[0].asDict(recursive=True) == df_in.collect()[0].asDict(
        recursive=True
    )
