"""ClickHouse native type coercion tests
(/root/reference/plugin/output/clickhouse/clickhouse.go:213-252)."""

import pytest
from pyspark.sql import functions as F

from file_d_spark.sinks.clickhouse_types import (
    ch_type_to_expr,
    coerce_clickhouse,
    parse_enum_domain,
)


def one(spark, value, ch_type, strict=False, value_type="string"):
    df = spark.createDataFrame([(value,)], f"v {value_type}")
    return df.select(
        ch_type_to_expr(F.col("v"), ch_type, strict).alias("out")
    ).collect()[0].out


def test_enum_domain_parse():
    assert parse_enum_domain("'a' = 1, 'b' = 2") == {"a": "1", "b": "2"}
    assert parse_enum_domain("'with space'=-3") == {"with space": "-3"}


def test_integers_non_strict(spark):
    assert one(spark, "42", "Int32") == 42
    assert one(spark, "7.9", "Int64") == 7  # floors like AsInt
    assert one(spark, "nope", "Int16") is None
    assert one(spark, "300", "UInt8") == 300  # widened to short
    assert one(spark, "42", "UInt64") == 42


def test_integers_strict_raises(spark):
    with pytest.raises(Exception):
        one(spark, "nope", "Int32", strict=True)


def test_enum8(spark):
    t = "Enum8('red' = 1, 'green' = 2)"
    assert one(spark, "red", t) == "red"
    assert one(spark, "2", t) == "green"  # numeric id -> name
    assert one(spark, "blue", t) is None  # out of domain
    with pytest.raises(Exception):
        one(spark, "blue", t, strict=True)


def test_ipv4(spark):
    assert one(spark, "10.20.30.40", "IPv4") == "10.20.30.40"
    # uint32 form: 10*2^24 + 20*2^16 + 30*2^8 + 40
    assert one(spark, str((10 << 24) + (20 << 16) + (30 << 8) + 40), "IPv4") == "10.20.30.40"
    assert one(spark, "999.1.1.1", "IPv4") is None
    with pytest.raises(Exception):
        one(spark, "not-an-ip", "IPv4", strict=True)


def test_ipv6(spark):
    assert one(spark, "2001:db8::1", "IPv6") == "2001:db8::1"
    assert one(spark, "::ffff:192.0.2.1", "IPv6") == "::ffff:192.0.2.1"
    assert one(spark, "10.0.0.1", "IPv6") is None


def test_datetime_variants(spark):
    ts = one(spark, "2024-03-01T12:00:00Z", "DateTime")
    assert ts is not None and ts.year == 2024
    unix = one(spark, "1709294400", "DateTime")  # 2024-03-01T12:00:00Z
    assert unix == ts
    ms = one(spark, "1709294400000", "DateTime64(3)")
    assert ms == ts
    us = one(spark, "1709294400000000", "DateTime64(6)")
    assert us == ts
    ns = one(spark, "1709294400000000000", "DateTime64(9)")
    assert ns == ts


def test_lowcardinality_nullable_unwrap(spark):
    assert one(spark, "x", "LowCardinality(String)") == "x"
    assert one(spark, "5", "Nullable(Int32)") == 5
    assert one(spark, "y", "Nullable(LowCardinality(String))") == "y"


def test_bool_non_strict(spark):
    assert one(spark, "1", "Bool") is True
    assert one(spark, "false", "Bool") is False
    assert one(spark, "maybe", "Bool") is None


def test_string_encodes_complex_non_strict(spark):
    df = spark.createDataFrame([([1, 2],)], "v array<int>")
    out = df.select(
        ch_type_to_expr(F.col("v"), "String", False).alias("out")
    ).collect()[0].out
    assert "1" in out and "2" in out  # JSON-encoded


def test_coerce_clickhouse_projection(spark):
    df = spark.createDataFrame(
        [("1", "red", "10.0.0.1", "extra")],
        "n string, color string, ip string, dropped string",
    )
    out = coerce_clickhouse(
        df,
        [
            {"name": "n", "type": "Int32"},
            {"name": "color", "type": "Enum8('red' = 1)"},
            {"name": "ip", "type": "IPv4"},
            {"name": "missing", "type": "Nullable(String)"},
        ],
    )
    assert out.columns == ["n", "color", "ip", "missing"]
    r = out.collect()[0]
    assert (r.n, r.color, r.ip, r.missing) == (1, "red", "10.0.0.1", None)


def test_unsupported_type_raises():
    with pytest.raises(ValueError):
        ch_type_to_expr(F.lit("x"), "Tuple(String, Int8)", False)
